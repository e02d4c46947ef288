package graft.streaming

import graft.SparkSpec
import graft.sources.CsvSources
import java.nio.file.{Files, Paths}

/** End-to-end over the PRODUCTION source path: CSV files on disk →
  * `CsvSources.transactionStream` (file source, one file per
  * micro-batch) → full StreamETL pipeline → fact table. Complements the
  * MemoryStream specs, which bypass the CSV parsing layer. */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("CSV file stream feeds the full ETL, one micro-batch per file") {
    val dir = Files.createTempDirectory("txstream").toString
    val header = "order_id,order_date_raw,product_id,quantity_ordered,customer_id,time_id"
    Files.writeString(Paths.get(s"$dir/batch1.csv"), Seq(
      header,
      "1,2024-03-05 9:05:00,100,4,7,t1",
      "2,2024-03-09 12:00:00,200,2,8,t2",
      "").mkString("\n"))
    Files.writeString(Paths.get(s"$dir/batch2.csv"), Seq(
      header,
      "2,2024-03-09 12:00:00,200,2,8,t2", // re-delivery across files
      "3,bad-date,100,1,7,t3", // Q-b drop
      "4,2024-03-10 08:00:00,100, 5 ,7,t4", // padded quantity field
      "").mkString("\n"))

    // master data keyed by STRING ids — the tx CSV schema is all-string
    // for ids (the reference's positional layout, Schemas.txSchema)
    val products = Seq(("100", "widget", BigDecimal("2.50")), ("200", "gadget", BigDecimal("4.00")))
      .toDF("product_id", "product_name", "price")
    val customers = Seq(("7", "alice"), ("8", "bob")).toDF("customer_id", "customer_name")

    val stream = CsvSources.transactionStream(spark, dir, maxFilesPerTrigger = 1)
    val ckpt = Files.createTempDirectory("ckpt-fs").toString
    val fact = StreamETL.runTransactionsToFact(spark, stream, products, customers, ckpt)

    val rows = fact.select("order_id", "quantity_ordered", "total_revenue")
      .orderBy("order_id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1", "2", "4"))
    assert(rows(0).getDecimal(2) == new java.math.BigDecimal("10.00")) // 4 × 2.50
    assert(rows(2).getInt(1) == 5) // whitespace-padded quantity parsed (shared CSV options)
  }

  test("AvailableNow runner: checkpointed catch-up with durable partitioned sink") {
    val srcDir = Files.createTempDirectory("txan").toString
    val factDir = Files.createTempDirectory("factan").toString + "/fact"
    val ckpt = Files.createTempDirectory("ckptan").toString
    val header = "order_id,order_date_raw,product_id,quantity_ordered,customer_id,time_id"
    val products = Seq(("100", "widget", BigDecimal("2.50")))
      .toDF("product_id", "product_name", "price")
    val customers = Seq(("7", "alice")).toDF("customer_id", "customer_name")

    Files.writeString(Paths.get(s"$srcDir/a.csv"), Seq(
      header, "1,2024-03-05 9:05:00,100,4,7,t1", "").mkString("\n"))
    StreamETL.runAvailableNow(spark,
      CsvSources.transactionStream(spark, srcDir), products, customers, factDir, ckpt)
    assert(spark.read.parquet(factDir).count() == 1)

    // second invocation: new file + a re-delivery of order 1
    Files.writeString(Paths.get(s"$srcDir/b.csv"), Seq(
      header, "1,2024-03-05 9:05:00,100,4,7,t1", "2,2024-04-01 10:00:00,100,2,7,t2", "").mkString("\n"))
    StreamETL.runAvailableNow(spark,
      CsvSources.transactionStream(spark, srcDir), products, customers, factDir, ckpt)

    val fact = spark.read.parquet(factDir)
    val ids = fact.select("order_id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("1", "2")) // re-delivered order 1 not duplicated
    // date-partitioned layout (partition pruning surface at scale)
    assert(fact.select("sale_year", "sale_month").distinct().count() == 2)
  }
}
