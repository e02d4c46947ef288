package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** The sink abstraction against both targets: parquet and a REAL JDBC
  * database (embedded Derby — on the Spark classpath, zero extra deps).
  * Proves the reference's S5/S7 JDBC capability: idempotent anti-join
  * upserts against a live JDBC table, batch and streaming. */
class WarehouseSinkSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String)*) = rows.toDF("product_id", "product_name")

  test("JDBC sink: first upsert creates the table, re-upsert is idempotent, new keys append") {
    val db = Files.createTempDirectory("derby").toString
    val sink = JdbcSink(s"jdbc:derby:$db/wh;create=true", "dim_product")
    val keys = Seq("product_id")
    val order = Seq("product_name")

    val n1 = WarehouseSink.upsertAppend(spark, sink,
      batch("P1" -> "Widget", "P2" -> "Gadget", "P1" -> "WidgetDupe"), keys, order)
    assert(n1 == 2) // in-batch dupe resolved first-wins before the write

    val n2 = WarehouseSink.upsertAppend(spark, sink,
      batch("P1" -> "Replay", "P3" -> "Sprocket"), keys, order)
    assert(n2 == 1) // P1 already present → only P3 lands

    val readBack = sink.existingKeys(spark, Seq("product_id"), batch())
      .collect().map(_.getString(0)).sorted
    assert(readBack.toSeq == Seq("P1", "P2", "P3"))
  }

  test("JDBC sink: full row read-back preserves first-wins values") {
    val db = Files.createTempDirectory("derby").toString
    val url = s"jdbc:derby:$db/wh;create=true"
    val sink = JdbcSink(url, "dim_product")
    WarehouseSink.upsertAppend(spark, sink,
      batch("P1" -> "Widget", "P1" -> "ZLate"), Seq("product_id"), Seq("product_name"))
    val rows = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "dim_product").load().collect()
    assert(rows.length == 1 && rows.head.getString(1) == "Widget")
  }

  test("parquet sink implements the same contract (shared upsert path)") {
    val dir = Files.createTempDirectory("pq").toString + "/fact"
    val sink = ParquetSink(dir)
    assert(WarehouseSink.upsertAppend(spark, sink,
      batch("A" -> "x", "B" -> "y"), Seq("product_id"), Seq("product_name")) == 2)
    assert(WarehouseSink.upsertAppend(spark, sink,
      batch("B" -> "replay", "C" -> "z"), Seq("product_id"), Seq("product_name")) == 1)
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("streaming upsert into JDBC: replays and in-stream dupes never double-insert") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val db = Files.createTempDirectory("derby").toString
    val sink = JdbcSink(s"jdbc:derby:$db/wh;create=true", "dim_store")
    val ckpt = Files.createTempDirectory("ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val q = WarehouseSink.streamUpsert(spark,
      stream.toDF().toDF("store_id", "store_name"),
      sink, Seq("store_id"), Seq("store_name"), ckpt)
    stream.addData(("S1", "Alpha"), ("S2", "Beta"))
    q.processAllAvailable()
    stream.addData(("S1", "AlphaReplay"), ("S3", "Gamma")) // S1 re-delivered in a later batch
    q.processAllAvailable()
    q.stop()
    val rows = sink.existingKeys(spark, Seq("store_id"), Seq.empty[(String, String)].toDF("store_id", "store_name"))
      .collect().map(_.getString(0)).sorted
    assert(rows.toSeq == Seq("S1", "S2", "S3"))
  }

  test("observed metrics surface per micro-batch on a stream (same mechanism)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val observed = in.toDF().toDF("k", "v")
      .observe("load_audit",
        count(lit(1)).as("n_rows"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("null_keys"))
    val q = observed.writeStream.format("memory")
      .queryName("observed_stream").outputMode("append").start()
    try {
      in.addData((1L, 1.0), (2L, 2.0), (3L, 3.0))
      q.processAllAvailable()
      val m = q.lastProgress.observedMetrics.get("load_audit")
      assert(m != null, "no observed metrics on the batch progress")
      assert(m.getAs[Long]("n_rows") == 3L)
      assert(m.getAs[Long]("null_keys") == 0L)
    } finally q.stop()
  }

  test("observed load audits the write pass without a second scan") {
    import org.apache.spark.sql.functions._
    val fact = Star.salesFact(spark, sfSmoke)
    val metrics = WarehouseSink.observedLoad(
      fact,
      df => df.write.format("noop").mode("overwrite").save(),
      keyCol = "customer_id",
      revenueCol = "total_revenue")
    // the riding metrics equal an independent audit aggregation
    val direct = fact.agg(
      count(lit(1)).as("n"),
      sum("total_revenue").as("rev")).collect().head
    assert(metrics("n_rows") == direct.getAs[Long]("n"))
    assert(metrics("total_revenue") == direct.getAs[java.math.BigDecimal]("rev"))
    assert(metrics("null_keys") == 0L)
  }
}
