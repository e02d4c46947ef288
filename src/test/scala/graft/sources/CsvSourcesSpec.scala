package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** The reference's CSV edge cases (SURVEY.md S3/S4, FIXTURES.md §4):
  * quoted fields with embedded commas, `""` escapes, CR/LF in names,
  * whitespace — the inputs its naive `line.split(",")` broke on. */
class CsvSourcesSpec extends SparkSpec {

  private def writeCsv(name: String, content: String): String = {
    val dir = Files.createTempDirectory("csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/$name"), content)
    s"$dir/$name"
  }

  test("quoted store names with embedded commas and escaped quotes parse whole") {
    val path = writeCsv("products.csv", Seq(
      "Product_ID,Product_Name,Price,Supplier_ID,Supplier_Name,Store_ID,Store_Name",
      "P1,Widget,2.50,S1,Acme,ST1,\"Store, The\"",
      "P2,\"Gadget \"\"Pro\"\"\",4.00,S2,Globex,ST2,Plain Store",
      "").mkString("\n"))
    val rows = CsvSources.products(spark, path).orderBy("product_id").collect()
    assert(rows(0).getAs[String]("store_name") == "Store, The")
    assert(rows(1).getAs[String]("product_name") == "Gadget \"Pro\"")
    assert(rows(0).getAs[java.math.BigDecimal]("price").compareTo(
      new java.math.BigDecimal("2.50")) == 0)
  }

  test("transactions CSV reads into the positional schema with typed quantity") {
    val path = writeCsv("tx.csv",
      """order_id,order_date_raw,product_id,quantity_ordered,customer_id,time_id
        |O1,2024-03-05 9:05:00,P1,4,C7,T1
        |O2,2024-03-09 12:00:00,P2,2,C8,T2
        |""".stripMargin)
    val rows = CsvSources.transactions(spark, path).orderBy("order_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Int]("quantity_ordered") == 4)
    assert(rows(0).getAs[String]("order_date_raw") == "2024-03-05 9:05:00")
  }

  test("sanitizer collapses CR/LF and trims (S4 residue)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq("  Store\r\nWith Breaks  ").toDF("s")
      .select(CsvSources.sanitized(col("s"))).head().getString(0)
    assert(out == "Store With Breaks")
  }

  test("quarantine ingest splits parseable rows from damaged lines, raw text kept") {
    val path = writeCsv("tx.csv", Seq(
      "Order_ID,Order_Date,Product_ID,Quantity_Ordered,Customer_ID,Time_ID",
      "O1,2024-01-05,P1,3,C1,T1",
      "O2,2024-01-05,P2,notanumber,C2,T2", // unparseable typed field
      "O3,2024-01-06,P3,2,C3,T3",
      "O4,2024-01-06,P4,1,C4,T4,EXTRA,TOKENS", // structural damage
      "").mkString("\n"))
    val (good, quarantine) = CsvSources.transactionsWithQuarantine(spark, path)
    try {
      val g = good.orderBy("order_id").collect()
      assert(g.map(_.getAs[String]("order_id")).toSeq == Seq("O1", "O3"))
      assert(g.head.getAs[Int]("quantity_ordered") == 3)
      // quarantined rows carry their raw lines for replay
      val q = quarantine.collect().map(_.getAs[String]("raw_line")).sorted
      assert(q.length == 2)
      assert(q.exists(_.contains("notanumber")))
      assert(q.exists(_.contains("EXTRA,TOKENS")))
      // nothing lost: every input line is in exactly one output
      assert(good.count() + quarantine.count() == 4)
    } finally good.unpersist()
  }

  test("array_dot: extensions hook injects cleanly; registered function resolves in SQL") {
    // spark.sql.extensions is a STATIC conf, read only when the
    // SparkContext is created — a shared test context can't exercise the
    // full boot path. Verify (a) the injection wiring applies without
    // error, and (b) the same builder resolves + computes through SQL via
    // the programmatic registration path.
    new GraftExtensionsCheck().run()
    graft.functions.ArrayDotProduct.register(spark)
    val r = spark.sql(
      "SELECT array_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d").head().getDouble(0)
    assert(r == 11.0)
    // null ELEMENT poisons to NULL — parity with the aggregate/zip_with twin
    val nul = spark.sql(
      "SELECT array_dot(array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d").head()
    assert(nul.isNullAt(0))
    // unequal lengths → NULL, not a partial min-length sum — same parity
    // (zip_with pads the shorter side with null and the fold poisons)
    val uneq = spark.sql(
      "SELECT array_dot(array(CAST(1 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d").head()
    assert(uneq.isNullAt(0))
  }

  private class GraftExtensionsCheck {
    def run(): Unit =
      new graft.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
