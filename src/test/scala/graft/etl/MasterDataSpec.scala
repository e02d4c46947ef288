package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** Reference entry point 2 (`Insert_Dimensions`,
  * `/root/reference/src/Meshjoin.java:170-239`): one seeding pass over
  * reference-layout master CSVs, exercising quoted names, invalid-record
  * skips, duplicate-ID first-wins and insert-if-absent idempotence. */
class MasterDataSpec extends SparkSpec {

  private def writeCsv(name: String, content: String): String = {
    val dir = Files.createTempDirectory("seed").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/$name"), content)
    s"$dir/$name"
  }

  private val productsCsv = writeCsv("products.csv", Seq(
    "Product_ID,Product_Name,Price,Supplier_ID,Supplier_Name,Store_ID,Store_Name",
    "P1,Widget,2.50,S1,Acme,ST1,\"Store, The\"",
    "P2,\"Gadget \"\"Pro\"\"\",4.00,S2,Globex,ST2,Plain Store",
    "P3,BadPrice,abc,S3,Initech,ST3,Third Store",   // invalid price → whole row skipped
    "P4,ShortRow,1.00,S4",                          // < 7 fields → whole row skipped
    "P1,WidgetDupe,9.99,S9,Late,ST9,Late Store",    // duplicate ID → first (by order cols) wins
    "P5,Cheap,0.99,S1,Acme,ST1,\"Store, The\"",     // repeats S1/ST1 → single store/supplier row
    "").mkString("\n"))

  private val customersCsv = writeCsv("customers.csv", Seq(
    "Customer_ID,Customer_Name,Gender",
    "C1,\"Khan, Aisha\",F",
    "C2,Bilal,M",
    "C3,NoGender",                                  // < 3 fields → skipped
    "").mkString("\n"))

  private def seedAll(existingProductIds: Seq[String]) = {
    import spark.implicits._
    MasterData.seed(spark, productsCsv, customersCsv,
      existingProducts = existingProductIds.toDF("product_id"),
      existingStores = MasterData.emptyExisting(spark, "store_id"),
      existingSuppliers = MasterData.emptyExisting(spark, "supplier_id"),
      existingCustomers = MasterData.emptyExisting(spark, "customer_id"))
  }

  test("seeding derives all four dims, skipping invalid rows whole") {
    val d = seedAll(Nil)
    val prods = d.products.orderBy("product_id").collect()
    assert(prods.map(_.getAs[String]("product_id")).toSeq == Seq("P1", "P2", "P5"))
    // P3 (bad price) and P4 (short row) seed NOTHING — not even store/supplier
    val stores = d.stores.orderBy("store_id").collect()
    assert(stores.map(_.getAs[String]("store_id")).toSeq == Seq("ST1", "ST2", "ST9"))
    assert(stores.head.getAs[String]("store_name") == "Store, The")
    val sups = d.suppliers.orderBy("supplier_id").collect()
    assert(sups.map(_.getAs[String]("supplier_id")).toSeq == Seq("S1", "S2", "S9"))
    val custs = d.customers.orderBy("customer_id").collect()
    assert(custs.map(_.getAs[String]("customer_id")).toSeq == Seq("C1", "C2"))
    assert(custs.head.getAs[String]("customer_name") == "Khan, Aisha")
  }

  test("duplicate product IDs resolve first-wins deterministically") {
    val d = seedAll(Nil)
    val p1 = d.products.where("product_id = 'P1'").collect().head
    // order cols (product_name, ...) put 'Widget' before 'WidgetDupe'
    assert(p1.getAs[String]("product_name") == "Widget")
    assert(p1.getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("2.50")) == 0)
  }

  test("insert-if-absent: existing keys are not re-appended (idempotent re-seed)") {
    val d = seedAll(Seq("P1", "P2", "P5"))
    assert(d.products.count() == 0)
    // store/supplier/customer sides unaffected by the product filter
    assert(d.stores.count() == 3 && d.suppliers.count() == 3)
  }
}
