package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.etl.Upserts

/** Property-based invariants (SURVEY.md §5 item 3) run with ScalaCheck
  * generators under ScalaTest: warehouse state is independent of stream
  * order/duplication, and decimal aggregation is associative (the
  * property that makes results deterministic on any cluster topology). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(15)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val batchGen: Gen[List[(Long, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(1L, 10L), Gen.alphaStr.map(_.take(5))))

  test("upsert final key set is invariant under permutation and duplication") {
    check(Prop.forAll(batchGen, Gen.choose(0L, 5L)) { (batch, existingMax) =>
      val existing = (1L to existingMax).map(i => (i, s"e$i")).toDF("id", "v")
      val incoming = batch.toDF("id", "v")
      val shuffled = scala.util.Random.shuffle(batch)
      val doubled = (shuffled ++ shuffled).toDF("id", "v")
      def keys(in: org.apache.spark.sql.DataFrame) =
        Upserts.insertIfAbsent(existing, in, Seq("id"), Seq("v"))
          .select("id").as[Long].collect().toSet
      keys(incoming) == keys(doubled)
    })
  }

  test("upsert winner row is deterministic regardless of input order") {
    check(Prop.forAll(batchGen) { batch =>
      val empty = Seq.empty[(Long, String)].toDF("id", "v")
      val a = Upserts.insertIfAbsent(empty, batch.toDF("id", "v"), Seq("id"), Seq("v"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      val b = Upserts.insertIfAbsent(empty,
          scala.util.Random.shuffle(batch).toDF("id", "v"), Seq("id"), Seq("v"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      a == b
    })
  }

  test("decimal aggregation is order- and partitioning-independent") {
    val amounts = Gen.listOfN(50, Gen.choose(-99999L, 99999L))
    check(Prop.forAll(amounts, Gen.choose(1, 8)) { (cents, parts) =>
      val decs = cents.map(c => BigDecimal(c) / 100)
      val expected = decs.sum
      val viaSpark = decs.toDF("x")
        .repartition(parts)
        .agg(sum(col("x").cast(graft.model.Schemas.revenueType)))
        .head().getDecimal(0)
      BigDecimal(viaSpark) == expected
    })
  }

  test("md5_prefix32 equals the conv(substring(md5)) composition for any string") {
    graft.functions.Md5Prefix32.register(spark)
    val strs = Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(20)),
      Gen.asciiPrintableStr.map(_.take(30)),
      Gen.const("中文 混合 text")))
    check(Prop.forAll(strs) { ss =>
      val df = ss.toDF("s").selectExpr(
        "md5_prefix32(s) AS fast",
        "CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT) AS ref")
      df.where(col("fast") =!= col("ref")).count() == 0
    })
  }

  test("rollup grand total equals ungrouped total on random fact slices") {
    // localCheckpoint (not cache): materializes AND truncates lineage, so
    // the per-iteration rollup/filter plans don't trip Spark's
    // ambiguous-self-join detection on the shared frame.
    val fact = graft.etl.Star.salesFact(spark, sfSmoke)
      .select("store_id", "supplier_id", "total_revenue")
      .localCheckpoint(eager = true)
    check(Prop.forAll(Gen.choose(0, 24)) { storeCap =>
      val slice = fact.where(col("store_id") <= storeCap)
      val rolled = slice.rollup("store_id", "supplier_id")
        .agg(sum("total_revenue").as("r"), grouping_id().as("gid"))
        .where(col("gid") === 3) // both keys rolled up ⇒ the grand total row
        .select("r").collect()
      val direct = Option(slice.agg(sum("total_revenue")).head().getDecimal(0))
      direct match {
        // empty slice: ungrouped agg gives NULL, rollup rightly emits no rows
        case None => rolled.isEmpty
        case Some(b) => rolled.length == 1 && rolled.head.getDecimal(0).compareTo(b) == 0
      }
    })
  }
}
