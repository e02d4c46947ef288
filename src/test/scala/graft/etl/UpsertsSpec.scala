package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

/** Pins the insert-if-not-exists / first-wins semantics (SURVEY.md §2.4,
  * reference D1–D7) including the idempotence property the reference gets
  * from per-row existence probes. */
class UpsertsSpec extends SparkSpec {
  import spark.implicits._

  private val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
  private val incoming = Seq((2L, "B2"), (3L, "c"), (3L, "c-dup"), (4L, "d"))
    .toDF("id", "v")

  test("insertIfAbsent appends only new keys, deduped first-wins") {
    val out = Upserts.insertIfAbsent(existing, incoming, Seq("id"), Seq("v"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((3L, "c"), (4L, "d"))) // 2 exists; 3 deduped to 'c' < 'c-dup'
  }

  test("upsert is idempotent: replaying the same batch adds nothing") {
    val afterFirst = existing.unionByName(
      Upserts.insertIfAbsent(existing, incoming, Seq("id"), Seq("v")))
    val second = Upserts.insertIfAbsent(afterFirst, incoming, Seq("id"), Seq("v"))
    assert(second.count() == 0)
  }

  test("firstWins picks deterministic winner per key") {
    val df = Seq((1L, 9, "late"), (1L, 1, "early"), (2L, 5, "only"))
      .toDF("k", "ord", "v")
    val out = Upserts.firstWins(df, Seq("k"), Seq("ord"))
      .orderBy("k").as[(Long, Int, String)].collect().toSeq
    assert(out == Seq((1L, 1, "early"), (2L, 5, "only")))
  }

  test("scdType2: change versions, no-op skips, new key opens, closed history untouched") {
    import java.sql.Date
    val d = (s: String) => Date.valueOf(s)
    val current = Seq(
      // key 1: already has a closed v1 and an open v2
      (1L, "a-v1", d("2023-01-01"), d("2024-01-01"), false),
      (1L, "a-v2", d("2024-01-01"), null.asInstanceOf[Date], true),
      // key 2: open, will receive a no-op update
      (2L, "b", d("2024-01-01"), null.asInstanceOf[Date], true),
      // key 3: open, not in the update batch at all
      (3L, "c", d("2024-01-01"), null.asInstanceOf[Date], true)
    ).toDF("id", "name", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "a-v3"), // real change → version
      (2L, "b"),    // no-op → nothing
      (4L, "d")     // brand-new key → first version opens at effective
    ).toDF("id", "name")

    val out = Upserts.scdType2(current, updates, Seq("id"), Seq("name"),
        lit("2024-06-01").cast("date"))
      .orderBy("id", "valid_from")
      .as[(Long, String, Date, Option[Date], Boolean)].collect().toSeq

    assert(out === Seq(
      (1L, "a-v1", d("2023-01-01"), Some(d("2024-01-01")), false),
      (1L, "a-v2", d("2024-01-01"), Some(d("2024-06-01")), false),
      (1L, "a-v3", d("2024-06-01"), None, true),
      (2L, "b", d("2024-01-01"), None, true),
      (3L, "c", d("2024-01-01"), None, true),
      (4L, "d", d("2024-06-01"), None, true)))
  }

  test("scdType2 null-safe change detection: null→value and value→null both version") {
    import java.sql.Date
    val d = (s: String) => Date.valueOf(s)
    val current = Seq(
      (1L, Option.empty[String], d("2024-01-01"), Option.empty[Date], true),
      (2L, Some("x"), d("2024-01-01"), Option.empty[Date], true)
    ).toDF("id", "name", "valid_from", "valid_to", "is_current")
    val updates = Seq((1L, Some("now-set")), (2L, Option.empty[String]))
      .toDF("id", "name")
    val out = Upserts.scdType2(current, updates, Seq("id"), Seq("name"),
        lit("2024-06-01").cast("date"))
    assert(out.where("is_current").count() === 2)
    assert(out.count() === 4) // both keys versioned
  }

  test("warehouse state is replay-order independent (idempotence property)") {
    // Any permutation/duplication of the stream yields the same final keys.
    val perm1 = incoming
    val perm2 = incoming.orderBy($"v".desc).unionByName(incoming)
    def finalKeys(batch: org.apache.spark.sql.DataFrame) =
      existing.unionByName(Upserts.insertIfAbsent(existing, batch, Seq("id"), Seq("v")))
        .select("id").as[Long].collect().toSet
    assert(finalKeys(perm1) == finalKeys(perm2))
  }

  test("point-in-time join binds each order to at most one version, boundary-exact") {
    import org.apache.spark.sql.functions.col
    val pit = EtlQueries.scd2PointInTime(spark, sfSmoke).cache()
    try {
      // one output row per order — the interval join cannot fan out
      val nOrders = spark.read.parquet(s"$sfSmoke/orders.parquet").count()
      assert(pit.count() == nOrders)
      assert(pit.groupBy("order_id").count().where(col("count") > 1).count() == 0)

      // pre-history orders (before the 1996 seed) carry NULL attributes
      val pre = pit.where(col("order_ts") < lit("1996-01-01").cast("timestamp"))
      assert(pre.count() > 0)
      assert(pre.where(col("customer_name").isNotNull).count() == 0)

      // a changed customer's orders bind the version matching their era:
      // before the 1998-06-01 change → plain name; on/after → ' (moved)'
      val changed = pit.where(col("customer_id") % 10 === 0 &&
        col("order_ts") >= lit("1996-01-01").cast("timestamp"))
      assert(changed.count() > 0)
      assert(changed.where(
        col("order_ts") < lit("1998-06-01").cast("timestamp") &&
          col("customer_name").endsWith(" (moved)")).count() == 0)
      assert(changed.where(
        col("order_ts") >= lit("1998-06-01").cast("timestamp") &&
          !col("customer_name").endsWith(" (moved)")).count() == 0)

      // an unchanged customer's orders all bind the single seed version
      val unchanged = pit.where(col("customer_id") % 10 =!= 0 &&
        col("order_ts") >= lit("1996-01-01").cast("timestamp"))
      assert(unchanged.where(col("valid_from") =!=
        lit("1996-01-01").cast("timestamp")).count() == 0)
    } finally pit.unpersist()
  }
}
