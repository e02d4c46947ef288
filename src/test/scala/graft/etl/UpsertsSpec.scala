package graft.etl

import graft.SparkSpec

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

  test("warehouse state is replay-order independent (idempotence property)") {
    // Any permutation/duplication of the stream yields the same final keys.
    val perm1 = incoming
    val perm2 = incoming.orderBy($"v".desc).unionByName(incoming)
    def finalKeys(batch: org.apache.spark.sql.DataFrame) =
      existing.unionByName(Upserts.insertIfAbsent(existing, batch, Seq("id"), Seq("v")))
        .select("id").as[Long].collect().toSet
    assert(finalKeys(perm1) == finalKeys(perm2))
  }
}
