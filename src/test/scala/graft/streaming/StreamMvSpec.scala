package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.etl.TxFixtures

/** The streamed MV replay must land EXACTLY the batch answer over the
  * surviving rows — per-commit incremental maintenance (including the
  * signed delete fold and vanished-group drop) composed over the whole
  * churn, equal to one from-scratch recompute. The registered row
  * gates this against DuckDB; this spec pins the same parity
  * in-process plus the churn-coverage preconditions the replay's
  * semantics rely on. */
class StreamMvSpec extends SparkSpec {

  test("stream-maintained view equals the batch recompute over survivors") {
    val got = StreamMv.mvStreamRefresh(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val o = TxFixtures.ordersProjected(spark, sfSmoke)
    val years = o.select("year").distinct().orderBy("year")
      .collect().map(_.getInt(0)).toSeq
    val cut = years(2)
    val want = o.where(!(col("o_custkey") % 7 === 3 && col("year") <= cut))
      .groupBy("o_custkey")
      .agg(sum("cents").as("total_cents"), count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    // the replay must actually exercise the retraction arm: some
    // masked customer exists, and masked customers with later-year
    // orders survive through exactly those orders
    val masked = o.where(col("o_custkey") % 7 === 3 && col("year") <= cut)
    assert(masked.limit(1).count() === 1, "no retracted rows at this SF")
    val reborn = o.where(col("o_custkey") % 7 === 3 && col("year") > cut)
      .select("o_custkey").distinct().limit(1)
      .collect().headOption.map(_.getLong(0))
    assert(reborn.nonEmpty, "no re-inserted customer at this SF")
    assert(got.exists(_._1 == reborn.get),
      "a customer re-inserted after the delete must be back in the view")
  }
}
