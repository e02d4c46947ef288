package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the linear multi-touch attribution on the sf0.001
  * smoke events; exact values are pinned by the DuckDB twin
  * (`etl_attribution`). */
class AttributionSpec extends SparkSpec {

  test("credit conserves to the cent; exactly one first and one last touch per conversion") {
    val at = EtlQueries.touchAttribution(spark, sfSmoke).cache()
    try {
      assert(at.count() > 0, "no attributed pairs on the smoke data")
      // per-conversion credit equals the conversion's exact cents
      val conv = Star.events(spark, sfSmoke)
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"),
          (col("value").cast(graft.model.Schemas.priceType) * 100)
            .cast("bigint").as("conv_cents"))
      val drift = at.groupBy("conv_id")
        .agg(sum("attributed_cents").as("got"),
          max("n_touches").as("n"), min("n_touches").as("n2"))
        .join(conv, Seq("conv_id"))
        .where(col("got") =!= col("conv_cents") || col("n") =!= col("n2"))
      assert(drift.count() == 0, "attribution does not conserve credit")
      // single-touch models read off the same table: one flag each
      val flags = at.groupBy("conv_id").agg(
        sum(when(col("is_first_touch"), 1).otherwise(0)).as("nf"),
        sum(when(col("is_last_touch"), 1).otherwise(0)).as("nl"),
        count(lit(1)).as("n"))
      assert(flags.where(col("nf") =!= 1 || col("nl") =!= 1).count() == 0)
      // split shape: everyone gets the floor share, the latest touch
      // gets floor + remainder — so per conversion min == base (unless
      // n == 1) and max == base + remainder, exactly
      val shape = at.join(conv, Seq("conv_id"))
        .groupBy("conv_id").agg(
          min("attributed_cents").as("lo"),
          max("attributed_cents").as("hi"),
          max("n_touches").as("n"),
          max("conv_cents").as("cents"))
        .withColumn("base", expr("cents div n"))
        .withColumn("rem", col("cents") % col("n"))
      assert(shape.where(col("hi") =!= col("base") + col("rem")).count() == 0,
        "latest touch does not carry the remainder")
      assert(shape.where(col("n") > 1 && col("lo") =!= col("base")).count() == 0,
        "floor share drifts")
    } finally at.unpersist()
  }

  test("pairs respect the trailing window and user identity") {
    val ev = Star.events(spark, sfSmoke)
    val at = EtlQueries.touchAttribution(spark, sfSmoke)
    val convs = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id").as("cu"),
        col("ts").as("conv_ts"))
    val touches = ev.select(col("event_id").as("touch_id"),
      col("user_id").as("tu"), col("ts").as("touch_ts"),
      col("event_type").as("t_type"))
    val joined = at.join(convs, Seq("conv_id")).join(touches, Seq("touch_id"))
    assert(joined.where(col("cu") =!= col("tu")).count() == 0,
      "cross-user attribution")
    assert(joined.where(col("touch_ts") > col("conv_ts") ||
      col("touch_ts") <= col("conv_ts") - expr("INTERVAL 7 DAYS")).count() == 0,
      "touch outside the trailing window")
    assert(joined.where(!col("t_type").isin("click", "view")).count() == 0)
  }
}
