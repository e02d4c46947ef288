package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the bounded top-k aggregate's contract directly (its users —
  * ANN search, stratified sampling, q12 — pin it only through their
  * oracles): exact equality with the row_number window formulation,
  * and mergeability across partitions and micro-batches. */
class TopKSpec extends SparkSpec {

  private def scored = {
    import spark.implicits._
    // 10 groups × 1000 candidates with duplicate scores (score = id % 97)
    spark.range(0, 10000).repartition(8)
      .select((col("id") % 10).as("g"), col("id"), (col("id") % 97).cast("double").as("s"))
  }

  test("topKBy equals the row_number window formulation") {
    import org.apache.spark.sql.expressions.Window
    val k = 5
    val viaAgg = scored.groupBy("g")
      .agg(TopK.topKBy(struct(col("s"), (-col("id")).as("t"), col("id").as("i")), k).as("tk"))
      .select(col("g"), posexplode(sort_array(col("tk"), asc = false)))
      .select(col("g"), (col("pos") + 1).as("rank"), col("col.i").as("id"), col("col.s").as("s"))
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k).select("g", "rank", "id", "s")
    assert(viaAgg.orderBy("g", "rank").collect().toSeq ==
      viaWindow.orderBy("g", "rank").collect().toSeq)
  }

  test("topKBy streams with batch parity across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.select((col("value") % 5).as("g"), col("value").as("id"))
        .groupBy("g")
        .agg(TopK.topKBy(struct(col("id")), 3).as("tk"))
        .select(col("g"), sort_array(col("tk"), asc = false).as("top"))
    val q = agg(stream.toDF()).writeStream.format("memory")
      .queryName("topk_stream").outputMode("complete").start()
    stream.addData(0L until 300L)
    q.processAllAvailable()
    stream.addData(300L until 600L)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("topk_stream").orderBy("g").collect().toSeq
    val batch = agg(spark.range(0, 600).toDF("value")).orderBy("g").collect().toSeq
    assert(streamed == batch)
  }
}
