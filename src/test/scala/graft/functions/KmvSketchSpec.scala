package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[KmvSketchAgg]] semantics: k smallest DISTINCT values, exact
  * below capacity, correct partial-merge across partitions, and the
  * estimator identity the oracle twin replicates. */
class KmvSketchSpec extends SparkSpec {

  test("sketch keeps the k smallest distinct values across partitions") {
    import spark.implicits._
    // 1000 values with heavy duplication, spread over 8 partitions so
    // update AND merge paths both run; distinct values are 0, 10, ..., 990
    val df = spark.range(0, 1000).repartition(8)
      .select((col("id") % 100 * 10).as("h"))
    val sketch = df.agg(KmvSketchAgg.kmvSketch(col("h"), 5).as("s"))
      .head().getSeq[Long](0)
    assert(sketch == Seq(0L, 10L, 20L, 30L, 40L))
  }

  test("below capacity the sketch IS the distinct set and the estimate is exact") {
    import spark.implicits._
    val df = Seq(7L, 7L, 3L, 11L).toDF("h")
    val out = df.agg(KmvSketchAgg.kmvSketch(col("h"), 64).as("kmv"))
      .selectExpr("kmv", KmvSketchAgg.estimateExpr("kmv", 64) + " AS est")
      .head()
    assert(out.getSeq[Long](0) == Seq(3L, 7L, 11L))
    assert(out.getDouble(1) == 3.0)
  }

  test("at capacity the estimate is (k-1) * 2^32 / kth-min") {
    import spark.implicits._
    // hashes 1..100 (pretend-uniform): k = 10 → kth min = 10,
    // estimate = 9 * 2^32 / 10
    val df = spark.range(1, 101).select(col("id").as("h"))
    val est = df.agg(KmvSketchAgg.kmvSketch(col("h"), 10).as("kmv"))
      .selectExpr(KmvSketchAgg.estimateExpr("kmv", 10) + " AS est")
      .head().getDouble(0)
    assert(est == 9.0 * 4294967296.0 / 10.0)
  }

  test("nulls are skipped, not counted") {
    val df = spark.sql(
      "SELECT * FROM VALUES (CAST(5 AS BIGINT)), (CAST(NULL AS BIGINT)), (9) AS t(h)")
    val sketch = df.agg(KmvSketchAgg.kmvSketch(col("h"), 4).as("s"))
      .head().getSeq[Long](0)
    assert(sketch == Seq(5L, 9L))
  }

  test("sketch works inside a streaming aggregation with batch parity") {
    // the aggregate's serialize/merge path is what streaming state
    // exercises across micro-batches — a sketch over two batches must
    // equal the batch sketch over the union (mergeability, live)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.select((col("value") % 7).as("g"), (col("value") % 100).as("h"))
        .groupBy("g").agg(KmvSketchAgg.kmvSketch(col("h"), 4).as("kmv"))
    val q = agg(stream.toDF())
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    stream.addData(0L until 500L)
    q.processAllAvailable()
    stream.addData(500L until 1000L) // second micro-batch → merge path
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("kmv_stream").orderBy("g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq
    val batch = agg(spark.range(0, 1000).toDF("value")).orderBy("g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq
    assert(streamed == batch)
  }

  test("estimate lands within the KMV error envelope on real hashes") {
    // md5 hashes of 5000 distinct strings, k = 64: standard error is
    // ~1/√(k−2) ≈ 12.7 %; assert a generous 4σ so the test pins sanity,
    // not luck.
    import spark.implicits._
    val df = spark.range(0, 5000).select(col("id").cast("string").as("s"))
    graft.functions.Md5Prefix32.register(spark)
    val est = df.selectExpr("md5_prefix32(s) AS h")
      .agg(KmvSketchAgg.kmvSketch(col("h"), 64).as("kmv"))
      .selectExpr(KmvSketchAgg.estimateExpr("kmv", 64) + " AS est")
      .head().getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.51, s"estimate $est too far from 5000")
  }
}
