package graft.streaming

import graft.SparkSpec
import graft.etl.TxParquetSink

/** The real `readStream` source over the commit log: micro-batches
  * are exactly [[TxParquetSink.changesBetween]] ranges, restart
  * resumes from the checkpointed commit version with no duplicates,
  * and `startingVersion` skips the prefix. */
class GraftCdcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def rows(rs: (String, Long, Long)*) =
    rs.toDF("month", "store_id", "cents")

  private type Feed = Seq[(String, Long, Long, String, Long)]

  private def sortFeed(f: Feed): Feed = f.sortBy(r => (r._5, r._4, r._2, r._1))

  private def feedOf(df: org.apache.spark.sql.DataFrame): Feed =
    sortFeed(df.select("month", "store_id", "cents", "_change_type", "_version")
      .as[(String, Long, Long, String, Long)].collect().toSeq)

  test("streamed feed == batch changesBetween; restart resumes from the checkpoint; D rows stream") {
    val base = java.nio.file.Files.createTempDirectory("cdcsource").toString
    val src = TxParquetSink(s"$base/t")
    src.append(rows(("m1", 1L, 100L), ("m1", 2L, 50L))) // v0
    src.append(rows(("m2", 1L, 10L)))                   // v1

    val collected = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, String, Long)]
    def start() = spark.readStream.format("graft-cdc")
      .option("path", src.dir).load()
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val batch = feedOf(df)
        collected.synchronized { collected ++= batch }
        ()
      }
      .start()

    val q = start()
    q.processAllAvailable()
    assert(sortFeed(collected.toSeq) ==
      feedOf(src.changesBetween(spark, -1L, 1L).get),
      "the first run must replay the whole feed")

    // two more commits while the query runs — including a DELETE,
    // whose pre-image rows must stream as 'D'
    src.append(rows(("m3", 3L, 7L)))   // v2
    src.deleteWhere(spark, "store_id = 2") // v3
    q.processAllAvailable()
    q.stop()
    assert(sortFeed(collected.toSeq) ==
      feedOf(src.changesBetween(spark, -1L, 3L).get),
      "late commits stream incrementally, deletes included")

    // restart from the checkpoint: only commits AFTER the consumed
    // offset arrive — no duplicates, no gaps
    collected.clear()
    src.append(rows(("m4", 4L, 1L)))   // v4
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(sortFeed(collected.toSeq) ==
      feedOf(src.changesBetween(spark, 3L, 4L).get),
      "a restarted query must resume exactly past the checkpoint")
  }

  test("startingVersion skips the prefix; compaction bases stream nothing") {
    val base = java.nio.file.Files.createTempDirectory("cdcsource2").toString
    val src = TxParquetSink(s"$base/t")
    src.append(rows(("m1", 1L, 100L))) // v0
    src.append(rows(("m2", 2L, 50L)))  // v1
    src.compact(spark)                 // v2: base — no logical change
    src.append(rows(("m3", 3L, 7L)))   // v3

    val collected = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, String, Long)]
    val q = spark.readStream.format("graft-cdc")
      .option("path", src.dir)
      .option("startingVersion", "1")
      .load()
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val batch = feedOf(df)
        collected.synchronized { collected ++= batch }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(sortFeed(collected.toSeq) == Seq(("m3", 3L, 7L, "I", 3L)),
      "only post-startingVersion commits stream; the base streams nothing")
  }
}
