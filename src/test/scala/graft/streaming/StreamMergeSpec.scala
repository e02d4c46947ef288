package graft.streaming

import graft.SparkSpec
import graft.etl.TxParquetSink
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streamed conditional MERGE: a real foreachBatch query applying
  * (key, value, op) change batches through
  * [[StreamMerge.mergeBatch]] — upserts with absolute values, deletes,
  * a redelivered batch converging (the idempotence contract), and an
  * unmatched delete NOT resurrecting as an insert. */
class StreamMergeSpec extends SparkSpec {
  import spark.implicits._

  private def sink() = TxParquetSink(
    Files.createTempDirectory("smerge").toString + "/t")

  private def state(t: TxParquetSink): Seq[(String, Long)] =
    t.readSnapshot(spark)
      .map(_.orderBy("k").as[(String, Long)].collect().toSeq)
      .getOrElse(Nil)

  test("a real stream merges per-batch: upsert, delete, no resurrection") {
    implicit val sqlCtx = spark.sqlContext
    val t = sink()
    val in = MemoryStream[(String, Long, String)]
    val q = in.toDS().toDF("k", "cents", "op")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamMerge.mergeBatch(t, Seq("k"), Seq("cents"))(b, id)
      }
      .start()
    try {
      in.addData(("A", 10L, "U"), ("B", 20L, "U")) // bootstrap insert
      q.processAllAvailable()
      assert(state(t) == Seq(("A", 10L), ("B", 20L)))
      assert(!t.readSnapshot(spark).get.columns.contains("op"),
        "the transport op column must not enter the table")
      // absolute update + fresh insert in one batch
      in.addData(("A", 15L, "U"), ("C", 30L, "U"))
      q.processAllAvailable()
      assert(state(t) == Seq(("A", 15L), ("B", 20L), ("C", 30L)))
      // delete B; delete of a key that never existed is a no-op,
      // NOT an insert (the conditional insert clause)
      in.addData(("B", 0L, "D"), ("Z", 0L, "D"))
      q.processAllAvailable()
      assert(state(t) == Seq(("A", 15L), ("C", 30L)))
    } finally q.stop()
  }

  test("the writer-loop maintenance policy bounds merge-mask depth") {
    val t = sink()
    val write = StreamMerge.mergeBatch(t, Seq("k"), Seq("cents"),
      maskBudget = 3) _
    (0 until 8).foreach { i =>
      write(Seq(("A", i.toLong, "U"), (s"K$i", 1L, "U"))
        .toDF("k", "cents", "op"), i.toLong)
    }
    // 7 merge commits landed (batch 0 bootstraps); budget 3 → the
    // policy must have compacted, and the EFFECTIVE log (after the
    // last base) must carry at most budget + 1 masked commits
    val h = t.history(spark).orderBy("version")
      .select("operation").as[String].collect().toSeq
    val lastBase = h.lastIndexWhere(_ == "base")
    assert(lastBase >= 0, "the policy must have compacted")
    val maskedEff = h.drop(lastBase + 1).count(_ == "overwrite")
    assert(maskedEff <= 4,
      s"effective masked commits must stay within budget (got $maskedEff)")
    // and the state is exactly the 8 upserts' final values
    assert(state(t).toMap == (Map("A" -> 7L) ++
      (0 until 8).map(i => s"K$i" -> 1L).toMap))
  }

  test("a redelivered batch is a fixed point (absolute values)") {
    val t = sink()
    val write = StreamMerge.mergeBatch(t, Seq("k"), Seq("cents")) _
    val b0 = Seq(("A", 10L, "U"), ("B", 20L, "U")).toDF("k", "cents", "op")
    val b1 = Seq(("A", 99L, "U"), ("B", 0L, "D")).toDF("k", "cents", "op")
    write(b0, 0L)
    write(b1, 1L)
    val once = state(t)
    write(b1, 1L) // Spark's at-least-once retry
    assert(state(t) == once && once == Seq(("A", 99L)))
  }
}
