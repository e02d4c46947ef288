package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** Model-based check of the ACID sink: random operation sequences
  * (append / partition overwrite / compact / truncate) are applied to
  * BOTH the real commit log and a trivial in-memory model
  * (Map[day → rows]); after every operation the snapshot must equal
  * the model exactly. The model is obviously correct by inspection, so
  * any divergence is a sink bug — this is the cheap half of a
  * Jepsen-style test, covering the op-interleaving space the
  * scenario specs cannot enumerate. Fixed seed: failures reproduce. */
class TxModelSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(t: TxParquetSink): Set[(String, Long)] =
    t.readSnapshot(spark)
      .map(_.as[(String, Long)].collect().toSet)
      .getOrElse(Set.empty)

  test("30 random append/overwrite/compact/truncate sequences match the model") {
    val rng = new scala.util.Random(20260814L)
    val days = Vector("d1", "d2", "d3", "d4")
    for (trial <- 1 to 30) {
      val t = TxParquetSink(
        Files.createTempDirectory(s"txmodel$trial").toString + "/t")
      var model = Map.empty[String, Set[Long]] // day → payloads
      var opLog = List.empty[String]
      val nOps = 3 + rng.nextInt(5)
      for (step <- 1 to nOps) {
        rng.nextInt(10) match {
          case r if r <= 4 => // append: fresh unique payloads to 1-2 days
            val rows = (0 to rng.nextInt(2)).map { _ =>
              val d = days(rng.nextInt(days.size))
              val v = trial * 10000L + step * 100L + rng.nextInt(100)
              (d, v)
            }
            opLog ::= s"append($rows)"
            t.append(rows.toDF("day", "payload"))
            rows.foreach { case (d, v) =>
              model = model.updated(d, model.getOrElse(d, Set.empty) + v)
            }
          case r if r <= 7 => // overwrite one day with fresh content
            val d = days(rng.nextInt(days.size))
            val rows = (0 to rng.nextInt(2)).map(i =>
              (d, trial * 10000L + step * 100L + 50L + i))
            opLog ::= s"overwrite($rows)"
            t.overwritePartitions(spark, rows.toDF("day", "payload"), Seq("day"))
            model = model.updated(d, rows.map(_._2).toSet)
          case 8 =>
            opLog ::= "compact"
            t.compact(spark)
          case _ =>
            opLog ::= "truncate"
            t.truncateHistory()
        }
        val snap = snapshot(t)
        val want: Set[(String, Long)] =
          model.toSeq.flatMap { case (d, vs) => vs.toSeq.map(d -> _) }.toSet
        assert(snap == want,
          s"trial $trial diverged after ${opLog.reverse.mkString(" → ")}:\n" +
            s"  sink:  ${snap.toSeq.sorted}\n  model: ${want.toSeq.sorted}")
      }
    }
  }
}
