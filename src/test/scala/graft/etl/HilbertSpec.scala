package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hilbert clustering: the column fold equals the classical imperative
  * xy→d walk EXHAUSTIVELY on a full grid, the curve is a continuous
  * bijection (every step grid-adjacent — the property Z-order lacks,
  * shown on the same grid), and box queries fragment into fewer
  * contiguous key runs than under Z-order (the fewer-files-touched
  * claim, measured). The cross-engine fold is hash-gated by
  * `etl_hilbert_key`. */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  /** The classical imperative reference (same rotation rules). */
  private def refD(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private val bits = 5
  private val n = 1 << bits // 32

  private def grid() = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
    .toDF("x", "y")

  private def keyed() = Hilbert.withHilbert(grid(), col("x"), col("y"), "h", bits)
    .select("x", "y", "h").as[(Long, Long, Long)].collect()

  test("column fold equals the imperative reference on the full grid") {
    keyed().foreach { case (x, y, h) =>
      assert(h == refD(bits, x, y), s"($x,$y): got $h, want ${refD(bits, x, y)}")
    }
  }

  test("the curve is a continuous bijection; Z-order is not continuous") {
    val cells = keyed().sortBy(_._3)
    assert(cells.map(_._3).toSeq == (0L until (n.toLong * n)).toSeq,
      "h must be a bijection onto 0 .. n^2-1")
    cells.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve must step to an adjacent cell: ($x1,$y1) -> ($x2,$y2)")
    }
    // the same grid under Morton order takes non-adjacent jumps
    val z = grid()
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), bits))
      .select("x", "y", "z").as[(Long, Long, Long)].collect().sortBy(_._3)
    val jumps = z.sliding(2).count { case Array((x1, y1, _), (x2, y2, _)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(jumps > 0, "Z-order should exhibit discontinuous jumps")
  }

  test("box queries fragment into fewer key runs than under Z-order") {
    val h = keyed().map { case (x, y, k) => (x, y) -> k }.toMap
    val z = grid().withColumn("z", ZOrder.zValue(col("x"), col("y"), bits))
      .select("x", "y", "z").as[(Long, Long, Long)].collect()
      .map { case (x, y, k) => (x, y) -> k }.toMap
    // contiguous runs of sorted keys for one box under one key space
    def runs(keys: Seq[Long]): Int = {
      val s = keys.sorted
      1 + s.sliding(2).count { case Seq(a, b) => b != a + 1; case _ => false }
    }
    var (hRuns, zRuns) = (0, 0)
    for (bx <- 0 until n - 8 by 4; by <- 0 until n - 8 by 4) {
      val box = for (x <- bx until bx + 8; y <- by until by + 8)
        yield (x.toLong, y.toLong)
      hRuns += runs(box.map(h))
      zRuns += runs(box.map(z))
    }
    assert(hRuns < zRuns,
      s"hilbert must fragment boxes less: $hRuns vs z $zRuns")
  }
}
