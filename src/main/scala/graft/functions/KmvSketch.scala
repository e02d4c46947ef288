package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `kmv_sketch(h, k)` — the K-Minimum-Values distinct-count synopsis
  * (Bar-Yossef et al., RANDOM'02; the KMV/theta-sketch family): per
  * group, the k SMALLEST DISTINCT values of a uniform hash column,
  * returned as an ascending array. The distinct-count estimate derives
  * from the k-th minimum: `(k−1) · 2³² / h_k` for the engine's 32-bit
  * [[Md5Prefix32]] hash contract (when fewer than k distinct hashes
  * exist the sketch IS the exact distinct set).
  *
  * Why not HyperLogLog (`approx_count_distinct`): HLL register layouts
  * and rounding are engine-private, so no oracle can check the result.
  * KMV over the md5-prefix contract is exactly reproducible in ANY
  * engine (DuckDB twin: k-th smallest distinct hash via one window),
  * which turns an approximate operator into a differentially-testable
  * one — estimate AND sketch, bit-for-bit.
  *
  * Scale: O(k) state per group (a bounded TreeSet), partial-merge-able
  * ⇒ map-side combine; the shuffle carries O(groups × k) longs. The
  * exact-distinct alternative shuffles every distinct value. Sketches
  * are also unionable (merge = set-union-then-truncate), so per-day
  * sketches roll up to per-month without rescanning — the property
  * that makes synopses the right answer at 100 TB.
  *
  * Null hashes are skipped (SQL aggregate convention).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_sketch needs k >= 2 (estimator divides by the k-th minimum), got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a bigint hash column, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // bounded insert: only grow past k transiently, trim to the k smallest
    if (buf.size < k || v < buf.last()) {
      buf.add(v)
      if (buf.size > k) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long], b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr) // ascending — TreeSet iteration order
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    buf.forEach(v => { bb.putLong(v); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {

  /** Aggregate Column: ascending array of the k smallest distinct values. */
  def kmvSketch(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      KmvSketchAgg(org.apache.spark.sql.GraftColumnBridge.expression(c), k)
        .toAggregateExpression())

  /** Distinct-count estimate from a sketch column: exact size below k,
    * `(k−1) · 2³² / h_k` at capacity — integer-exact inputs into one
    * double division, bit-identical across engines. */
  def estimateExpr(sketchCol: String, k: Int): String =
    s"""CASE WHEN size($sketchCol) < $k THEN CAST(size($sketchCol) AS DOUBLE)
       |     ELSE CAST(${k - 1} AS DOUBLE) * CAST(4294967296 AS DOUBLE)
       |          / CAST(element_at($sketchCol, $k) AS DOUBLE)
       |END""".stripMargin

  /** Expression builder shared by the temp-function and extensions
    * registration routes: `kmv_sketch(hashCol, k)` with a foldable
    * integer k. */
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "kmv_sketch expects exactly 2 arguments: (hash, k)")
    val kLit = args(1) match {
      case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
        e.eval().asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"kmv_sketch k must be an integer literal, got $other")
    }
    KmvSketchAgg(args.head, kLit)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch", builder, "scala_udf")
}

/** `ndv_estimate(col[, k])` — the KMV distinct-count ESTIMATOR as a
  * first-class SQL aggregate: hashes `col` through the engine's
  * cross-engine md5-prefix contract (`H(s) = int(md5(s)[0:8], 16)`,
  * exactly [[graft.etl.TxParquetSink.appendWithStats]]'s per-commit
  * sketch hash), keeps the k smallest distinct hashes, and evaluates
  * `(k−1) · 2³² / h_k` (exact size below capacity) — the same math as
  * [[KmvSketchAgg.estimateExpr]], so the value is bit-identical to a
  * DuckDB twin AND to the commit-log manifest fold
  * ([[graft.etl.TxParquetSink.tableSketch]]): KMV sketches are a
  * union-truncate semilattice, so a scan's bottom-k equals the union
  * of per-commit bottom-ks. That identity is what lets
  * [[graft.plans.MetadataAggregates]] rewrite `ndv_estimate(col)`
  * over a governed snapshot scan into a LITERAL from the manifests —
  * NDV of a 100 TB table as an O(commits·k) driver fold, zero scan.
  *
  * Scale contract is [[KmvSketchAgg]]'s: O(k) state, map-side
  * combinable, mergeable; the shuffle carries O(groups · k) longs
  * where exact COUNT(DISTINCT) shuffles every distinct value. */
case class KmvNdvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"ndv_estimate needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ndv_estimate's rewritten child must be a bigint hash, got ${child.dataType.simpleString}")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "ndv_estimate"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k || v < buf.last()) {
      buf.add(v)
      if (buf.size > k) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long], b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvNdvAgg.estimate(k, buf.size, if (buf.isEmpty) 0L else buf.last())

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    buf.forEach(v => { bb.putLong(v); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvNdvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvNdvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvNdvAgg =
    copy(child = newChild)
}

object KmvNdvAgg {

  /** Default sketch capacity — MUST stay equal to
    * [[graft.etl.TxParquetSink.SketchK]]: the manifest-fold rewrite
    * only substitutes when the query's k equals the persisted
    * sketches' k. */
  val DefaultK: Int = 64

  /** THE estimator, shared by the scan aggregate's eval and the
    * manifest-fold rewrite: exact `size` below capacity, else one
    * multiply-then-divide over integer-exact doubles — the operation
    * order [[KmvSketchAgg.estimateExpr]] and the DuckDB twins use,
    * so all three agree bit-for-bit. */
  def estimate(k: Int, size: Int, kthMin: Long): Double =
    if (size < k) size.toDouble
    else (k - 1).toDouble * 4294967296.0 / kthMin.toDouble

  /** Builder: `ndv_estimate(col[, k])` over ANY column — wraps the
    * input in the engine's hash contract (cast-to-string → md5
    * prefix), the exact per-commit sketch spelling. */
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1 || args.length == 2,
      "ndv_estimate expects (col) or (col, k)")
    val kLit = if (args.length < 2) DefaultK else args(1) match {
      case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
        e.eval().asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"ndv_estimate k must be an integer literal, got $other")
    }
    KmvNdvAgg(Md5Prefix32(org.apache.spark.sql.catalyst.expressions.Cast(
      args.head, StringType)), kLit)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ndv_estimate", builder, "scala_udf")
}
