package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_prefix32(s)` = the engine's cross-engine hash contract
  * `H(s) = int(md5(s)[0:8], 16)` computed directly from the digest bytes.
  *
  * Semantically identical to
  * `conv(substring(md5(s), 1, 8), 16, 10)::long` — the first 8 hex chars
  * ARE the first 4 digest bytes — but skips the hex-string render,
  * substring, and string→number parse that made the composed form the
  * hot path of the fingerprint/shingle operators (~4 µs and several
  * allocations per call; this is one digest + 4 shifts). The DuckDB
  * oracle keeps its hex-fold formulation; values match bit-for-bit.
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix32 expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix32"

  // One MessageDigest per thread, reused across calls — getInstance per
  // row is the dominant cost of naive md5 at millions of calls/second
  // (digest() resets the instance, so reuse is safe).
  @transient private lazy val localDigest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any = {
    val d = localDigest.get().digest(input.asInstanceOf[UTF8String].getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // per-generated-class digest instance (one per task thread)
      val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }""".stripMargin)
      val d = ctx.freshName("digest")
      s"""
         |byte[] $d = $md.digest($c.getBytes());
         |${ev.value} = (((long)($d[0] & 0xFF)) << 24) | (((long)($d[1] & 0xFF)) << 16) |
         |  (((long)($d[2] & 0xFF)) << 8) | ((long)($d[3] & 0xFF));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)
}

object Md5Prefix32 {
  /** Driver-side twin of the expression — identical bytes, identical
    * long — for metadata consumers (the manifest bloom membership test
    * in [[graft.etl.TxParquetSink]]) that must agree with bits set by
    * the column expression. */
  def hash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Temp-function registration (same pattern as [[ArrayDotProduct]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix32",
      { args: Seq[Expression] =>
        require(args.length == 1, "md5_prefix32 expects exactly 1 argument")
        Md5Prefix32(args.head)
      },
      "scala_udf")
}
