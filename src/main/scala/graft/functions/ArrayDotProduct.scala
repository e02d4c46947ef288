package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * Why a custom Catalyst `Expression` (SURVEY.md §7.3's one anticipated
  * candidate): the higher-order-function formulation
  * `aggregate(zip_with(a, b, (x,y) -> ...), 0d, (acc,v) -> acc+v)` is
  * semantically right but interpreted — per-element lambda invocation with
  * boxing, outside whole-stage codegen. On the all-pairs embedding
  * near-dup at sf0.1 (2M pairs × 64 dims) it dominated the whole bench
  * (~25 s of a 74 s total). This expression generates a tight primitive
  * `for` loop inside whole-stage codegen instead.
  *
  * Numeric contract (must match the DuckDB oracle and the HOF it
  * replaces): strict LEFT FOLD in index order — `acc += (double)a[i] *
  * (double)b[i]` — so results are bit-identical to both. Unequal-length
  * inputs yield NULL — exactly what the HOF twin produces (`zip_with`
  * pads the shorter array with null, the multiply yields null, and
  * `aggregate`'s `acc + null` poisons the fold) and what the oracle's
  * `list_zip` fold computes; a min-length partial sum would silently
  * diverge from both. Null ELEMENTS propagate to NULL the same way;
  * null ARRAYS via the default null-intolerant BinaryExpression
  * behavior.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  // A null ELEMENT anywhere poisons the result to NULL — matching the HOF
  // twin, where zip_with's multiply yields null and aggregate's `acc + null`
  // propagates it. Reading the slot as 0.0 instead would silently diverge
  // from the oracle for nullable-element arrays.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Registers `array_dot(a, b)` as a temp SQL function on the session so
    * it composes with `expr(...)`-built plans. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot",
      { args: Seq[Expression] =>
        require(args.length == 2, "array_dot expects exactly 2 arguments")
        ArrayDotProduct(args.head, args(1))
      },
      "scala_udf")
}
