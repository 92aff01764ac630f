package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path: dot product of
  * two `array<float>` columns accumulated in double, index order.
  *
  * Semantically identical to the declarative
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0d, _+_)` formulation (and to
  * DuckDB's `list_dot_product` on `DOUBLE[]` — same element order, same
  * accumulator width, so oracle comparisons stay bit-exact), but codegen'd
  * as a tight primitive loop: no per-row lambda closures, no intermediate
  * product array. This is the preference-order (b) case of the builder
  * brief — a scalar op Spark's built-ins only express via interpreted
  * higher-order functions, worth a custom `Expression` because it sits
  * inside an O(candidates × dims) ANN loop.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(FloatType, false) ||
        left.dataType == ArrayType(FloatType, true)) {
      if (right.dataType == ArrayType(FloatType, false) ||
          right.dataType == ArrayType(FloatType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"right must be array<float>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"left must be array<float>, got ${left.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level API for the custom expressions. */
object GraftFunctions {
  private val Name = "graft_vec_dot"

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => FloatVectorDot(exprs(0), exprs(1)), "built-in")

  /** Dot product of two array<float> columns (register first). */
  def vecDot(a: Column, b: Column): Column = call_function(Name, a, b)
}
