package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two `array<float>` columns.
  *
  * The performance path for [[VectorOps]]: the higher-order-function form
  * (`aggregate(zip_with(...))`) materializes an intermediate products
  * array per row; this expression emits one fused while-loop in
  * whole-stage codegen — no allocation, primitive float reads, double
  * accumulation in array order (bit-identical to the HOF form and the
  * DuckDB oracle, pinned by CatalystExprSpec).
  *
  * Assumes equal-length, non-null-element arrays (the embedding-column
  * contract); extra trailing elements on either side are ignored.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |    ? $a.numElements() : $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductFloat {
  /** Register `graft_dot(a, b)` for SQL/expr use in this session.
    * Idempotent: a no-op when the function already exists (it does in
    * any session built with [[graft.GraftExtensions]]) — re-registering
    * per query invocation spammed `SimpleFunctionRegistry` replacement
    * warnings across a 97-query bench session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")))
      reg.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProductFloat(exprs(0), exprs(1)), "built-in")
  }
}
