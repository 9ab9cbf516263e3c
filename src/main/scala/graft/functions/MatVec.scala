package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dense matrix-vector product `y = M·x` over an `array<double>`
  * column — the per-row primitive behind learned ROTATIONS (OPQ's
  * orthogonal R applied to every residual before product quantization,
  * `Similarity.topKOpq`). A d×d rotation is d² multiply-adds per row;
  * the higher-order-function spelling (`transform` of `aggregate
  * (zip_with(...))` per output dim) evaluates INTERPRETED through d²
  * lambda dispatches — the same cost profile that motivated
  * [[PqEncode]] — while this expression is two tight codegen'd loops.
  *
  * The matrix rides as a reference object (`ctx.addReferenceObj`), not
  * SQL literal text, so generated code stays O(1) in d² — safe for
  * production dims (a 1024-d rotation is 8 MB of doubles; as literal
  * text it would blow the 64 KB JVM method limit long before that).
  *
  * Inputs shorter than the matrix width read as zero-padded (the
  * [[PqEncode]] convention); rows of the output are emitted in matrix
  * row order. Deterministic: plain IEEE multiply-add in fixed (row,
  * col) order, same on every executor.
  *
  * The matrix is carried in the expression tree as immutable `Vector`s
  * (the factory copies the caller's arrays), so `equals`/`hashCode`
  * are structural — semantically identical instances compare equal and
  * Catalyst canonicalization/CSE can merge the MatVec column embedded
  * per-entry in the 128-slot OPQ query-table transform; the previous
  * `Array[Array[Double]]` field compared by REFERENCE, silently
  * defeating both (r16 ADVICE). The mutable `double[][]` handed to
  * codegen is a private transient derivative, never aliased to caller
  * state. */
case class MatVecMul(child: Expression, mat: Vector[Vector[Double]])
    extends UnaryExpression {

  require(mat.nonEmpty && mat.forall(_.length == mat(0).length),
    "mat must be a non-empty rectangular matrix")
  private val nRows = mat.length
  private val nCols = mat(0).length
  @transient private lazy val matArr: Array[Array[Double]] =
    mat.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_mat_vec expects array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_mat_vec"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val ne = v.numElements()
    val out = new Array[Double](nRows)
    var i = 0
    while (i < nRows) {
      val row = matArr(i)
      var s = 0.0
      var j = 0
      while (j < nCols) {
        if (j < ne) s += row(j) * v.getDouble(j)
        j += 1
      }
      out(i) = s
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("mat", matArr, "double[][]")
      val ne = ctx.freshName("ne")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $ne = $v.numElements();
         |double[] $out = new double[$nRows];
         |for (int $i = 0; $i < $nRows; $i++) {
         |  double[] $row = $m[$i];
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $nCols; $j++) {
         |    if ($j < $ne) $s += $row[$j] * $v.getDouble($j);
         |  }
         |  $out[$i] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVec {
  /** Column form: `mat · vec` over an array<double> column. */
  def mul(vec: Column, mat: Array[Array[Double]]): Column =
    GraftBridge.column(MatVecMul(GraftBridge.expression(vec),
      mat.iterator.map(_.toVector).toVector))
}
