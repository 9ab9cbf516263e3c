package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native product-quantization encoder over an `array<float>` embedding:
  * one fused pass normalizes the vector and, per subspace, emits the id
  * of the L2-nearest codebook centroid — `array<int>` of `books.length`
  * codes (4-bit each at k = 16: conceptually one byte per pair of
  * subspaces; int array for expression-tree simplicity).
  *
  * Replaces the higher-order-function fold
  * (`aggregate(zip_with(...))` per subspace) that Spark evaluates
  * INTERPRETED per row — m·k·subDim multiplies through lambda
  * dispatch, measured as the dominant cost of both PQ training
  * assignment and corpus encoding in `Similarity.topKPq`. Same IEEE
  * operation order as that fold (divide by the norm, subtract, square,
  * accumulate ascending), so codes are bit-identical; ties keep the
  * lowest centroid id (strict `<`).
  *
  * The codebooks ride as a reference object (`ctx.addReferenceObj`),
  * not SQL literal text — the [[HyperplaneSigs]] rationale: generated
  * code stays O(1) in m·k·subDim, safe for production-sized codebooks.
  *
  * A zero-norm vector (undefined direction) yields all `-1` codes —
  * callers exclude such vectors upstream, the same contract as
  * `Similarity.assignedCentId`.
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(books.nonEmpty && books.forall(_.nonEmpty), "books must be m x k x subDim")
  private val subDim = books(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val ne = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < ne) { val x = v.getFloat(i).toDouble; ss += x * x; i += 1 }
    val nrm = math.sqrt(ss)
    val codes = new Array[Int](books.length)
    var s = 0
    while (s < books.length) {
      val book = books(s)
      var best = Double.MaxValue
      var cid = -1
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val idx = s * subDim + j
          val x = if (idx < ne) v.getFloat(idx).toDouble / nrm else 0.0
          val diff = x - cent(j)
          d += diff * diff
          j += 1
        }
        if (d < best) { best = d; cid = c }
        c += 1
      }
      codes(s) = cid
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bk = ctx.addReferenceObj("books", books, "double[][][]")
      val ne = ctx.freshName("ne")
      val ss = ctx.freshName("ss")
      val nrm = ctx.freshName("nrm")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val book = ctx.freshName("book")
      val best = ctx.freshName("best")
      val cid = ctx.freshName("cid")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val x = ctx.freshName("x")
      val diff = ctx.freshName("diff")
      val i = ctx.freshName("i")
      s"""
         |int $ne = $v.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $ne; $i++) {
         |  double $x = (double) $v.getFloat($i);
         |  $ss += $x * $x;
         |}
         |double $nrm = java.lang.Math.sqrt($ss);
         |int[] $codes = new int[${books.length}];
         |for (int $s = 0; $s < ${books.length}; $s++) {
         |  double[][] $book = $bk[$s];
         |  double $best = Double.MAX_VALUE;
         |  int $cid = -1;
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    double[] $cent = $book[$c];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      int $idx = $s * $subDim + $j;
         |      double $x = $idx < $ne ? (double) $v.getFloat($idx) / $nrm : 0.0;
         |      double $diff = $x - $cent[$j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $best) { $best = $d; $cid = $c; }
         |  }
         |  $codes[$s] = $cid;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Column form: PQ codes of a raw (un-normalized) float embedding. */
  def codes(vec: Column, books: Seq[Seq[(Int, Array[Double])]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec),
      books.map(_.map(_._2).toArray).toArray))

  /** Column form of [[PqEncodeRaw]]: codes of an array<double> taken
    * AS-IS (residual vectors are already in the scoring frame — no
    * internal normalization). */
  def codesRaw(vec: Column, books: Seq[Seq[(Int, Array[Double])]]): Column =
    GraftBridge.column(PqEncodeRaw(GraftBridge.expression(vec),
      books.map(_.map(_._2).toArray).toArray))
}

/** [[PqEncode]] for RESIDUAL vectors (IVFADC, Jégou et al. 2011): input
  * is `array<double>` already expressed in the scoring frame
  * (x_unit − cell_centroid_unit), so no normalization happens — the
  * residual's magnitude IS signal. Same fused argmin pass, same
  * strict-`<` lowest-id tie-break, same reference-object codebooks. */
case class PqEncodeRaw(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(books.nonEmpty && books.forall(_.nonEmpty), "books must be m x k x subDim")
  private val subDim = books(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode_raw expects array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_encode_raw"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val ne = v.numElements()
    val codes = new Array[Int](books.length)
    var s = 0
    while (s < books.length) {
      val book = books(s)
      var best = Double.MaxValue
      var cid = -1
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val idx = s * subDim + j
          val x = if (idx < ne) v.getDouble(idx) else 0.0
          val diff = x - cent(j)
          d += diff * diff
          j += 1
        }
        if (d < best) { best = d; cid = c }
        c += 1
      }
      codes(s) = cid
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bk = ctx.addReferenceObj("books", books, "double[][][]")
      val ne = ctx.freshName("ne")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val book = ctx.freshName("book")
      val best = ctx.freshName("best")
      val cid = ctx.freshName("cid")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val x = ctx.freshName("x")
      val diff = ctx.freshName("diff")
      s"""
         |int $ne = $v.numElements();
         |int[] $codes = new int[${books.length}];
         |for (int $s = 0; $s < ${books.length}; $s++) {
         |  double[][] $book = $bk[$s];
         |  double $best = Double.MAX_VALUE;
         |  int $cid = -1;
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    double[] $cent = $book[$c];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      int $idx = $s * $subDim + $j;
         |      double $x = $idx < $ne ? $v.getDouble($idx) : 0.0;
         |      double $diff = $x - $cent[$j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $best) { $best = $d; $cid = $c; }
         |  }
         |  $codes[$s] = $cid;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
