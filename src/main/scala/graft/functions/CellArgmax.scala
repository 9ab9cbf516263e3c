package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** Shared contract of the native nearest-cell argmax expressions
  * ([[CellArgmax]] flat, [[CellArgmaxNested]] two-level): given a row's
  * `array<float>` embedding and its precomputed L2 norm, emit
  * `struct<best: double, cid: int>` — the best cosine against a fixed
  * cell (centroid) table and the id of the cell that achieved it, ties
  * to the EARLIEST table entry (strict `>`).
  *
  * This replaces the interpreted higher-order-function fold
  * (`aggregate` over a `typedlit` centroid array with a try_divide +
  * dot lambda per cell) that sat in every IVF-family assignment —
  * corpus assignment for ivf/ivfpq/ivfpq_res/opq/SemDeDup, every Lloyd
  * training round, and the regime signal. That fold dispatched k
  * lambdas per row through the interpreter (k ≈ √n cells — ~1.4k at
  * the 2M-vector decade, where it was measured as the reason the
  * uniform regime was unaffordable; SCALE.md); this expression is two
  * tight codegen'd loops, the [[PqEncode]]/[[MatVecMul]] treatment
  * applied to cell assignment.
  *
  * Bit-equality contract with the fold (pinned by CellArgmaxSpec) for
  * every defined-direction input:
  *  - dot = ascending double accumulation over min(cell, row) length —
  *    [[DotProductFloat]]'s order exactly;
  *  - cosine = dot / (row_norm * cell_norm), with a ZERO denominator
  *    skipping the cell (the fold's `try_divide` NULL semantics — a
  *    plain Java divide would yield ±Infinity and wrongly win the
  *    argmax);
  *  - a NaN cosine never compares greater (Java IEEE `>`), so NaN rows
  *    keep cid −1 — the ONE deliberate divergence from the fold, which
  *    used Spark SQL GreaterThan (NaN orders ABOVE every double) and so
  *    silently assigned a NaN vector to the first nonzero-norm cell,
  *    contradicting its own documented undefined-direction contract;
  *    CellArgmaxSpec pins both behaviors (no fixture vector is NaN, so
  *    no query key moves);
  *  - accumulator init (−Double.MAX_VALUE, −1) — Scala's
  *    `Double.MinValue`, NOT Java's `Double.MIN_VALUE` (smallest
  *    positive double), the one-character trap in the generated code;
  *  - cells are visited in table order; strict `>` keeps the earliest.
  *
  * The cell table rides into generated code as REFERENCE OBJECTS
  * (`ctx.addReferenceObj`), not SQL literal text or plan-embedded
  * `typedlit` data: the literal form grows O(k·dim) ≈ O(√n·dim) per
  * plan (~8 MB at n = 10⁹), re-serialized with every task binary. In
  * the expression tree the table is carried as immutable `Vector`s, so
  * `equals`/`hashCode` are structural — Catalyst canonicalization and
  * common-subexpression elimination see semantically identical
  * assignments as equal (the [[MatVecMul]] aliasing lesson).
  */
object CellArgmax {

  /** One cell: id, vector, precomputed L2 norm. Immutable and
    * structurally comparable (Vector equality is elementwise). */
  final case class Cell(cid: Int, vec: Vector[Float], nrm: Double)

  /** struct<best: double, cid: int> — field names are load-bearing:
    * callers address the result via `.getField("best")`/`("cid")`. */
  val BestStruct: StructType = StructType(Seq(
    StructField("best", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))

  /** Driver-side norm in the exact IEEE order the fold's `centArray`
    * used (ascending x² accumulation, then sqrt). */
  private[graft] def normOf(v: Array[Float]): Double =
    math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))

  private[graft] def cellsOf(cents: Seq[(Int, Array[Float])]): Vector[Cell] =
    cents.iterator.map { case (cid, v) =>
      Cell(cid, v.toVector, normOf(v))
    }.toVector

  /** Column form: best (cosine, cell id) of `vec` against `cents`. */
  def best(vec: Column, nrm: Column, cents: Seq[(Int, Array[Float])]): Column =
    GraftBridge.column(CellArgmax(GraftBridge.expression(vec),
      GraftBridge.expression(nrm), cellsOf(cents)))

  /** Column form of [[CellArgmaxNested]]: `sid` selects the slice. */
  def bestNested(vec: Column, nrm: Column, sid: Column,
      slices: Seq[Seq[(Int, Array[Float])]]): Column =
    GraftBridge.column(CellArgmaxNested(GraftBridge.expression(vec),
      GraftBridge.expression(nrm), GraftBridge.expression(sid),
      slices.iterator.map(cellsOf).toVector))

  /** The shared interpreted kernel (non-codegen fallback; also the
    * form the generated Java mirrors statement-for-statement). */
  private[graft] def evalCells(v: ArrayData, rowNrm: Double, ids: Array[Int],
      vecs: Array[Array[Float]], norms: Array[Double]): GenericInternalRow = {
    val ne = v.numElements()
    var best = Double.MinValue
    var cid = -1
    var c = 0
    while (c < ids.length) {
      val denom = rowNrm * norms(c)
      if (denom != 0.0) {
        val cv = vecs(c)
        val n = math.min(cv.length, ne)
        var dot = 0.0
        var j = 0
        while (j < n) { dot += cv(j).toDouble * v.getFloat(j).toDouble; j += 1 }
        val cos = dot / denom
        if (cos > best) { best = cos; cid = ids(c) }
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, cid))
  }

  /** The generated-Java twin of [[evalCells]], parameterized on the
    * reference-object names — shared by the flat and nested codegen so
    * the two expressions cannot drift. */
  private[graft] def genKernel(ctx: CodegenContext, v: String, nrmV: String,
      ids: String, vecs: String, norms: String, out: String): String = {
    val ne = ctx.freshName("ne")
    val best = ctx.freshName("best")
    val cid = ctx.freshName("cid")
    val c = ctx.freshName("c")
    val denom = ctx.freshName("denom")
    val cv = ctx.freshName("cv")
    val n = ctx.freshName("n")
    val dot = ctx.freshName("dot")
    val j = ctx.freshName("j")
    val cos = ctx.freshName("cos")
    s"""
       |int $ne = $v.numElements();
       |double $best = -Double.MAX_VALUE;
       |int $cid = -1;
       |for (int $c = 0; $c < $ids.length; $c++) {
       |  double $denom = $nrmV * $norms[$c];
       |  if ($denom != 0.0) {
       |    float[] $cv = $vecs[$c];
       |    int $n = $cv.length < $ne ? $cv.length : $ne;
       |    double $dot = 0.0;
       |    for (int $j = 0; $j < $n; $j++) {
       |      $dot += (double) $cv[$j] * (double) $v.getFloat($j);
       |    }
       |    double $cos = $dot / $denom;
       |    if ($cos > $best) { $best = $cos; $cid = $ids[$c]; }
       |  }
       |}
       |$out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
       |    new Object[]{Double.valueOf($best), Integer.valueOf($cid)});
     """.stripMargin
  }
}

/** Flat nearest-cell argmax — see [[CellArgmax$]] for the contract. */
case class CellArgmax(vec: Expression, nrm: Expression,
    cells: Vector[CellArgmax.Cell]) extends BinaryExpression {

  require(cells.nonEmpty, "cells must be non-empty")

  override def left: Expression = vec
  override def right: Expression = nrm

  @transient private lazy val idArr: Array[Int] = cells.map(_.cid).toArray
  @transient private lazy val vecArr: Array[Array[Float]] =
    cells.map(_.vec.toArray).toArray
  @transient private lazy val nrmArr: Array[Double] = cells.map(_.nrm).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, nrm.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cell_argmax expects (array<float>, double), got ($l, $r)")
    }
  override def dataType: DataType = CellArgmax.BestStruct
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cell_argmax"

  override def nullSafeEval(v: Any, n: Any): Any =
    CellArgmax.evalCells(v.asInstanceOf[ArrayData], n.asInstanceOf[Double],
      idArr, vecArr, nrmArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val ids = ctx.addReferenceObj("cellIds", idArr, "int[]")
      val vecs = ctx.addReferenceObj("cellVecs", vecArr, "float[][]")
      val norms = ctx.addReferenceObj("cellNorms", nrmArr, "double[]")
      CellArgmax.genKernel(ctx, v, n, ids, vecs, norms, ev.value.toString)
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, nrm = newRight)
}

/** Two-level nearest-cell argmax: `sid` (the row's super-cell from a
  * prior [[CellArgmax]] pass) selects which per-super slice of the
  * nested cell table the row competes in — the coarse SemDeDup
  * assignment, previously an interpreted fold over
  * `element_at(nestedLiteral, sid + 1)`.
  *
  * An out-of-range `sid` throws (ArrayIndexOutOfBounds), matching the
  * fold form where `element_at` on a bad index is an ANSI runtime
  * error — callers guard `sid >= 0` with a `when`, exactly as before. */
case class CellArgmaxNested(vec: Expression, nrm: Expression, sid: Expression,
    slices: Vector[Vector[CellArgmax.Cell]]) extends TernaryExpression {

  require(slices.nonEmpty && slices.forall(_.nonEmpty),
    "slices must be non-empty per super cell")

  override def first: Expression = vec
  override def second: Expression = nrm
  override def third: Expression = sid

  @transient private lazy val idArr: Array[Array[Int]] =
    slices.map(_.map(_.cid).toArray).toArray
  @transient private lazy val vecArr: Array[Array[Array[Float]]] =
    slices.map(_.map(_.vec.toArray).toArray).toArray
  @transient private lazy val nrmArr: Array[Array[Double]] =
    slices.map(_.map(_.nrm).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, nrm.dataType, sid.dataType) match {
      case (ArrayType(FloatType, _), DoubleType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r, s) => TypeCheckResult.TypeCheckFailure(
        s"graft_cell_argmax_nested expects (array<float>, double, int), got ($l, $r, $s)")
    }
  override def dataType: DataType = CellArgmax.BestStruct
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cell_argmax_nested"

  override def nullSafeEval(v: Any, n: Any, s: Any): Any = {
    val si = s.asInstanceOf[Int]
    CellArgmax.evalCells(v.asInstanceOf[ArrayData], n.asInstanceOf[Double],
      idArr(si), vecArr(si), nrmArr(si))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n, s) => {
      val idsN = ctx.addReferenceObj("cellIdsN", idArr, "int[][]")
      val vecsN = ctx.addReferenceObj("cellVecsN", vecArr, "float[][][]")
      val normsN = ctx.addReferenceObj("cellNormsN", nrmArr, "double[][]")
      val ids = ctx.freshName("ids")
      val vecs = ctx.freshName("vecs")
      val norms = ctx.freshName("norms")
      s"""
         |int[] $ids = $idsN[$s];
         |float[][] $vecs = $vecsN[$s];
         |double[] $norms = $normsN[$s];
         |${CellArgmax.genKernel(ctx, v, n, ids, vecs, norms, ev.value.toString)}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, nrm = newSecond, sid = newThird)
}
