package graft

import graft.functions.CellArgmax
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-equality pin of the codegen [[graft.functions.CellArgmax]] /
  * [[graft.functions.CellArgmaxNested]] expressions against the r16
  * interpreted argmax fold they replaced (retained in Similarity as
  * `argmaxFoldRef`/`argmaxFoldNestedRef` solely as this spec's oracle).
  * The fold was the measured scale-killer of every IVF-family key
  * (SCALE.md, the capped 2M-vector decade); the replacement is only
  * valid if it is INDISTINGUISHABLE — raw IEEE bits of the best cosine
  * and the exact cell id, on the real corpus and on every degradation
  * edge (zero-norm row, NaN entry, zero-norm centroid), with codegen
  * ON and OFF (doGenCode and the interpreted eval are separate code). */
class CellArgmaxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(): DataFrame =
    graft.sources.Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorOps.norm("embedding").as("nrm"))

  /** Stride-seed cells off the fixture corpus (the Lloyd seed shape). */
  private def seedCells(c: DataFrame, stride: Long): Seq[(Int, Array[Float])] =
    c.filter(col("vec_id") % stride === 0)
      .select((col("vec_id") / stride).cast("int"), col("embedding"))
      .as[(Int, Array[Float])].collect().sortBy(_._1).toSeq

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  /** Collect (vec_id -> (bestBits, cid)) under a given assignment column. */
  private def assigned(c: DataFrame, a: org.apache.spark.sql.Column)
      : Map[Long, (Long, Int)] =
    c.withColumn("a", a)
      .select(col("vec_id"), col("a.best"), col("a.cid"))
      .collect()
      .map(r => r.getLong(0) -> (bits(r.getDouble(1)), r.getInt(2)))
      .toMap

  private def withCodegenOff[T](body: => T): T = {
    val conf = spark.conf
    val prevWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      body
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWs)
      conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("flat CellArgmax == interpreted fold, raw bits, fixture corpus") {
    val c = corpus()
    val cents = seedCells(c, 20L)
    assert(cents.size >= 10, "fixture should yield a real cell table")
    val viaFold = assigned(c, Similarity.argmaxFoldRef(cents, "embedding", "nrm"))
    val viaExpr = assigned(c, CellArgmax.best(col("embedding"), col("nrm"), cents))
    assert(viaExpr.size == viaFold.size && viaExpr.nonEmpty)
    assert(viaExpr == viaFold, "codegen argmax diverges from the fold")
    val viaExprNoGen = withCodegenOff(
      assigned(c, CellArgmax.best(col("embedding"), col("nrm"), cents)))
    assert(viaExprNoGen == viaFold, "interpreted eval diverges from the fold")
  }

  test("degradation edges: zero-norm row, NaN entry, zero-norm cell") {
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 0f, 0f, 0f)),           // zero-norm row -> cid -1
      (2L, Array(Float.NaN, 1f, 0f, 0f)),    // NaN entry -> cid -1
      (3L, Array(-1f, -1f, 0.5f, 0f)),
      (4L, Array(0f, 2f, 0f, 0f)))
    val c = rows.toDF("vec_id", "embedding")
      .withColumn("nrm", graft.functions.VectorOps.norm("embedding"))
    val cells: Seq[(Int, Array[Float])] = Seq(
      0 -> Array(1f, 0f, 0f, 0f),
      1 -> Array(0f, 0f, 0f, 0f),            // zero-norm cell: never wins
      2 -> Array(0f, 1f, 0f, 0f),
      3 -> Array(1f, 0f, 0f, 0f))            // duplicate of cell 0: tie -> 0
    val viaFold = assigned(c, Similarity.argmaxFoldRef(cells, "embedding", "nrm"))
    val viaExpr = assigned(c, CellArgmax.best(col("embedding"), col("nrm"), cells))
    // Parity on every DEFINED-direction row (incl. the zero-norm row
    // and the zero-norm cell, where try_divide NULL == the denom skip).
    assert((viaExpr - 2L) == (viaFold - 2L))
    assert(viaExpr(1L)._2 == -1, "zero-norm row must keep cid -1")
    assert(viaExpr(0L)._2 == 0, "tie must keep the earliest cell")
    // The NaN row is the DELIBERATE divergence this spec documents: the
    // fold's `cos > best` is Spark SQL GreaterThan, which orders NaN
    // ABOVE every double (nanSafeCompareDoubles) — so the fold silently
    // assigned a NaN vector to the first nonzero-norm cell, (NaN, 0),
    // contradicting its own documented undefined-direction contract.
    // The codegen expression uses Java IEEE comparison (NaN > x false),
    // which implements the documented contract: cid -1.
    assert(viaFold(2L) == (bits(Double.NaN), 0),
      "fold behavior changed: NaN row no longer assigned by Spark NaN ordering")
    assert(viaExpr(2L)._2 == -1,
      "NaN (undefined-direction) row must keep cid -1 in the expression")
    val viaExprNoGen = withCodegenOff(
      assigned(c, CellArgmax.best(col("embedding"), col("nrm"), cells)))
    assert(viaExprNoGen == viaExpr)
  }

  test("nested CellArgmaxNested == interpreted nested fold, raw bits") {
    val c = corpus()
    val cents = seedCells(c, 10L)
    // two-level split: supers = every 4th cell, slices round-robin so
    // every slice is non-empty and slice boundaries are deterministic
    val nSup = math.max(2, cents.size / 4)
    val slices: Seq[Seq[(Int, Array[Float])]] =
      (0 until nSup).map(s => cents.zipWithIndex.collect {
        case (cell, i) if i % nSup == s => cell
      })
    val supers = slices.zipWithIndex.map { case (sl, i) => (i, sl.head._2) }
    val withSid = c.withColumn("sid",
      CellArgmax.best(col("embedding"), col("nrm"), supers).getField("cid"))
    val viaFold = assigned(withSid,
      Similarity.argmaxFoldNestedRef(slices, col("sid"), "embedding", "nrm"))
    val viaExpr = assigned(withSid,
      CellArgmax.bestNested(col("embedding"), col("nrm"), col("sid"), slices))
    assert(viaExpr.size == viaFold.size && viaExpr.nonEmpty)
    assert(viaExpr == viaFold, "nested codegen argmax diverges from the fold")
    val viaExprNoGen = withCodegenOff(assigned(withSid,
      CellArgmax.bestNested(col("embedding"), col("nrm"), col("sid"), slices)))
    assert(viaExprNoGen == viaFold)
  }

  test("structural equality: identical cell tables canonicalize equal") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // children must be identical for this to isolate the CELL-TABLE
    // comparison (fresh Array payloads per instance — the MatVecMul
    // reference-equality trap this expression's Vector storage avoids)
    val vec = Literal.create(Array(1f, 0f), ArrayType(FloatType, false))
    val nrm = Literal(1.0)
    def make() = graft.functions.CellArgmax(vec, nrm,
      CellArgmax.cellsOf(Seq(0 -> Array(1f, 2f), 1 -> Array(3f, 4f))))
    assert(make() == make(),
      "semantically identical CellArgmax instances must compare equal " +
        "(Catalyst CSE/canonicalization)")
    assert(make().hashCode == make().hashCode)
  }
}
