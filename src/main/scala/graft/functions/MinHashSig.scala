package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Whole MinHash signature from a doc's hashed-shingle array in ONE
  * codegen'd expression — no explode, no shuffle, no aggregate.
  *
  * The explode → groupBy(doc_id) → [[MinHashAgg]] formulation re-keys
  * the corpus on doc_id just to reassemble rows that were already
  * together, and — worse on this engine — the keyed aggregate over the
  * generator drops the whole stage out of whole-stage codegen, so the
  * higher-order shingle projection runs interpreted (measured 3.5 s of
  * a 4.5 s query at sf0.1; the keyless twin of the same stage codegens
  * and runs in 0.05 s). Computing the signature per row keeps the map
  * stage fused and codegen'd end-to-end: one tight two-level loop,
  * primitive `long[]` accumulator, no boxing, no per-element lambda
  * dispatch.
  *
  * Hash chain is IDENTICAL to [[MinHashAgg]] (and the SQL
  * `xxhash64(h, s)` composition): per shingle `base = XXH64.hashLong(h,
  * 42)`, per slot `XXH64.hashInt(s, base)`, element-wise min.
  * CatalystAggSpec pins THIS expression equal to the
  * explode→groupBy→[[MinHashAgg]] signature of the same input, with
  * whole-stage codegen ON (doGenCode path) and OFF (nullSafeEval
  * path). An EMPTY shingle array yields the
  * all-Long.MaxValue signature (the aggregate form emits no row for a
  * doc with no shingles — callers that band signatures must filter
  * empty-shingle docs first, or every sub-width doc would share one
  * degenerate bucket).
  *
  * At 100 TB: signatures are map-side; the only shuffle in an LSH dedup
  * is then the (band, band_sig) bucket exchange of 8-byte keys. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<bigint> shingle hashes, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val m = a.numElements()
    var i = 0
    while (i < m) {
      val base = XXH64.hashLong(a.getLong(i), 42L)
      var s = 0
      while (s < numHashes) {
        val h = XXH64.hashInt(s, base)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $m = $a.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $m; $i++) {
         |  long $base = $xxh.hashLong($a.getLong($i), 42L);
         |  for (int $s = 0; $s < $numHashes; $s++) {
         |    long $h = $xxh.hashInt($s, $base);
         |    if ($h < $sig[$s]) $sig[$s] = $h;
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** `graft_minhash_sig(sh)` as a Column. */
  def minhashSig(c: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), numHashes))
}
