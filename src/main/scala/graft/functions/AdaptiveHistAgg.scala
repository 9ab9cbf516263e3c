package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** ClickHouse `histogram(n)` analogue: a streaming adaptive histogram
  * over exact integer values (cents), as an imperative aggregate. The
  * state is at most `nBins` bins `(lo, hi, cnt, sum)` sorted by lo,
  * where [lo, hi] is the exact hull (min/max) of the values admitted
  * to the bin and cnt/sum are exact Long tallies — so total mass
  * (Σcnt) and total value (Σsum) are conserved bit-exactly no matter
  * how values are binned. Within one partition's stream a new value
  * falling inside an existing hull updates that bin; otherwise it is
  * admitted as a singleton, and on overflow the two adjacent bins
  * with the smallest hull gap (`next.lo - prev.hi`, earliest pair on
  * ties) merge — so partition-local hulls stay disjoint. Partial-state
  * merge concatenates, sorts, and applies the SAME nearest-gap
  * reduction back to the cap; because independent partials each cover
  * the data range, their hulls interleave, and forcing disjointness
  * there would collapse the histogram (any grouping of a connected
  * overlap graph into >1 disjoint hull is impossible) — so merged
  * hulls MAY overlap, exactly like ClickHouse's centroid-merged bins,
  * while `lo` stays sorted and mass stays exact.
  *
  * Like ClickHouse's own `histogram` (a Ben-Haim & Tom-Tov-style
  * streaming build), the bin BOUNDARIES depend on admission order, so
  * callers gate it rows-only; what is order-INDEPENDENT — and what
  * HistogramSpec pins — is the conservation of Σcnt/Σsum, the
  * lo-sorted structure with per-bin mean inside the hull, the output
  * size `min(nBins, distinct)`, and the exact regime: a group with
  * ≤ nBins distinct values yields the exact (value, count) table
  * (every bin a singleton, lo = hi = value, sum = value·cnt) under
  * ANY partitioning — equal singletons have hull gap 0 and merge
  * first, and the reduction stops at ≤ nBins distinct singletons.
  *
  * Scale: state is O(nBins) per group — a bounded sketch like
  * `UniqUpToAgg`/`MisraGriesAgg` — so the aggregate map-side-combines
  * and the shuffle carries ≤ nBins·32 bytes per (group, partition),
  * independent of row count. */
case class AdaptiveHistAgg(
    v: Expression,
    nBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[AdaptiveHistAgg.Buf] {

  require(nBins >= 1, "histogram needs nBins >= 1")

  override def children: Seq[Expression] = Seq(v)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("lo", LongType, nullable = false),
      StructField("hi", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("sum", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_histogram"

  override def checkInputDataTypes(): TypeCheckResult =
    if (v.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_histogram expects bigint values, got ${v.dataType}")

  override def createAggregationBuffer(): AdaptiveHistAgg.Buf =
    new AdaptiveHistAgg.Buf(collection.mutable.ArrayBuffer.empty)

  override def update(buf: AdaptiveHistAgg.Buf, input: InternalRow): AdaptiveHistAgg.Buf = {
    val x = v.eval(input)
    if (x != null) AdaptiveHistAgg.insert(buf.bins, x.asInstanceOf[Long], nBins)
    buf
  }

  override def merge(a: AdaptiveHistAgg.Buf, b: AdaptiveHistAgg.Buf): AdaptiveHistAgg.Buf = {
    if (b.bins.nonEmpty) {
      a.bins ++= b.bins
      AdaptiveHistAgg.normalize(a.bins, nBins)
    }
    a
  }

  override def eval(buf: AdaptiveHistAgg.Buf): Any =
    new GenericArrayData(buf.bins.map { b =>
      new GenericInternalRow(Array[Any](b.lo, b.hi, b.cnt, b.sum))
    }.toArray[Any])

  override def serialize(buf: AdaptiveHistAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.bins.length * 32)
    bb.putInt(buf.bins.length)
    buf.bins.foreach { b =>
      bb.putLong(b.lo); bb.putLong(b.hi); bb.putLong(b.cnt); bb.putLong(b.sum)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): AdaptiveHistAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val bins = new collection.mutable.ArrayBuffer[AdaptiveHistAgg.Bin](n)
    var i = 0
    while (i < n) {
      bins += new AdaptiveHistAgg.Bin(bb.getLong, bb.getLong, bb.getLong, bb.getLong)
      i += 1
    }
    new AdaptiveHistAgg.Buf(bins)
  }

  override def withNewMutableAggBufferOffset(o: Int): AdaptiveHistAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): AdaptiveHistAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(v = c(0))
}

object AdaptiveHistAgg {

  final class Bin(var lo: Long, var hi: Long, var cnt: Long, var sum: Long)

  final class Buf(val bins: collection.mutable.ArrayBuffer[Bin])

  /** Admit one value into a sorted-disjoint bin list, merging the
    * nearest-gap adjacent pair if the cap overflows. Shared with
    * HistogramSpec's sequential reference so the spec exercises the
    * distributed update/merge path against an independent fold. */
  private[graft] def insert(
      bins: collection.mutable.ArrayBuffer[Bin], x: Long, cap: Int): Unit = {
    // binary search: first bin with lo > x; candidate container is i-1
    var lo = 0; var hi = bins.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (bins(m).lo <= x) lo = m + 1 else hi = m
    }
    if (lo > 0 && x <= bins(lo - 1).hi) {
      val b = bins(lo - 1); b.cnt += 1; b.sum += x
    } else {
      bins.insert(lo, new Bin(x, x, 1L, x))
      if (bins.length > cap) mergeNearest(bins)
    }
  }

  /** After a partial-state concatenation: re-sort and reduce back
    * under the cap by nearest-gap merges (gap is negative for
    * overlapping cross-partial hulls, so the most-overlapping pairs
    * merge first; equal singletons sit at gap 0 and coalesce before
    * any distinct pair — the exact-regime guarantee). Merge-side
    * buffers never receive further `update` calls, so the relaxed
    * (possibly overlapping, lo-sorted) structure is safe. */
  private[graft] def normalize(
      bins: collection.mutable.ArrayBuffer[Bin], cap: Int): Unit = {
    bins.sortInPlaceBy(b => (b.lo, b.hi, b.cnt, b.sum))
    // identical-hull bins (equal singletons across partials, above all)
    // always coalesce — order-independent, and required for the exact
    // regime when the concatenation never exceeds the cap
    var w = 0
    var i = 1
    while (i < bins.length) {
      val cur = bins(i); val acc = bins(w)
      if (cur.lo == acc.lo && cur.hi == acc.hi) {
        acc.cnt += cur.cnt; acc.sum += cur.sum
      } else {
        w += 1; bins(w) = cur
      }
      i += 1
    }
    bins.takeInPlace(w + 1)
    while (bins.length > cap) mergeNearest(bins)
  }

  /** Merge the adjacent pair with the smallest inter-bin gap
    * (earliest pair on ties) — the adaptive step that trades boundary
    * precision for the bounded cap. */
  private def mergeNearest(bins: collection.mutable.ArrayBuffer[Bin]): Unit = {
    var best = 0
    var bestGap = Long.MaxValue
    var i = 0
    while (i < bins.length - 1) {
      val gap = bins(i + 1).lo - bins(i).hi
      if (gap < bestGap) { bestGap = gap; best = i }
      i += 1
    }
    val a = bins(best); val b = bins(best + 1)
    if (b.hi > a.hi) a.hi = b.hi // hulls may overlap post-merge; keep the max
    a.cnt += b.cnt; a.sum += b.sum
    bins.remove(best + 1)
  }

  /** `histogram(v, nBins)` as a Column aggregate over bigint values. */
  def histogram(v: Column, nBins: Int): Column =
    GraftBridge.column(
      AdaptiveHistAgg(GraftBridge.expression(v), nBins).toAggregateExpression())
}
