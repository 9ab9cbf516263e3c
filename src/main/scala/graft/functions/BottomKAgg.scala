package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-k sketch as a bounded-state imperative aggregate: the k
  * payloads with the SMALLEST (key, payload) pairs per group, returned
  * as an array of payloads in ascending (key, payload) order. This is
  * the distributed answer to "take a deterministic sample / the k best
  * rows per group" that does NOT sort the group: per-group state is k
  * pairs REGARDLESS of group cardinality, partials combine map-side
  * (sorted-merge capped at k — associative + commutative), and the
  * group's rows never co-locate anywhere. The window-function
  * formulation (`row_number() ≤ k`, which the DuckDB oracle uses)
  * shuffles and SORTS every group in full — the classic 100 TB skew
  * trap when one stratum dominates the corpus; the sketch replaces it
  * with one ordinary partial-aggregate pass.
  *
  * Exact-duplicate (key, payload) pairs count once — the intended
  * set-sample semantics for the priority-sampling use (keys there are a
  * bijective hash of the payload, so duplicates cannot arise from
  * distinct rows). Null keys/payloads are ignored.
  */
case class BottomKAgg(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKAgg.Buf] {

  require(k >= 1, "bottom_k needs k >= 1")

  override def children: Seq[Expression] = Seq(key, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bottom_k"

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType && payload.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bottom_k expects bigint (key, payload), got " +
        s"(${key.dataType}, ${payload.dataType})")

  override def createAggregationBuffer(): BottomKAgg.Buf =
    new BottomKAgg.Buf(new Array[Long](k), new Array[Long](k), 0)

  override def update(buf: BottomKAgg.Buf, input: InternalRow): BottomKAgg.Buf = {
    val kv = key.eval(input)
    val pv = payload.eval(input)
    if (kv != null && pv != null)
      buf.insert(kv.asInstanceOf[Long], pv.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: BottomKAgg.Buf, b: BottomKAgg.Buf): BottomKAgg.Buf = {
    var i = 0
    while (i < b.n) { a.insert(b.keys(i), b.ids(i), k); i += 1 }
    a
  }

  override def eval(buf: BottomKAgg.Buf): Any =
    new GenericArrayData(java.util.Arrays.copyOfRange(buf.ids, 0, buf.n))

  override def serialize(buf: BottomKAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.keys(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val keys = new Array[Long](k)
    val ids = new Array[Long](k)
    var i = 0
    while (i < n) { keys(i) = bb.getLong; ids(i) = bb.getLong; i += 1 }
    new BottomKAgg.Buf(keys, ids, n)
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(key = c(0), payload = c(1))
}

object BottomKAgg {

  /** Parallel arrays sorted by (key, id), first `n` slots used, n ≤ k. */
  final class Buf(val keys: Array[Long], val ids: Array[Long], var n: Int) {
    /** Insert keeping (key, id) order; no-op on exact duplicates or
      * when (key, id) is not below the current k-th pair. O(log k)
      * compare + O(k) move on k longs. */
    def insert(key: Long, id: Long, k: Int): Unit = {
      if (n == k && (key > keys(n - 1) || (key == keys(n - 1) && id >= ids(n - 1))))
        return
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (keys(mid) < key || (keys(mid) == key && ids(mid) < id)) lo = mid + 1
        else hi = mid
      }
      if (lo < n && keys(lo) == key && ids(lo) == id) return
      val last = if (n == k) n - 1 else n
      System.arraycopy(keys, lo, keys, lo + 1, last - lo)
      System.arraycopy(ids, lo, ids, lo + 1, last - lo)
      keys(lo) = key
      ids(lo) = id
      if (n < k) n += 1
    }
  }

  /** `bottom_k(key, payload, k)` as a Column aggregate: payloads of the
    * k smallest (key, payload) pairs, ascending. */
  def bottomK(key: Column, payload: Column, k: Int): Column =
    GraftBridge.column(
      BottomKAgg(GraftBridge.expression(key), GraftBridge.expression(payload), k)
        .toAggregateExpression())
}
