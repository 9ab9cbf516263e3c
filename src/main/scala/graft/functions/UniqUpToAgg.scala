package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** ClickHouse `uniqUpTo(N)` as a bounded-state imperative aggregate:
  * exact distinct count while it is ≤ N, the sentinel N+1 as soon as it
  * exceeds N. The buffer is a sorted primitive `Array[Long]` of AT MOST
  * N+1 distinct values — once full it stops absorbing, because any
  * state with N+1 distinct values already proves the answer — so
  * per-group state is O(N) REGARDLESS of group cardinality. That bound
  * is the whole point of the operator at 100 TB: "does any key exceed N
  * distinct users" costs N longs per key, where exact countDistinct
  * expands every group to its full distinct set before collapsing.
  * Mergeable (sorted-merge capped at N+1, associative + commutative),
  * so partial aggregation works map-side like any built-in.
  *
  * Inputs are exact long keys, not hashes — `uniqUpTo` is exact by
  * definition below its cap (the approximate tier is `ev_hll_daily` /
  * `approx_count_distinct`). Nulls are ignored, matching COUNT(DISTINCT)
  * and the ClickHouse function.
  */
case class UniqUpToAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UniqUpToAgg.Buf] {

  require(cap >= 1, "uniq_up_to cap must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_uniq_up_to"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_uniq_up_to expects a bigint key, got ${child.dataType}")

  override def createAggregationBuffer(): UniqUpToAgg.Buf =
    new UniqUpToAgg.Buf(new Array[Long](cap + 1), 0)

  override def update(buf: UniqUpToAgg.Buf, input: InternalRow): UniqUpToAgg.Buf = {
    if (buf.n <= cap) {
      val v = child.eval(input)
      if (v != null) buf.insert(v.asInstanceOf[Long], cap)
    }
    buf
  }

  override def merge(a: UniqUpToAgg.Buf, b: UniqUpToAgg.Buf): UniqUpToAgg.Buf = {
    var i = 0
    while (i < b.n && a.n <= cap) { a.insert(b.vals(i), cap); i += 1 }
    a
  }

  override def eval(buf: UniqUpToAgg.Buf): Any = buf.n.toLong

  override def serialize(buf: UniqUpToAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): UniqUpToAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val vals = new Array[Long](cap + 1)
    var i = 0
    while (i < n) { vals(i) = bb.getLong; i += 1 }
    new UniqUpToAgg.Buf(vals, n)
  }

  override def withNewMutableAggBufferOffset(o: Int): UniqUpToAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): UniqUpToAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object UniqUpToAgg {

  /** Sorted distinct values (first `n` slots used). `n` may reach
    * `cap + 1`, the saturated sentinel state — insertions stop there. */
  final class Buf(val vals: Array[Long], var n: Int) {
    /** Insert keeping sorted order; no-op on duplicates or once
      * saturated past the cap. Binary search + shift: update cost is
      * O(log cap) compare + O(cap) move worst case, on ≤ cap+1 longs. */
    def insert(v: Long, cap: Int): Unit = {
      if (n > cap) return
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (vals(mid) < v) lo = mid + 1 else hi = mid
      }
      if (lo < n && vals(lo) == v) return
      System.arraycopy(vals, lo, vals, lo + 1, n - lo)
      vals(lo) = v
      n += 1
    }
  }

  /** `uniq_up_to(key)` as a Column aggregate: exact distinct count up
    * to `cap`, `cap + 1` beyond it. */
  def uniqUpTo(c: Column, cap: Int): Column =
    GraftBridge.column(UniqUpToAgg(GraftBridge.expression(c), cap)
      .toAggregateExpression())
}
