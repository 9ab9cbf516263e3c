package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WEIGHTED heavy hitters (ClickHouse `topKWeighted`) as a bounded-
  * state Misra-Gries summary: at most `m` (item, count) counters per
  * group REGARDLESS of item cardinality. Update inserts the item's
  * weight and, when a new item would make counter m+1, subtracts the
  * minimum count from every counter and drops the zeros (the weighted
  * MG step); merge sums counterparts and applies one (m+1)-th-largest
  * subtraction (the Agarwal et al. mergeable-summaries rule), so
  * partials combine map-side like any built-in aggregate.
  *
  * Guarantees (W = total weight): estimates never overcount
  * (est ≤ true), undercount is bounded by W/(m+1), and every item with
  * true weight > W/(m+1) is retained — the classic frequent-items
  * contract, here under arbitrary long weights. While distinct items
  * ≤ m NOTHING is ever subtracted anywhere, estimates are EXACT, and
  * a query over a bounded item domain oracle-pairs against plain
  * SUM(weight) GROUP BY (the uniqUpTo exact-below-cap policy); above
  * the cap the same plan degrades to the ε-approximate summary with no
  * shape change. At 100 TB that is the point: "top sources by token
  * count" over a billion-key domain costs m counters per task, not a
  * key-partitioned shuffle of the corpus.
  *
  * Output: array<struct<item string, est bigint>> sorted
  * (est desc, item asc), truncated to `k`. Null items/weights are
  * ignored; weights must be nonnegative.
  */
case class MisraGriesAgg(
    item: Expression,
    weight: Expression,
    m: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buf] {

  require(m >= 1 && k >= 1, "graft_topk_weighted needs m >= 1, k >= 1")

  override def children: Seq[Expression] = Seq(item, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk_weighted"

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType && weight.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_weighted expects (string item, bigint weight), got " +
        s"(${item.dataType}, ${weight.dataType})")

  override def createAggregationBuffer(): MisraGriesAgg.Buf =
    new MisraGriesAgg.Buf(collection.mutable.HashMap.empty)

  override def update(buf: MisraGriesAgg.Buf, input: InternalRow): MisraGriesAgg.Buf = {
    val iv = item.eval(input)
    val wv = weight.eval(input)
    if (iv != null && wv != null) {
      val w = wv.asInstanceOf[Long]
      require(w >= 0, "graft_topk_weighted: negative weight")
      if (w > 0) buf.add(iv.asInstanceOf[UTF8String].toString, w, m)
    }
    buf
  }

  override def merge(a: MisraGriesAgg.Buf, b: MisraGriesAgg.Buf): MisraGriesAgg.Buf = {
    b.counts.foreach { case (i, c) =>
      a.counts.updateWith(i) {
        case Some(x) => Some(x + c)
        case None => Some(c)
      }
    }
    if (a.counts.size > m) {
      // subtract the (m+1)-th largest count, drop non-positives
      val sorted = a.counts.values.toArray
      java.util.Arrays.sort(sorted)
      val delta = sorted(sorted.length - (m + 1))
      a.counts.filterInPlace((_, c) => c - delta > 0)
        .mapValuesInPlace((_, c) => c - delta)
    }
    a
  }

  override def eval(buf: MisraGriesAgg.Buf): Any = {
    val top = buf.counts.toSeq
      .sortBy { case (i, c) => (-c, i) }
      .take(k)
      .map { case (i, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(i), c))
      }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: MisraGriesAgg.Buf): Array[Byte] = {
    val entries = buf.counts.toSeq.map { case (i, c) =>
      (i.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(
      4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.size)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val map = collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      map.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    new MisraGriesAgg.Buf(map)
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(item = c(0), weight = c(1))
}

object MisraGriesAgg {

  final class Buf(val counts: collection.mutable.HashMap[String, Long]) {
    /** Weighted MG update: insert, then if over capacity subtract the
      * minimum count from every counter and drop the zeros (at least
      * the minimum itself drops, so size returns to ≤ m). */
    def add(item: String, w: Long, m: Int): Unit = {
      counts.updateWith(item) {
        case Some(c) => Some(c + w)
        case None => Some(w)
      }
      if (counts.size > m) {
        val delta = counts.values.min
        counts.filterInPlace((_, c) => c - delta > 0)
          .mapValuesInPlace((_, c) => c - delta)
      }
    }
  }

  /** `topk_weighted(item, weight, m, k)` as a Column aggregate. */
  def topKWeighted(item: Column, weight: Column, m: Int, k: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(item),
        GraftBridge.expression(weight), m, k)
        .toAggregateExpression())
}
