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
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Largest-Triangle-Three-Buckets downsampling as an imperative
  * aggregate — the Spark analogue of ClickHouse's
  * `largestTriangleThreeBuckets(n)(t, y)` (itself Steinarsson 2013,
  * the canonical time-series visual downsampler). Per group the
  * aggregate buffers the series' (t, y) points, and at eval time sorts
  * by (t, y) and runs the sequential LTTB selection: first and last
  * points are always kept, the interior splits into `nOut - 2`
  * equal-count buckets, and each bucket keeps the point forming the
  * largest triangle with the PREVIOUSLY selected point and the NEXT
  * bucket's centroid (the last bucket uses the final point). Ties on
  * area keep the earliest point, so the result is a pure function of
  * the (t, y) multiset — partitioning-independent, which is what the
  * sequential-parity spec pins.
  *
  * State is the whole series, like ClickHouse's own implementation —
  * LTTB's bucket boundaries and centroids need global count and order,
  * so no bounded sketch computes it exactly. The contract is therefore
  * "series per group fits in memory": the intended grouping is a
  * (metric, grain) pair whose cardinality is calendar-bounded (e.g.
  * ≤ a few thousand daily points per type), NOT per-user raw events.
  * At 100 TB the group count scales freely (aggregate is hash-keyed,
  * partials merge by concatenation) while each group's series stays
  * small — the same boundedness argument as `sumMap`'s type-keyed fold.
  */
case class LttbAgg(
    t: Expression,
    y: Expression,
    nOut: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LttbAgg.Buf] {

  require(nOut >= 3, "lttb needs nOut >= 3 (first + last + >=1 bucket)")

  override def children: Seq[Expression] = Seq(t, y)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("t", LongType, nullable = false),
      StructField("y", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_lttb"

  override def checkInputDataTypes(): TypeCheckResult =
    if (t.dataType == LongType && y.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lttb expects (bigint t, double y), got " +
        s"(${t.dataType}, ${y.dataType})")

  override def createAggregationBuffer(): LttbAgg.Buf =
    new LttbAgg.Buf(collection.mutable.ArrayBuffer.empty)

  override def update(buf: LttbAgg.Buf, input: InternalRow): LttbAgg.Buf = {
    val tv = t.eval(input)
    val yv = y.eval(input)
    if (tv != null && yv != null)
      buf.pts += ((tv.asInstanceOf[Long], yv.asInstanceOf[Double]))
    buf
  }

  override def merge(a: LttbAgg.Buf, b: LttbAgg.Buf): LttbAgg.Buf = {
    a.pts ++= b.pts
    a
  }

  override def eval(buf: LttbAgg.Buf): Any = {
    val pts = buf.pts.toArray.sortBy(identity)
    val sel = LttbAgg.select(pts, nOut)
    new GenericArrayData(sel.map { case (tt, yy) =>
      new GenericInternalRow(Array[Any](tt, yy))
    }.toArray[Any])
  }

  override def serialize(buf: LttbAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.pts.length * 16)
    bb.putInt(buf.pts.length)
    buf.pts.foreach { case (tt, yy) => bb.putLong(tt); bb.putDouble(yy) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LttbAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val pts = new collection.mutable.ArrayBuffer[(Long, Double)](n)
    var i = 0
    while (i < n) { pts += ((bb.getLong, bb.getDouble)); i += 1 }
    new LttbAgg.Buf(pts)
  }

  override def withNewMutableAggBufferOffset(o: Int): LttbAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LttbAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(t = c(0), y = c(1))
}

object LttbAgg {

  final class Buf(val pts: collection.mutable.ArrayBuffer[(Long, Double)])

  /** The sequential LTTB selection over a (t, y)-sorted series; shared
    * by the aggregate's eval and the spec's independent reference so
    * the PARITY test exercises the distributed buffering/merge path
    * against a collect-and-run path, not one body against itself.
    * Bucket boundaries follow Steinarsson's equal-split: interior
    * point i (0-based over n-2 points) falls in bucket
    * `i * (nOut-2) / (n-2)` (integer division) — every bucket is
    * non-empty when n > nOut. */
  def select(pts: Array[(Long, Double)], nOut: Int): Seq[(Long, Double)] = {
    val n = pts.length
    if (n <= nOut) return pts.toSeq
    val buckets = nOut - 2
    // interior [1, n-1) split into `buckets` ranges of near-equal count
    def lo(b: Int): Int = 1 + ((n - 2).toLong * b / buckets).toInt
    def hi(b: Int): Int = 1 + ((n - 2).toLong * (b + 1) / buckets).toInt // exclusive
    val out = collection.mutable.ArrayBuffer.empty[(Long, Double)]
    out += pts(0)
    var prev = pts(0)
    var b = 0
    while (b < buckets) {
      // centroid of the NEXT bucket (or the final point for the last)
      val (cx, cy) =
        if (b + 1 < buckets) {
          var sx = 0.0; var sy = 0.0; var i = lo(b + 1)
          val e = hi(b + 1)
          while (i < e) { sx += pts(i)._1.toDouble; sy += pts(i)._2; i += 1 }
          val m = (e - lo(b + 1)).toDouble
          (sx / m, sy / m)
        } else (pts(n - 1)._1.toDouble, pts(n - 1)._2)
      var best = lo(b)
      var bestArea = -1.0
      var i = lo(b)
      val e = hi(b)
      while (i < e) {
        val area = math.abs(
          (prev._1.toDouble - cx) * (pts(i)._2 - prev._2) -
            (prev._1.toDouble - pts(i)._1.toDouble) * (cy - prev._2))
        if (area > bestArea) { bestArea = area; best = i } // strict > keeps earliest tie
        i += 1
      }
      out += pts(best)
      prev = pts(best)
      b += 1
    }
    out += pts(n - 1)
    out.toSeq
  }

  /** `lttb(t, y, nOut)` as a Column aggregate. */
  def lttb(t: Column, y: Column, nOut: Int): Column =
    GraftBridge.column(
      LttbAgg(GraftBridge.expression(t), GraftBridge.expression(y), nOut)
        .toAggregateExpression())
}
