package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface — the `Dataset[T]`/`groupByKey` companion
  * to the Catalyst-level [[MinHashAgg]]: compile-time-checked input
  * types, explicit buffer encoders, deterministic merge.
  *
  * `AvgQuantity` keeps the buffer in exact integers (quantity is
  * integer-valued in the fixture domain), so the final single division
  * is the only floating-point op — merge order cannot change the
  * result. */
object TypedAggregators {

  case class CountSum(n: Long, sum: Long)

  /** Exact average of an integer-valued measure. */
  class AvgLong[I](f: I => Long) extends Aggregator[I, CountSum, Double] {
    override def zero: CountSum = CountSum(0L, 0L)
    override def reduce(b: CountSum, x: I): CountSum =
      CountSum(b.n + 1, b.sum + f(x))
    override def merge(a: CountSum, b: CountSum): CountSum =
      CountSum(a.n + b.n, a.sum + b.sum)
    override def finish(b: CountSum): Double =
      if (b.n == 0) 0.0 else b.sum.toDouble / b.n
    override def bufferEncoder: Encoder[CountSum] = Encoders.product[CountSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
