package graft

import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HDR-histogram quantiles: the bucket map's exact/relative-error
  * regimes, and the commutation identity the operator's correctness
  * rests on — a monotone bucket map makes the discrete type-1 quantile
  * of bucketized values equal the bucket floor of the true quantile. */
class HdrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lb(x: Long): Long =
    if (x < 32) x
    else {
      val s = (63 - java.lang.Long.numberOfLeadingZeros(x)) - 5
      (x >> s) << s
    }

  /** Discrete type-1 quantile with the operator's integer crossing rule
    * (smallest value whose cumulative count reaches ⌈q·n⌉). */
  private def q1(sorted: Seq[Long], num: Long, den: Long): Long =
    sorted(((sorted.size * num + den - 1) / den - 1).toInt)

  test("bucket map: exact below 64, top-6-bit floor above, monotone") {
    for (x <- 0L until 64L) assert(lb(x) == x)
    assert(lb(64) == 64 && lb(65) == 64 && lb(127) == 126 && lb(128) == 128)
    for (x <- Seq(100L, 1000L, 29999L, 30000L, 123456789L)) {
      assert(lb(x) <= x && (x - lb(x)) * 32 <= x, s"rel err at $x")
    }
    val xs = (0L to 5000L) ++ Seq(1L << 40, (1L << 40) + 12345)
    assert(xs.map(lb) == xs.map(lb).sorted, "monotone")
  }

  test("reported quantiles are the bucket floor of the true gap quantiles") {
    val got = Events.hdrQuantiles(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    val gaps = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).values.flatMap { evs =>
        evs.sortBy(e => (e._4, e._2)).toSeq.sliding(2).collect {
          case Seq(a, b) => (b._3, (b._4 - a._4) / 1000L)
        }
      }.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case (tpe, (_, n, p50, p90, p99, p999, mx)) =>
      val s = gaps(tpe)
      assert(n == s.size.toLong)
      assert(mx == s.last, s"$tpe max")
      // commutation: reported pK == lb(true type-1 pK)
      assert(p50 == lb(q1(s, 50, 100)), s"$tpe p50")
      assert(p90 == lb(q1(s, 90, 100)), s"$tpe p90")
      assert(p99 == lb(q1(s, 99, 100)), s"$tpe p99")
      assert(p999 == lb(q1(s, 999, 1000)), s"$tpe p999")
      // relative-error band against the true quantile
      Seq((p50, q1(s, 50, 100)), (p99, q1(s, 99, 100))).foreach {
        case (rep, ex) => assert(rep <= ex && (ex - rep) * 32 <= ex)
      }
    }
  }
}
