package graft

import graft.functions.AdaptiveHistAgg
import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive histogram (`histogram(n)` analogue): the order-INDEPENDENT
  * laws the rows-only `ev_adaptive_histogram` key rests on —
  * conservation of mass (Σcnt) and total (Σsum) against a groupBy
  * recompute, lo-sorted structure with per-bin mean inside the hull,
  * output size `min(cap, distinct)` (a cross-partial merge must NOT
  * collapse the histogram below the cap), and the exact regime:
  * ≤ nBins distinct values yield the exact (value, count) table under
  * ANY partitioning. Bin boundaries above the cap are admission-order-
  * dependent by design (like ClickHouse's own `histogram` and the KLL
  * rollup) and merged hulls may overlap (forcing disjoint hulls over
  * interleaved partials provably collapses the bin count) — so
  * boundaries are deliberately NOT pinned beyond structure. */
class HistogramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaAgg(xs: Seq[Long], cap: Int, parts: Int): Seq[(Long, Long, Long, Long)] =
    xs.toDF("v").repartition(parts)
      .agg(AdaptiveHistAgg.histogram($"v", cap).as("b"))
      .select(posexplode($"b").as(Seq("i", "s")))
      .orderBy($"i")
      .select($"s.lo", $"s.hi", $"s.cnt", $"s.sum")
      .as[(Long, Long, Long, Long)].collect().toSeq

  private val skewed: Seq[Long] =
    (0 until 600).map(i => (i * i % 997).toLong * 7 - 300) ++
      Seq.fill(200)(42L) ++ (0 until 50).map(i => 100000L + i)

  test("conservation: Σcnt and Σsum equal the groupBy recompute, any partitioning") {
    for (parts <- Seq(1, 7)) {
      val bins = viaAgg(skewed, 8, parts)
      assert(bins.size == 8)
      assert(bins.map(_._3).sum == skewed.size.toLong)
      assert(bins.map(_._4).sum == skewed.sum)
    }
  }

  test("structure: lo-sorted, lo<=hi, bin mean inside [lo, hi]; 1 partition disjoint") {
    for (parts <- Seq(1, 5)) {
      val bins = viaAgg(skewed, 8, parts)
      bins.foreach { case (lo, hi, cnt, sum) =>
        assert(lo <= hi && cnt > 0)
        val mean = sum.toDouble / cnt
        assert(mean >= lo && mean <= hi, s"mean $mean outside [$lo, $hi]")
      }
      assert(bins.map(_._1) == bins.map(_._1).sorted, "lo non-decreasing")
    }
    // a single partition's stream keeps strictly disjoint hulls
    viaAgg(skewed, 8, 1).sliding(2).foreach {
      case Seq((_, hi1, _, _), (lo2, _, _, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("exact regime: <= cap distinct values give the exact (value, count) table") {
    val vals = Seq(5L, 5L, -3L, 17L, 17L, 17L, 0L, 999L, -3L, 5L)
    val want = vals.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (v, g) => (v, v, g.size.toLong, v * g.size) }
    for (parts <- Seq(1, 3, 9)) assert(viaAgg(vals, 8, parts) == want)
  }

  test("exact regime survives merge at exactly cap distinct values") {
    val vals = (1L to 8L).flatMap(v => Seq.fill(v.toInt)(v * 10))
    val want = (1L to 8L).map(v => (v * 10, v * 10, v, v * v * 10))
    assert(viaAgg(vals, 8, 6) == want)
  }

  test("ev_adaptive_histogram key: conservation against the events groupBy") {
    val got = Events.adaptiveHistogram(spark, TestSpark.Sf)
    val byType = got.groupBy($"event_type")
      .agg(sum($"n").as("n"),
        sum(round($"sum_value" * 100).cast("long")).as("cents"),
        count(lit(1)).as("bins"),
        min($"lo_value" <= $"hi_value").as("ok"))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val want = graft.sources.Tables.events(spark, TestSpark.Sf)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("long")).as("cents"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byType.keySet == want.keySet)
    byType.foreach { case (tpe, (n, cents, bins, ok)) =>
      assert(bins <= 8 && ok, s"type $tpe structure")
      assert((n, cents) == want(tpe), s"type $tpe conservation")
    }
  }
}
