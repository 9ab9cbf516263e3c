package graft

import graft.operators.{Events, Extras}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-8 additions beyond the TPC-H pack: RFM
  * segmentation, weighted median, recursive-CTE reachability (all
  * three also oracle-paired). Fixture: sf0.001. */
class ExtrasAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("ev_rfm: quartiles balanced, segment digits = scores, all buyers present") {
    val rows = Events.rfm(spark, sf).collect()
    val nBuyers = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.length == nBuyers)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val sizes = rows.groupBy(_.getAs[Long](c)).view.mapValues(_.length)
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L, 4L)))
      // NTILE balance: bucket sizes differ by at most one.
      assert(sizes.values.max - sizes.values.min <= 1, s"$c unbalanced: $sizes")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("rfm_segment") ==
        r.getAs[Long]("r_score") * 100 + r.getAs[Long]("f_score") * 10 +
          r.getAs[Long]("m_score"))
      assert(r.getAs[Long]("recency_days") >= 0)
    }
    // Best recency quartile really is the most recent one.
    val byR = rows.groupBy(_.getAs[Long]("r_score")).view
      .mapValues(_.map(_.getAs[Long]("recency_days")))
    assert(byR(1L).max <= byR(4L).min)
  }

  test("ev_rfm_scaled: threshold scores match independent recompute; ties stay together") {
    val got = Events.rfmScaled(spark, sf).collect()
    // Independent per-user rollup in plain Scala from the raw events.
    val ev = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("cast(unix_date(to_date(ts)) as bigint)").as("d"),
        col("value").cast("decimal(38,6)").as("v")).collect()
    val per = ev.groupBy(_.getLong(0)).map { case (u, rs) =>
      (u, rs.map(_.getLong(1)).max, rs.length.toLong,
        rs.map(r => BigDecimal(r.getDecimal(2))).sum.toDouble)
    }.toSeq
    // With n_users ≤ the sketch accuracy (10000) GK stores every sample,
    // so percentile_approx is exact and partition-independent — the spec
    // precondition that makes the independent boundary recompute valid.
    assert(per.size <= 10000, "fixture outgrew the exact-sketch regime")
    import spark.implicits._
    val bounds = per.toDF("u", "last_day", "freq", "mon")
      .agg(
        percentile_approx(col("last_day"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)),
        percentile_approx(col("freq"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)),
        percentile_approx(col("mon"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)))
      .collect()(0)
    val lq = bounds.getSeq[Long](0)
    val fq = bounds.getSeq[Long](1)
    val mq = bounds.getSeq[Double](2)
    val horizon = per.map(_._2).max
    def scoreL(v: Long, q: Seq[Long]): Long =
      1L + (if (v < q(2)) 1 else 0) + (if (v < q(1)) 1 else 0) +
        (if (v < q(0)) 1 else 0)
    def scoreD(v: Double, q: Seq[Double]): Long =
      1L + (if (v < q(2)) 1 else 0) + (if (v < q(1)) 1 else 0) +
        (if (v < q(0)) 1 else 0)
    val want = per.map { case (u, lastDay, freq, mon) =>
      val r = scoreL(lastDay, lq); val f = scoreL(freq, fq)
      val m = scoreD(mon, mq)
      (u, horizon - lastDay, freq, mon, r, f, m, r * 100 + f * 10 + m)
    }.sortBy(_._1)
    val gotT = got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6),
      r.getLong(7))).toSeq
    assert(gotT == want)
    // Tie-consistency (what NTILE cannot give): equal metric ⇒ equal score.
    Seq(("frequency", "f_score"), ("monetary", "m_score"),
        ("recency_days", "r_score")).foreach { case (metric, score) =>
      got.groupBy(_.getAs[Any](metric)).foreach { case (_, rs) =>
        assert(rs.map(_.getAs[Long](score)).distinct.length == 1,
          s"tied $metric split across $score values")
      }
    }
    // Monotone: better metric never gets a worse quartile.
    def mono(pairs: Seq[(Double, Long)]): Unit =
      pairs.sortBy(_._1).sliding(2).foreach {
        case Seq(a, b) => assert(a._2 <= b._2); case _ => ()
      }
    mono(got.map(r => (r.getLong(1).toDouble, r.getLong(4))).toSeq)
    mono(got.map(r => (-r.getLong(2).toDouble, r.getLong(5))).toSeq)
    mono(got.map(r => (-r.getDouble(3), r.getLong(6))).toSeq)
    // All four quartiles are inhabited on the fixture.
    assert(got.map(_.getAs[Long]("r_score")).distinct.sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("x_weighted_median: matches plain-Scala weighted-median walk") {
    val got = Extras.weightedMedian(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_orderkey",
        "l_linenumber", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getInt(3), r.getDouble(4)))
    val want = li.groupBy(_._1).toSeq.sortBy(_._1).map { case (flag, rs) =>
      val ordered = rs.sortBy(t => (t._2, t._3, t._4))
      val total = ordered.map(_._5).sum
      var cum = 0.0
      val median = ordered.find { t => cum += t._5; cum * 2 >= total }.get._2
      (flag, median, total.toLong)
    }
    assert(got == want)
    // Defining property: weight strictly below the median < half total.
    got.foreach { case (flag, med, total) =>
      val below = li.filter(t => t._1 == flag && t._2 < med).map(_._5).sum
      assert(below * 2 < total)
    }
  }

  test("x_reachable_parts: hop-1 frontier equals the direct co-purchase set") {
    val rows = Extras.reachableParts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 0L, "seed at hop 0")
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val seedOrders = li.filter(_._2 == 1L).map(_._1).toSet
    val hop1 = li.filter(t => seedOrders.contains(t._1)).map(_._2).toSet - 1L
    assert(rows.filter(_._2 == 1L).keySet == hop1)
    val hop2Direct = {
      val h1Orders = li.filter(t => hop1.contains(t._2)).map(_._1).toSet
      li.filter(t => h1Orders.contains(t._1)).map(_._2).toSet -- hop1 - 1L
    }
    assert(rows.filter(_._2 == 2L).keySet == hop2Direct)
    assert(rows.values.forall(_ <= 2L), "depth bound respected")
  }
}
