package graft

import graft.operators.Analytics
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-6 analytics pack (all four queries
  * are also oracle-paired; these pin the properties a value-hash can't
  * express). Fixture: sf0.001. */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("LOCF: full grid, carried values equal most recent observation") {
    val rows = Analytics.gapFillLocf(spark, sf).collect()
    val prios = rows.map(_.getAs[String]("priority")).distinct
    val days = rows.map(_.getAs[Long]("day"))
    assert(rows.length == prios.length * (days.max - days.min + 1).toInt,
      "every (priority, calendar-day) cell present")
    rows.groupBy(_.getAs[String]("priority")).foreach { case (_, rs) =>
      var lastObserved: Option[Double] = None
      rs.sortBy(_.getAs[Long]("day")).foreach { r =>
        val locfIdx = r.fieldIndex("avg_price_locf")
        if (r.getAs[Long]("is_observed") == 1L)
          lastObserved = Some(r.getAs[Double]("avg_price_locf"))
        else if (lastObserved.isEmpty)
          assert(r.isNullAt(locfIdx), "no fabrication before first observation")
        else
          assert(r.getAs[Double]("avg_price_locf") == lastObserved.get,
            "gap carries the most recent observed value unchanged")
      }
    }
  }

  test("percent_rank/cume_dist: endpoints and monotonicity within nation") {
    val rows = Analytics.percentRankSuppliers(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("s_nationkey")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r =>
        (r.getAs[Double]("s_acctbal"), r.getAs[Long]("s_suppkey")))
      val prs = ordered.map(_.getAs[Double]("pr"))
      val cds = ordered.map(_.getAs[Double]("cd"))
      assert(prs.head == 0.0)
      if (rs.length > 1) assert(prs.last == 1.0)
      assert(cds.last == 1.0)
      assert(prs.sameElements(prs.sorted) && cds.sameElements(cds.sorted),
        "both ranks non-decreasing in window order")
      assert(cds.forall(c => c > 0.0 && c <= 1.0))
    }
  }

  test("keywords: per-doc top-3, scores ordered, terms from the doc") {
    val rows = Analytics.docKeywords(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getAs[Long]("rnk"))
      val scores = byRank.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      byRank.foreach(r => assert(texts(id).contains(r.getAs[String]("term")),
        "keyword actually occurs in the document"))
    }
  }

  test("heatmap: count conservation, valid cell coordinates, shares sum to 1") {
    val rows = Analytics.hourHeatmap(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val d = r.getAs[Long]("isodow"); val h = r.getAs[Long]("hour")
      assert(d >= 1 && d <= 7 && h >= 0 && h <= 23)
    }
  }
}
