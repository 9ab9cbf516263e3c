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

  test("snapshot diff: classes partition keyspace, deltas conserve revenue") {
    import org.apache.spark.sql.types.DecimalType
    val rows = Analytics.snapshotDiff(spark, sf).collect()
      .map(r => r.getAs[String]("change_type") ->
        (r.getAs[Long]("n_keys"), r.getAs[Double]("revenue_delta"))).toMap
    def snap(lo: Int, hi: Int) = Tables.orders(spark, sf)
      .filter(expr(s"year(o_orderdate) between $lo and $hi"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(38, 6))).as("rev"))
    val a = snap(1995, 1997).select(col("o_custkey"), col("rev").as("rev_a"))
    val b = snap(1996, 1998).select(col("o_custkey"), col("rev").as("rev_b"))
    val nKeys = a.join(b, Seq("o_custkey"), "full_outer").count()
    assert(rows.values.map(_._1).sum == nKeys,
      "added+removed+changed+unchanged covers every snapshot key exactly once")
    val totA = a.agg(sum("rev_a")).collect()(0).getDecimal(0).doubleValue()
    val totB = b.agg(sum("rev_b")).collect()(0).getDecimal(0).doubleValue()
    val deltaSum = rows.values.map(_._2).sum
    assert(math.abs(deltaSum - (totB - totA)) < 1e-6 * math.abs(totB),
      "per-class deltas sum to the total revenue movement")
    rows.get("unchanged").foreach { case (_, d) =>
      assert(d == 0.0, "unchanged class carries zero delta") }
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
