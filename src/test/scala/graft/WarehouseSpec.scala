package graft

import graft.operators.Warehouse
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the warehouse-lifecycle pack (all queries are also
  * oracle-paired; these pin the semantic properties the hash gate
  * can't see — interval algebra, conservation laws, blocking
  * soundness). Fixture: sf0.001. */
class WarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("scd2: segments partition each customer's history, intervals chain") {
    val seg = Warehouse.scd2Dim(spark, sf).collect()
    val nOrders = Tables.orders(spark, sf).count()
    assert(seg.map(_.getAs[Long]("n_orders")).sum == nOrders,
      "every order lands in exactly one validity segment")
    // exactly one open (NULL valid_to) segment per customer, and closed
    // intervals are well-formed and chained in order
    seg.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rows) =>
      assert(rows.count(_.isNullAt(rows.head.fieldIndex("valid_to"))) == 1)
      val ordered = rows.sortBy(_.getAs[Long]("valid_from"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val aTo = a.getAs[Long]("valid_to")
          assert(a.getAs[Long]("valid_from") <= aTo)
          assert(aTo == b.getAs[Long]("valid_from"),
            "consecutive segments share a boundary (no gaps, no overlap)")
        case _ => ()
      }
    }
  }

  test("referential tests: the fixture schema proves clean") {
    val r = Warehouse.referentialTests(spark, sf).collect()
    assert(r.length == 10)
    assert(r.forall(_.getAs[Long]("n_violations") == 0L))
  }

  test("trailing distinct: wau7 bounds (>= dau, <= 7-day dau sum, monotone window)") {
    val rows = Warehouse.trailingDistinct(spark, sf).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("wau7"), r.getAs[Long]("dau")))
    val dauByDay = rows.map(r => r._1 -> r._3).toMap
    rows.foreach { case (day, wau7, dau) =>
      assert(wau7 >= dau, s"day $day: union of 7 days >= its own day")
      val window = (day - 6 to day).flatMap(dauByDay.get)
      assert(wau7 <= window.sum, s"day $day: distinct union <= sum of parts")
    }
    assert(rows.minBy(_._1)._2 == rows.minBy(_._1)._3,
      "first day has no history: wau7 == dau")
  }

  test("attribution: purchase conservation, last touch never 'purchase'") {
    val rows = Warehouse.attribution(spark, sf).collect()
    val totalPurchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == totalPurchases)
    assert(rows.forall(_.getAs[String]("last_touch") != "purchase"))
  }

  test("zscore: per-type z sums to ~0, outlier flag consistent") {
    val rows = Warehouse.dailyZscore(spark, sf).collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val sz = rs.map(_.getAs[Double]("z")).sum
      // numerators sum to exactly 0 in integer arithmetic; the double
      // division leaves only rounding dust
      assert(math.abs(sz) < 1e-9, s"$t: sum of z = $sz")
    }
    rows.foreach { r =>
      assert((math.abs(r.getAs[Double]("z")) >= 2.0) ==
        (r.getAs[Long]("is_outlier") == 1L))
    }
  }

  test("MAD scores: medians recompute exactly, flags consistent, robust to spikes") {
    val rows = Warehouse.dailyMad(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      // recompute both medians in plain Scala (interpolated, like
      // percentile/quantile_cont) from the emitted daily counts
      def medianOf(xs: Seq[Double]): Double = {
        val s = xs.sorted
        val h = (s.length - 1) * 0.5
        val lo = s(h.toInt); val hi = s(math.ceil(h).toInt)
        lo + (hi - lo) * (h - h.toInt)
      }
      val ns = rs.map(_.getAs[Long]("n").toDouble).toSeq
      val med = medianOf(ns)
      val mad = medianOf(ns.map(x => math.abs(x - med)))
      rs.foreach { r =>
        assert(r.getAs[Double]("med") == med, s"$t median")
        assert(r.getAs[Double]("mad") == mad, s"$t mad")
        val z = r.getAs[Double]("robust_z")
        if (mad == 0.0) assert(r.isNullAt(r.fieldIndex("robust_z")))
        else assert((math.abs(z) >= 3.0) == (r.getAs[Long]("is_outlier") == 1L))
      }
    }
    // both anomaly views score the same (type, day, n) grid
    import spark.implicits._
    val zGrid = Warehouse.dailyZscore(spark, sf).select("event_type", "day", "n")
      .as[(String, Long, Long)].collect().toSet
    val mGrid = rows.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("day"), r.getAs[Long]("n"))).toSet
    assert(zGrid == mGrid)
  }

  test("paths: user conservation, at most 8 segments, known alphabet") {
    val rows = Warehouse.pathStrings(spark, sf).collect()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { r =>
      val segs = r.getAs[String]("path").split(">")
      assert(segs.length <= 8 && segs.forall(types.contains))
    }
  }

  test("name ER: pairs stay inside blocks, distances in band, support counts real") {
    val rows = Warehouse.nameEr(spark, sf).collect()
    assert(rows.nonEmpty, "the fixture vocab has near-identical names")
    val support = Tables.part(spark, sf).groupBy(col("p_name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(a < b, "canonical pair order")
      assert(a.split(" ").last == b.split(" ").last, "blocking key respected")
      val d = r.getAs[Long]("dist")
      assert(d >= 1 && d <= 3)
      assert(support(a) == r.getAs[Long]("n_parts_a"))
      assert(support(b) == r.getAs[Long]("n_parts_b"))
    }
  }

  test("approx topK: exact while NDV fits the sketch budget") {
    val got = Warehouse.approxTopK(spark, sf).collect()
      .map(r => r.getAs[String]("item") -> r.getAs[Long]("est")).toMap
    val exact = Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, "5 distinct values << 10^4 tracked items => exact")
  }
}
