package graft

import graft.functions.FixedLog2
import graft.operators.{Events, Stats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fixed-point shift-and-square log2 device and its two consumers:
  * accuracy of L2 against libm on a wide value sweep, and independent
  * Scala recomputes of the entropy / Theil's U integer cores. */
class FixedLog2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def l2(a: Long): Long = FixedLog2.l2Long(a)

  test("L2 is within 2^-20 + 2^-40 of true log2 across magnitudes") {
    val vals = Seq(1L, 2L, 3L, 5L, 7L, 10L, 63L, 64L, 65L, 999L,
      1000000L, 999999937L, 6000000000L, (1L << 40) - 1, (1L << 40) + 1) ++
      (1 to 50).map(i => math.abs(new scala.util.Random(i).nextLong()) % (1L << 45) + 1)
    val got = FixedLog2.withLog2(vals.toDF("a"), "a", "l")
      .select("a", "l").as[(Long, Long)].collect().toMap
    vals.foreach { a =>
      val fixed = got(a).toDouble / FixedLog2.Unit
      val truth = math.log(a.toDouble) / math.log(2.0)
      assert(math.abs(fixed - truth) <= math.pow(2, -20) + math.pow(2, -39),
        s"a=$a fixed=$fixed true=$truth")
      assert(got(a) == l2(a), s"SQL vs Scala twin diverge at a=$a")
    }
  }

  test("L2 domain [1, 2^61) is guarded loudly at both cores and the edges agree") {
    val top = FixedLog2.MaxInputExclusive - 1 // 2^61 - 1, largest legal input
    assert(FixedLog2.l2Long(top) == FixedLog2.l2LongFast(top))
    assert(FixedLog2.l2Long(1L) == 0L && FixedLog2.l2LongFast(1L) == 0L)
    // out-of-domain: a negative shift count would wrap mod 64 on the
    // JVM (a << -1 == a << 63) and silently diverge from DuckDB —
    // both cores must refuse instead of returning garbage
    Seq(0L, -1L, -(1L << 20), FixedLog2.MaxInputExclusive, Long.MaxValue)
      .foreach { a =>
        intercept[IllegalArgumentException](FixedLog2.l2Long(a))
        intercept[ArithmeticException](FixedLog2.l2LongFast(a))
      }
    // the registered SQL expression routes through the guarded core
    val err = intercept[Exception] {
      FixedLog2.withLog2(Seq(0L).toDF("a"), "a", "l").collect()
    }
    assert(err.getMessage != null)
  }

  test("entropy matches an independent integer-core recompute and libm") {
    val rows = Stats.entropy(spark, TestSpark.Sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val cells = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type", "k").count()
      .as[(String, Option[Long], Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    rows.foreach { case (t, n, nv, h) =>
      val cs = cells(t)
      assert(n == cs.sum && nv == cs.size.toLong)
      val sh = cs.map(c => BigInt(c) * (l2(n) - l2(c))).sum
      assert(h == sh.toLong.toDouble / (n * FixedLog2.Unit).toDouble, s"type $t")
      val libm = cs.map { c =>
        val p = c.toDouble / n; -p * math.log(p) / math.log(2.0)
      }.sum
      assert(math.abs(h - libm) < 1e-4, s"type $t vs libm")
    }
  }

  test("theils U: integer-core recompute, bounds, and the MI identity") {
    val Seq((n, hType, hWd, mi, u, uRev)) =
      Stats.theilsU(spark, TestSpark.Sf)
        .as[(Long, Double, Double, Double, Option[Double], Option[Double])]
        .collect().toSeq
    val grid = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000 % 7").as("wd"))
      .groupBy("event_type", "wd").count()
      .as[(String, Long, Long)].collect()
    val nn = grid.map(_._3).sum
    assert(n == nn)
    val r = grid.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val c = grid.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val sI = grid.map { case (t, w, o) =>
      BigInt(o) * (l2(o) + l2(nn) - l2(r(t)) - l2(c(w))) }.sum
    val sHx = r.values.map(v => BigInt(v) * (l2(nn) - l2(v))).sum
    val sHy = c.values.map(v => BigInt(v) * (l2(nn) - l2(v))).sum
    val den = (nn * FixedLog2.Unit).toDouble
    assert(hType == sHx.toLong.toDouble / den)
    assert(hWd == sHy.toLong.toDouble / den)
    assert(mi == sI.toLong.toDouble / den)
    assert(u.contains(sI.toLong.toDouble / sHx.toLong.toDouble))
    assert(uRev.contains(sI.toLong.toDouble / sHy.toLong.toDouble))
    // normalized MI is a fraction of either marginal entropy
    assert(u.get >= -1e-9 && u.get <= 1.0 + 1e-9)
    assert(uRev.get >= -1e-9 && uRev.get <= 1.0 + 1e-9)
    // U(X|Y)·H(X) == U(Y|X)·H(Y) == I
    assert(math.abs(u.get * hType - mi) < 1e-9)
    assert(math.abs(uRev.get * hWd - mi) < 1e-9)
  }

  test("JS divergence: libm recompute, [0,1] bounds, symmetry, self-zero") {
    val ev = graft.sources.Tables.events(spark, TestSpark.Sf)
    val got = Stats.jsDivergence(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got.nonEmpty)
    val cells = ev.filter(col("event_type").isin("view", "purchase"))
      .select(expr("unix_micros(ts) div 86400000000 % 7").as("wd"),
        round(col("value") * lit(100)).cast("long").as("c"),
        (col("event_type") === "purchase").as("is_p"))
      .as[(Long, Long, Boolean)].collect()
      .groupBy(_._1).view.mapValues { rs =>
        val byC = rs.groupBy(_._2).view.mapValues { vs =>
          (vs.count(_._3).toLong, vs.count(!_._3).toLong) }.toMap
        byC
      }.toMap
    got.foreach { case (wd, n1, n2, jsd) =>
      val m = cells(wd)
      assert(n1 == m.values.map(_._1).sum && n2 == m.values.map(_._2).sum)
      val ln2 = math.log(2.0)
      val libm = m.values.map { case (a, b) =>
        val p = a.toDouble / n1; val q = b.toDouble / n2
        val mid = (p + q) / 2.0
        (if (a > 0) p * math.log(p / mid) / ln2 else 0.0) / 2.0 +
          (if (b > 0) q * math.log(q / mid) / ln2 else 0.0) / 2.0
      }.sum
      assert(jsd.isDefined && math.abs(jsd.get - libm) < 1e-4,
        s"wd $wd: ${jsd.get} vs libm $libm")
      // 1 bit is attainable on disjoint supports; L2 truncation can
      // overshoot by ~4 units of 2^-20 per term
      assert(jsd.get >= -1e-9 && jsd.get <= 1.0 + 1e-5)
    }
    // symmetry: swapping the arms leaves JSD unchanged
    val swapped = ev.withColumn("event_type",
      when(col("event_type") === "purchase", "view")
        .when(col("event_type") === "view", "purchase")
        .otherwise(col("event_type")))
    val sw = Stats.jsDivergenceOf(swapped)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(sw.map(r => (r._1, r._4)) == got.map(r => (r._1, r._4)))
    assert(sw.map(r => (r._2, r._3)) == got.map(r => (r._3, r._2)))
    // identical arms: relabel every view as a purchase duplicate set
    val views = ev.filter(col("event_type") === "view")
    val selfEv = views.union(
      views.withColumn("event_type", lit("purchase")))
    Stats.jsDivergenceOf(selfEv)
      .as[(Long, Long, Long, Option[Double])].collect().foreach { r =>
        assert(r._2 == r._3)
        assert(math.abs(r._4.getOrElse(1.0)) < 1e-5, s"self-JSD wd ${r._1}")
      }
  }

  test("KL divergence: libm recompute, Gibbs non-negativity, swap law") {
    val ev = graft.sources.Tables.events(spark, TestSpark.Sf)
    val got = Stats.klDivergence(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq.sortBy(_._1)
    assert(got.nonEmpty)
    val cells = ev.filter(col("event_type").isin("view", "purchase"))
      .select(expr("unix_micros(ts) div 86400000000 % 7").as("wd"),
        round(col("value") * lit(100)).cast("long").as("c"),
        (col("event_type") === "purchase").as("is_p"))
      .as[(Long, Long, Boolean)].collect()
      .groupBy(_._1).view.mapValues { rs =>
        rs.groupBy(_._2).view.mapValues { vs =>
          (vs.count(_._3).toLong, vs.count(!_._3).toLong) }.toMap
      }.toMap
    val ln2 = math.log(2.0)
    got.foreach { case (wd, n1, n2, v, kl, klRev) =>
      val m = cells(wd)
      assert(n1 == m.values.map(_._1).sum && n2 == m.values.map(_._2).sum &&
        v == m.size.toLong)
      val libm = m.values.map { case (a, b) =>
        if (a > 0) a.toDouble / n1 * math.log(
          a.toDouble * (n2 + v) / (n1.toDouble * (b + 1))) / ln2 else 0.0
      }.sum
      assert(kl.isDefined && math.abs(kl.get - libm) < 1e-4,
        s"wd $wd: ${kl.get} vs libm $libm")
      // Q-tilde is a proper distribution over the union support, so
      // Gibbs gives KL >= 0 (minus L2 truncation slop)
      assert(kl.get >= -1e-5 && klRev.get >= -1e-5)
    }
    // swapping the arms exchanges the two directions exactly
    val swapped = ev.withColumn("event_type",
      when(col("event_type") === "purchase", "view")
        .when(col("event_type") === "view", "purchase")
        .otherwise(col("event_type")))
    val sw = Stats.klDivergenceOf(swapped)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq.sortBy(_._1)
    assert(sw.map(r => (r._1, r._5, r._6)) == got.map(r => (r._1, r._6, r._5)))
  }

  test("token MI: integer-core recompute row-exact + libm cross-check") {
    val got = graft.operators.TextAnalysis.tokenMi(spark, TestSpark.Sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got.size <= 50)
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
      .select(col("lang"), split(col("text"), " ").as("t"))
      .as[(String, Seq[String])].collect()
    val nDocs = docs.size.toLong
    val nl = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ntl = docs.flatMap { case (lg, t) => t.distinct.map(tok => (tok, lg)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nt = ntl.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    got.foreach { case (tok, ndw, mi) =>
      assert(ndw == nt(tok) && ndw >= 5)
      val sT = nl.keys.map { lg =>
        val p = ntl.getOrElse((tok, lg), 0L)
        val a = nl(lg) - p
        val pres = if (p > 0)
          BigInt(p) * (l2(p) + l2(nDocs) - l2(nt(tok)) - l2(nl(lg)))
        else BigInt(0)
        val abs = if (a > 0)
          BigInt(a) * (l2(a) + l2(nDocs) - l2(nDocs - nt(tok)) - l2(nl(lg)))
        else BigInt(0)
        pres + abs
      }.sum
      assert(mi == sT.toLong.toDouble /
        (nDocs * graft.functions.FixedLog2.Unit).toDouble, s"token $tok")
      val ln2 = math.log(2.0)
      val libm = nl.keys.map { lg =>
        val p = ntl.getOrElse((tok, lg), 0L); val a = nl(lg) - p
        (if (p > 0) p.toDouble / nDocs * math.log(
          p.toDouble * nDocs / (nt(tok).toDouble * nl(lg))) / ln2 else 0.0) +
          (if (a > 0) a.toDouble / nDocs * math.log(
            a.toDouble * nDocs / ((nDocs - nt(tok)).toDouble * nl(lg))) / ln2
          else 0.0)
      }.sum
      assert(math.abs(mi - libm) < 1e-4, s"token $tok vs libm")
    }
    // the MI ranking surfaces language markers: top tokens must skew
    // heavily into one language (sanity that the statistic ranks signal)
    val top = got.head
    val shares = nl.keys.map(lg =>
      ntl.getOrElse((top._1, lg), 0L).toDouble / nt(top._1))
    assert(shares.max > 1.5 / nl.size,
      s"top token ${top._1} not language-skewed: max share ${shares.max}")
  }

  test("log histogram: exact recompute, conservation, and bucket-edge law") {
    val got = Events.logHistogram(spark, TestSpark.Sf)
      .as[(String, Long, Double, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    val cents = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"),
        greatest(round(col("value") * lit(100)).cast("long"), lit(1L)).as("c"))
      .as[(String, Long)].collect().toSeq
    // independent recompute through the BigInt reference core
    val oct = FixedLog2.Unit / 8
    val exp = cents.groupBy { case (t, c) => (t, FixedLog2.l2Long(c) / oct) }
      .map { case ((t, b), rows) =>
        val cs = rows.map(_._2)
        (t, b, b.toDouble / 8.0, cs.size.toLong, cs.min, cs.max, cs.sum)
      }.toSeq.sortBy(r => (r._1, r._2))
    assert(got.sortBy(r => (r._1, r._2)) == exp)
    // conservation + edge law: both extremes of a bucket re-bucket to it
    got.foreach { case (t, b, lo, n, mn, mx, s) =>
      assert(lo == b.toDouble / 8.0 && n > 0 && mn <= mx &&
        s >= n * mn && s <= n * mx, s"bucket ($t,$b)")
      assert(FixedLog2.l2Long(mn) / oct == b && FixedLog2.l2Long(mx) / oct == b)
    }
    assert(got.map(_._4).sum == cents.size.toLong)
  }

  test("quantileDD: each picked bucket midpoint is within the DDSketch bound") {
    val rows = Events.quantileDD(spark, TestSpark.Sf)
      .as[(String, Long, Long, Double, Long, Double, Long, Double, Long)]
      .collect()
    assert(rows.nonEmpty)
    val byType = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"),
        greatest(round(col("value") * lit(100)).cast("long"), lit(1L)).as("c"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    rows.foreach { case (t, n, _, p50lg, _, p90lg, _, p99lg, mx) =>
      val cs = byType(t)
      assert(n == cs.size.toLong && mx == cs.last)
      Seq((50, p50lg), (90, p90lg), (99, p99lg)).foreach { case (q, lg) =>
        // the bucket picked by the cumulative walk contains the
        // ceil(q·n/100)-th smallest value (bucket index is monotone in
        // value), so its midpoint is within half a bucket of its log2
        val rank = (n * q + 99) / 100
        val truth = math.log(cs((rank - 1).toInt).toDouble) / math.log(2.0)
        assert(math.abs(truth - lg) <= 1.0 / 64 + 1e-4,
          s"type $t p$q: true log2 $truth vs midpoint $lg")
      }
    }
  }
}
