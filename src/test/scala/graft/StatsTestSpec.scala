package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-sample statistical tests (`welchTTest` / `mannWhitneyUTest`
  * analogues): independent Scala recomputation of the exact-integer
  * cores + the identical fixed double chains (row-exact equality), the
  * label-swap antisymmetry laws, and the U₁ + U₂ = n₁n₂ identity. */
class StatsTestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def swapped = {
    val ev = graft.sources.Tables.events(spark, TestSpark.Sf)
    ev.withColumn("event_type",
      when(col("event_type") === "purchase", "view")
        .when(col("event_type") === "view", "purchase")
        .otherwise(col("event_type")))
  }

  /** (wd, type) -> cents list straight off the fixture. */
  private lazy val samples: Map[(Long, String), Seq[Long]] =
    graft.sources.Tables.events(spark, TestSpark.Sf)
      .filter(col("event_type").isin("view", "purchase"))
      .select(expr("unix_micros(ts) div 86400000000 % 7").as("wd"),
        col("event_type"),
        round(col("value") * lit(100)).cast("long").as("c"))
      .as[(Long, String, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).toSeq).toMap

  test("welch t equals an independent Scala recompute, row-exact") {
    val got = Stats.welchTTest(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    got.foreach { case (wd, (_, n1, n2, m1, m2, t, dfv)) =>
      val p = samples.getOrElse((wd, "purchase"), Nil)
      val v = samples.getOrElse((wd, "view"), Nil)
      assert(n1 == p.size.toLong && n2 == v.size.toLong)
      val (s11, s21) = (p.sum, p.map(c => c * c).sum)
      val (s12, s22) = (v.sum, v.map(c => c * c).sum)
      val (n1d, n2d) = (n1.toDouble, n2.toDouble)
      assert(m1.contains(s11.toDouble / n1d) && m2.contains(s12.toDouble / n2d))
      val v1 = (s21.toDouble - s11.toDouble * s11.toDouble / n1d) / (n1d - 1.0)
      val v2 = (s22.toDouble - s12.toDouble * s12.toDouble / n2d) / (n2d - 1.0)
      val (se1, se2) = (v1 / n1d, v2 / n2d)
      val se = se1 + se2
      assert(t.contains((s11.toDouble / n1d - s12.toDouble / n2d) / math.sqrt(se)),
        s"wd $wd t")
      assert(dfv.contains(se * se /
        (se1 * se1 / (n1d - 1.0) + se2 * se2 / (n2d - 1.0))), s"wd $wd df")
    }
  }

  test("welch antisymmetry: swapping the arms negates t, keeps df") {
    val a = Stats.welchTTestOf(graft.sources.Tables.events(spark, TestSpark.Sf))
      .select("wd", "t_stat", "df")
      .as[(Long, Option[Double], Option[Double])].collect().map(r => r._1 -> r).toMap
    val b = Stats.welchTTestOf(swapped)
      .select("wd", "t_stat", "df")
      .as[(Long, Option[Double], Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(a.keySet == b.keySet && a.nonEmpty)
    a.foreach { case (wd, (_, t, dfv)) =>
      assert(t.map(-_) == b(wd)._2, s"wd $wd t negation")
      assert(dfv == b(wd)._3, s"wd $wd df invariance")
    }
  }

  test("corr matrix equals a BigInt moment recompute with the 3-limb split chain") {
    val got = graft.operators.Relational.corrMatrix(spark, TestSpark.Sf)
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.size == 3)
    val rows = graft.sources.Tables.lineitem(spark, TestSpark.Sf)
      .select(col("l_quantity").cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
        (col("l_discount").cast("decimal(18,4)") * 10000).cast("long"))
      .as[(Long, Long, Long)].collect()
    def split3(b: BigInt): Double = {
      val lo = b % BigInt(4294967296L)
      val r1 = (b - lo) / BigInt(4294967296L)
      val mid = r1 % BigInt(4294967296L)
      val hi = (r1 - mid) / BigInt(4294967296L)
      hi.toDouble * 1.8446744073709552e19 + mid.toDouble * 4294967296.0 +
        lo.toDouble
    }
    val n = BigInt(rows.length)
    def pearson(x: Seq[Long], y: Seq[Long]): Double = {
      val (sx, sy) = (x.map(BigInt(_)).sum, y.map(BigInt(_)).sum)
      val sxx = x.map(v => BigInt(v) * v).sum
      val syy = y.map(v => BigInt(v) * v).sum
      val sxy = x.zip(y).map { case (a, b) => BigInt(a) * b }.sum
      split3(n * sxy - sx * sy) /
        math.sqrt(split3(n * sxx - sx * sx) * split3(n * syy - sy * sy))
    }
    val (qs, ps, ds) = (rows.map(_._1).toSeq, rows.map(_._2).toSeq, rows.map(_._3).toSeq)
    assert(got(("quantity", "price"))._4.contains(pearson(qs, ps)))
    assert(got(("quantity", "discount"))._4.contains(pearson(qs, ds)))
    assert(got(("price", "discount"))._4.contains(pearson(ps, ds)))
    got.values.foreach { r =>
      assert(r._3 == rows.length.toLong)
      assert(r._4.exists(v => v >= -1.0 && v <= 1.0))
    }
  }

  test("regression equals a BigInt OLS recompute; r2 agrees with rel_corr squared") {
    val got = graft.operators.Relational.regression(spark, TestSpark.Sf)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size == 3)
    def split3(b: BigInt): Double = {
      val lo = b % BigInt(4294967296L)
      val r1 = (b - lo) / BigInt(4294967296L)
      val mid = r1 % BigInt(4294967296L)
      val hi = (r1 - mid) / BigInt(4294967296L)
      hi.toDouble * 1.8446744073709552e19 + mid.toDouble * 4294967296.0 +
        lo.toDouble
    }
    val rows = graft.sources.Tables.lineitem(spark, TestSpark.Sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    val corr = graft.operators.Relational.corrQuantityPrice(spark, TestSpark.Sf)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    got.foreach { case (flag, (_, n0, slope, intercept, r2)) =>
      val rs = rows(flag)
      val n = BigInt(rs.length)
      assert(n0 == rs.length.toLong)
      val sq = rs.map(r => BigInt(r._2)).sum
      val sp = rs.map(r => BigInt(r._3)).sum
      val sqq = rs.map(r => BigInt(r._2) * r._2).sum
      val spp = rs.map(r => BigInt(r._3) * r._3).sum
      val sqp = rs.map(r => BigInt(r._2) * r._3).sum
      val (num, fxx, fyy) = (n * sqp - sq * sp, n * sqq - sq * sq, n * spp - sp * sp)
      val sl = split3(num) / split3(fxx)
      assert(slope.contains(sl / 100.0), s"$flag slope")
      assert(intercept.contains(
        (split3(sp) - sl * split3(sq)) / n.toDouble / 100.0), s"$flag intercept")
      val r2v = (split3(num) / split3(fxx)) * (split3(num) / split3(fyy))
      assert(r2.contains(r2v), s"$flag r2")
      // cross-operator identity: r2 == rel_corr's r squared (different
      // double chains, so tolerance, not bit equality)
      assert(math.abs(r2v - corr(flag) * corr(flag)) < 1e-12, s"$flag r2 vs corr")
    }
  }

  test("weighted quantiles equal a brute-force weighted type-1 recompute") {
    val got = graft.operators.Relational.weightedQuantiles(spark, TestSpark.Sf)
      .as[(String, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 3)
    val rows = graft.sources.Tables.lineitem(spark, TestSpark.Sf)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("c"),
        col("l_quantity").cast("long").as("w"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    got.foreach { case (flag, (_, tw, p25, p50, p75)) =>
      val s = rows(flag).sortBy(_._2)
      val total = s.map(_._3).sum
      assert(tw == total)
      def wq(num: Long, den: Long): Double = {
        var cum = 0L
        s.find { r => cum += r._3; cum * den >= total * num }
          .get._2.toDouble / 100.0
      }
      assert(p25 == wq(1, 4) && p50 == wq(1, 2) && p75 == wq(3, 4), s"flag $flag")
      assert(p25 <= p50 && p50 <= p75)
    }
  }

  test("cramers V equals a BigInt recompute of the quantized chi-square") {
    val got = Stats.cramersV(spark, TestSpark.Sf)
      .as[(Long, Double, Long, Option[Double])].collect()
    assert(got.length == 1)
    val (n0, chi2, dof, v) = (got(0)._1, got(0)._2, got(0)._3, got(0)._4)
    val cells = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000 % 7").as("wd"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowT = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colT = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = rowT.values.sum
    assert(n0 == n && dof == (rowT.size - 1).toLong * (colT.size - 1))
    val chi2micro = (for { (t, r) <- rowT; (w, c) <- colT } yield {
      val o = cells.getOrElse((t, w), 0L)
      val num = BigInt(o) * n - BigInt(r) * c
      (num * num * 1000000) / (BigInt(n) * r * c)
    }).sum
    assert(chi2 == chi2micro.toDouble / 1e6)
    val k = math.min(rowT.size, colT.size)
    assert(v.contains(math.sqrt((chi2micro.toDouble / 1e6) /
      (n.toDouble * (k.toDouble - 1.0)))))
    assert(v.exists(x => x >= 0.0 && x <= 1.0))
  }

  test("student t equals a pooled-variance Scala recompute; |df| law vs welch") {
    val got = Stats.studentTTest(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Option[Double], Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    val welchDf = Stats.welchTTest(spark, TestSpark.Sf)
      .select("wd", "df").as[(Long, Option[Double])].collect().toMap
    got.foreach { case (wd, (_, n1, n2, t, dfv)) =>
      val p = samples.getOrElse((wd, "purchase"), Nil)
      val v = samples.getOrElse((wd, "view"), Nil)
      assert(n1 == p.size.toLong && n2 == v.size.toLong)
      assert(dfv == n1 + n2 - 2)
      val (n1d, n2d) = (n1.toDouble, n2.toDouble)
      val ss1 = p.map(c => c * c).sum.toDouble - p.sum.toDouble * p.sum.toDouble / n1d
      val ss2 = v.map(c => c * c).sum.toDouble - v.sum.toDouble * v.sum.toDouble / n2d
      val sp2 = (ss1 + ss2) / (n1d + n2d - 2.0)
      val se = math.sqrt(sp2 * (1.0 / n1d + 1.0 / n2d))
      assert(t.contains((p.sum.toDouble / n1d - v.sum.toDouble / n2d) / se),
        s"wd=$wd")
      // Welch-Satterthwaite df never exceeds the pooled df.
      welchDf(wd).foreach(wdf => assert(wdf <= dfv.toDouble + 1e-9))
    }
  }

  test("KS statistic equals a BigInt brute-force over the pooled value grid") {
    val got = Stats.ksTest(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    got.foreach { case (wd, (_, n1, n2, dStat, ksStat)) =>
      val p = samples.getOrElse((wd, "purchase"), Nil)
      val v = samples.getOrElse((wd, "view"), Nil)
      assert(n1 == p.size.toLong && n2 == v.size.toLong)
      val values = (p ++ v).distinct.sorted
      val dmax = values.map { c =>
        val cum1 = BigInt(p.count(_ <= c))
        val cum2 = BigInt(v.count(_ <= c))
        (cum1 * n2 - cum2 * n1).abs
      }.max
      val d = dmax.toDouble / (n1 * n2).toDouble
      assert(dStat.contains(d), s"wd=$wd")
      assert(ksStat.contains(
        math.sqrt(n1.toDouble * n2.toDouble / (n1.toDouble + n2.toDouble)) * d))
      assert(dStat.exists(x => x >= 0.0 && x <= 1.0))
    }
  }

  test("contingency C and bias-corrected V equal the chi-square chain recompute") {
    val got = Stats.contingency(spark, TestSpark.Sf)
      .as[(Long, Double, Option[Double], Option[Double])].collect()
    assert(got.length == 1)
    val (n0, chi2, cC, vCorr) = (got(0)._1, got(0)._2, got(0)._3, got(0)._4)
    // same quantized chi-square as the cramers key (cross-operator identity)
    val cv = Stats.cramersV(spark, TestSpark.Sf)
      .as[(Long, Double, Long, Option[Double])].collect()(0)
    assert(n0 == cv._1 && chi2 == cv._2)
    assert(cC.contains(math.sqrt(chi2 / (chi2 + n0.toDouble))))
    val cells = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000 % 7").as("wd"))
      .as[(String, Long)].collect().groupBy(identity).view.mapValues(_.size).toMap
    val (nr, nc) = (cells.keySet.map(_._1).size, cells.keySet.map(_._2).size)
    val nd = n0.toDouble
    val phi2c = math.max(0.0, chi2 / nd -
      (nr.toDouble - 1.0) * (nc.toDouble - 1.0) / (nd - 1.0))
    val nrc = nr.toDouble - (nr.toDouble - 1.0) * (nr.toDouble - 1.0) / (nd - 1.0)
    val ncc = nc.toDouble - (nc.toDouble - 1.0) * (nc.toDouble - 1.0) / (nd - 1.0)
    assert(vCorr.contains(math.sqrt(phi2c / (math.min(nrc, ncc) - 1.0))))
    // bias correction only ever shrinks V
    assert(vCorr.get <= cv._4.get + 1e-12)
    assert(cC.exists(x => x >= 0.0 && x < 1.0))
  }

  test("cramers V endpoints: independence gives 0, a bijection gives ~1") {
    def ev(rows: Seq[(String, Long)]) =
      rows.toDF("event_type", "day")
        .select(col("event_type"),
          expr("timestamp_micros(day * 86400000000)").as("ts"))
    // uniform grid: o = r*c/n exactly for every cell => chi2 = 0
    val indep = for { t <- Seq("a", "b", "c"); d <- 0L until 7L; _ <- 1 to 4 }
      yield (t, d)
    val vi = Stats.cramersVOf(ev(indep))
      .select("cramers_v").as[Option[Double]].collect()(0)
    assert(vi.contains(0.0))
    // each type on exactly one weekday => perfect association
    val perfect = for { i <- 0L until 5L; _ <- 1 to 9 } yield (s"t$i", i)
    val vp = Stats.cramersVOf(ev(perfect))
      .select("cramers_v").as[Option[Double]].collect()(0)
    assert(vp.exists(x => x > 0.999999 && x <= 1.0), s"got $vp")
  }

  test("roc auc equals brute-force pair counting; label swap complements") {
    val got = Stats.rocAuc(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    val swap = Stats.rocAucOf(swapped)
      .as[(Long, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty && got.keySet == swap.keySet)
    got.foreach { case (wd, (_, n1, n2, auc)) =>
      val p = samples.getOrElse((wd, "purchase"), Nil)
      val v = samples.getOrElse((wd, "view"), Nil)
      var wins = 0L; var ties = 0L
      p.foreach(x => v.foreach { y =>
        if (x > y) wins += 1 else if (x == y) ties += 1
      })
      val brute = (2 * wins + ties).toDouble / (2.0 * (n1 * n2).toDouble)
      assert(auc.contains(brute), s"wd $wd: $auc vs $brute")
      // AUC(pos<->neg swap) = 1 - AUC up to the shared exact rational
      val s2 = swap(wd)._4.get
      assert(math.abs(auc.get + s2 - 1.0) < 1e-12, s"wd $wd complement")
    }
  }

  test("rankCorr equals a BigInt doubled-rank recompute with the same split chain") {
    val got = Stats.rankCorr(spark, TestSpark.Sf)
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    val rows = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"),
        round(col("value") * lit(100)).cast("long").as("x"),
        expr("unix_micros(ts) % 86400000000").as("y"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    def split(b: BigInt): Double = {
      val lo = b % BigInt(4294967296L)
      val hi = (b - lo) / BigInt(4294967296L)
      hi.toDouble * 4294967296.0 + lo.toDouble
    }
    rows.foreach { case (tpe, rs) =>
      def r2(vals: Seq[Long]): Map[Long, BigInt] = {
        val counts = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val sorted = counts.keys.toSeq.sorted
        var less = 0L
        sorted.map { v =>
          val out = v -> BigInt(2 * less + counts(v) + 1)
          less += counts(v)
          out
        }.toMap
      }
      val (rx, ry) = (r2(rs.map(_._2).toSeq), r2(rs.map(_._3).toSeq))
      val n = BigInt(rs.size)
      val (sx, sy) = (rs.map(r => rx(r._2)).sum, rs.map(r => ry(r._3)).sum)
      val sxx = rs.map(r => rx(r._2) * rx(r._2)).sum
      val syy = rs.map(r => ry(r._3) * ry(r._3)).sum
      val sxy = rs.map(r => rx(r._2) * ry(r._3)).sum
      val (num, f1, f2) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
      val want =
        if (f1 > 0 && f2 > 0) Some(split(num) / math.sqrt(split(f1) * split(f2)))
        else None
      assert(got(tpe)._2 == rs.size.toLong && got(tpe)._3 == want, s"type $tpe")
    }
  }

  test("rankCorr endpoints: monotone +1, antitone -1, constant NULL") {
    def ev(vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      ("a", v, i.toLong)
    }.toDF("event_type", "value", "i")
      .select(col("event_type"), col("value"),
        expr("timestamp_micros(i * 1000000)").as("ts"))
    val up = Stats.rankCorrOf(ev((1 to 50).map(_.toDouble)))
      .select("rank_corr").as[Option[Double]].collect()(0)
    assert(up.exists(r => math.abs(r - 1.0) < 1e-12), s"monotone: $up")
    val down = Stats.rankCorrOf(ev((1 to 50).map(i => (51 - i).toDouble)))
      .select("rank_corr").as[Option[Double]].collect()(0)
    assert(down.exists(r => math.abs(r + 1.0) < 1e-12), s"antitone: $down")
    val const = Stats.rankCorrOf(ev(Seq.fill(50)(7.0)))
      .select("rank_corr").as[Option[Double]].collect()(0)
    assert(const.isEmpty, s"constant x must yield NULL: $const")
  }

  test("mann-whitney U equals an average-rank brute force; U1+U2 = n1*n2; z negates") {
    val got = Stats.mannWhitney(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val swap = Stats.mannWhitneyOf(swapped)
      .as[(Long, Long, Long, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty && got.keySet == swap.keySet)
    got.foreach { case (wd, (_, n1, n2, u1, z)) =>
      val p = samples.getOrElse((wd, "purchase"), Nil)
      val v = samples.getOrElse((wd, "view"), Nil)
      // brute-force average ranks over the pooled sample
      val pooled = (p.map((_, true)) ++ v.map((_, false))).sortBy(_._1)
      val rankByValue = pooled.zipWithIndex // 1-based ranks averaged per tie group
        .groupBy(_._1._1).view
        .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size).toMap
      val r1 = p.map(rankByValue).sum
      val u1Brute = r1 - n1.toDouble * (n1 + 1).toDouble / 2.0
      assert(u1 == u1Brute, s"wd $wd u1 $u1 vs $u1Brute")
      // identity + antisymmetry via the label swap
      assert(u1 + swap(wd)._4 == n1.toDouble * n2.toDouble, s"wd $wd U1+U2")
      assert(z.map(-_) == swap(wd)._5, s"wd $wd z negation")
    }
  }
}
