package graft

import graft.operators.{Events, TextAnalysis, Relational}
import org.apache.spark.sql.functions.{col, explode, expr, unix_micros}
import org.scalatest.funsuite.AnyFunSuite

class EventsTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sessionization: every session respects the 30-min gap invariants") {
    val sessions = Events.sessionize(spark, TestSpark.Sf)
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect()
    assert(sessions.nonEmpty)
    val gap = 30L * 60 * 1000 * 1000
    sessions.groupBy(_._1).values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      // sessions are disjoint and separated by >= the gap (end = last+gap)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 >= a._3, s"overlap: $a $b")
        case _ =>
      }
      // end - start >= gap (end extends past last event by the gap)
      sorted.foreach(s => assert(s._3 - s._2 >= gap))
    }
  }

  test("sliding windows hold exactly 4x the events of tumbling (1d/6h)") {
    val tumbled = Events.tumbling(spark, TestSpark.Sf)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    val slid = Events.sliding(spark, TestSpark.Sf)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(slid == 4 * tumbled)
  }

  test("filter partition: semi + anti customer sets partition the table") {
    val c = graft.sources.Tables.customer(spark, TestSpark.Sf).count()
    val semi = Relational.semiJoinCustomers(spark, TestSpark.Sf).count()
    val antiUrgent = Relational.antiJoinCustomers(spark, TestSpark.Sf)
    val o = graft.sources.Tables.orders(spark, TestSpark.Sf)
      .filter($"o_orderpriority" === "1-URGENT")
    val cc = graft.sources.Tables.customer(spark, TestSpark.Sf)
    val semiUrgent = cc.join(o, cc("c_custkey") === o("o_custkey"), "left_semi").count()
    assert(semiUrgent + antiUrgent.count() == c)
    assert(semi <= c)
  }

  test("token stats: counts agree with n_chars metadata column") {
    val bad = TextAnalysis.tokenStats(spark, TestSpark.Sf)
      .join(graft.sources.Tables.documents(spark, TestSpark.Sf), "doc_id")
      .filter($"n_token_chars" + $"n_tokens" - 1 =!= $"n_chars")
    assert(bad.count() == 0, "tokens+separators must reconstruct n_chars")
  }

  test("fingerprint: fp_norm is invariant to token order and multiplicity") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha alpha"),
      (3L, "alpha beta delta"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("fp_docs")
    val fps = docs.selectExpr("doc_id",
      "md5(cast(array_join(array_sort(array_distinct(split(text, ' '))), ' ') as binary)) as fp_norm")
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("langid reaches accuracy 1.0 on a separable multilingual corpus") {
    // per-language docs built from each language's function words plus
    // neutral filler — the regime the marker heuristic is designed for
    val docs = Seq(
      (1L, "en", "the cat sat on the mat and it is a fine day of rest"),
      (2L, "en", "a tale of two cities is the best and the worst of it"),
      (3L, "es", "el perro y la casa de mi madre es grande y bonita"),
      (4L, "es", "la vida es bella y el sol de verano es brillante"),
      (5L, "de", "der hund und die katze das haus ist gross und alt"),
      (6L, "de", "das wetter ist heute schoen und der himmel ist blau"),
      (7L, "fr", "le chien et la maison est grande et le jardin est beau"),
      (8L, "fr", "la vie est belle et le soleil est brillant aujourd hui"),
      (9L, "und", "zzz qqq xxx www yyy vvv uuu ttt sss rrr"))
      .toDF("doc_id", "lang", "text")
    val out = graft.operators.TextAnalysis.langIdOf(docs)
      .select("lang", "pred_lang").as[(String, String)].collect()
    // es/fr share 'la'/'de' and de shares nothing with en here — exact
    // match expected on every row, i.e. accuracy 1.0
    out.foreach { case (truth, pred) => assert(pred == truth, s"$truth -> $pred") }
  }

  test("quality keep-rule matches its definition on fixture docs") {
    val q = TextAnalysis.quality(spark, TestSpark.Sf)
      .select("n_tokens", "distinct_ratio", "keep")
      .as[(Long, Double, Boolean)].collect()
    q.foreach { case (n, dr, keep) =>
      assert(keep == (n >= 20 && n <= 500 && dr > 0.3))
    }
  }

  test("funnel levels partition the user base; retention bounded by cohort size") {
    val ev = graft.sources.Tables.events(spark, TestSpark.Sf)
    val levels = graft.operators.Events.funnelSteps(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    assert(levels.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    assert(levels.values.sum == ev.select("user_id").distinct().count(),
      "every user lands in exactly one deepest level")
    assert(levels.getOrElse(3L, 0L) > 0, "fixture must contain full conversions")
    val ret = graft.operators.Events.retention(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(ret.nonEmpty)
    ret.foreach { case (_, n, d1, d7) =>
      assert(d1 <= n && d7 <= n, "retained users cannot exceed the cohort")
    }
    assert(ret.map(_._2).sum == ev.select("user_id").distinct().count(),
      "cohorts partition the user base")
  }

  test("cohort matrix: age-0 diagonal equals cohort sizes; d1/d7 cells equal retention") {
    import graft.operators.Events
    val matrix = Events.cohortMatrix(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect()
      .map { case (c, a, n) => (c, a) -> n }.toMap
    val ret = Events.retention(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(ret.nonEmpty && matrix.nonEmpty)
    ret.foreach { case (cohort, nUsers, d1, d7) =>
      assert(matrix((cohort, 0L)) == nUsers, s"age-0 of cohort $cohort")
      assert(matrix.getOrElse((cohort, 1L), 0L) == d1, s"age-1 of cohort $cohort")
      assert(matrix.getOrElse((cohort, 7L), 0L) == d7, s"age-7 of cohort $cohort")
    }
    // ages are non-negative and never exceed the observed day span
    matrix.keys.foreach { case (_, age) => assert(age >= 0) }
  }

  test("sequenceMatch on the funnel pattern equals funnel level 3 exactly") {
    import graft.operators.Events
    val matched = Events.sequenceMatch(spark, TestSpark.Sf)
    assert(matched.select("user_id").distinct().count() == matched.count(),
      "one row per matched user")
    val levels = Events.funnelSteps(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    assert(matched.count() == levels.getOrElse(3L, 0L),
      "funnel-shaped pattern must match exactly the full-conversion users")
    // step times are ordered and inside the 7-day window
    matched.select("t1_us", "t2_us", "t3_us")
      .as[(Long, Long, Long)].collect().foreach { case (t1, t2, t3) =>
        assert(t1 < t2 && t2 < t3)
        assert(t3 <= t1 + 7L * 86400 * 1000000)
      }
  }

  test("strict funnel is dominated by the loose funnel at every cumulative level") {
    import graft.operators.Events
    def cum(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val h = df.as[(Long, Long)].collect().toMap.withDefaultValue(0L)
      (0L to 3L).map(l => l -> (l to 3L).map(h).sum).toMap
    }
    val loose = cum(Events.funnelSteps(spark, TestSpark.Sf))
    val strict = cum(Events.funnelStrict(spark, TestSpark.Sf))
    assert(loose(0L) == strict(0L), "both partition the full user base")
    (1L to 3L).foreach { l =>
      assert(strict(l) <= loose(l), s"strict must be dominated at level >= $l")
    }
  }

  test("strict funnel: adjacency enforced on hand-built sequences") {
    import graft.operators.Events
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(min * 60000L)
    val ev = Seq(
      // user 1: view,click,purchase adjacent → level 3
      (1L, t(0), 1L, "view"), (2L, t(1), 1L, "click"), (3L, t(2), 1L, "purchase"),
      // user 2: view,OTHER,click → interruption freezes at level 1
      (4L, t(0), 2L, "view"), (5L, t(1), 2L, "other"), (6L, t(2), 2L, "click"),
      // user 3: click only → level 0
      (7L, t(0), 3L, "click"),
      // user 4: view,click then nothing → level 2
      (8L, t(0), 4L, "view"), (9L, t(1), 4L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.funnelStrictOf(ev).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L), got.toString)
  }

  test("sequenceCount: prefix formula equals stack simulation; greedy equals DFA") {
    import graft.operators.Events
    // ground truth from a direct per-user scan of the fixture stream
    val ev = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select($"user_id", org.apache.spark.sql.functions.unix_micros($"ts"),
        $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val perUser = ev.groupBy(_._1).map { case (u, rows) =>
      val syms = rows.sortBy(r => (r._2, r._3)).map(_._4)
        .filter(t => t == "view" || t == "click")
      // maximum disjoint pairs: stack matching (view pushes, click pops)
      var avail = 0; var matched = 0
      // greedy ClickHouse restart semantics: two-state DFA
      var st = 0; var greedy = 0
      syms.foreach { t =>
        if (t == "view") avail += 1
        else if (avail > 0) { avail -= 1; matched += 1 }
        if (st == 0 && t == "view") st = 1
        else if (st == 1 && t == "click") { st = 0; greedy += 1 }
      }
      u -> (matched.toLong, greedy.toLong)
    }
    val gotMax = Events.sequenceCount(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    val gotGreedy = Events.sequenceCountGreedy(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    assert(gotMax.nonEmpty && gotGreedy.nonEmpty)
    perUser.foreach { case (u, (m, g)) =>
      assert(gotMax.getOrElse(u, 0L) == m, s"max-disjoint mismatch for user $u")
      assert(gotGreedy.getOrElse(u, 0L) == g, s"greedy mismatch for user $u")
      assert(g <= m, s"greedy must be dominated by the maximum for user $u")
    }
    // queries emit no users beyond the simulation's nonzero set
    assert(gotMax.keySet.forall(u => perUser.toMap.apply(u)._1 > 0))
    assert(gotGreedy.keySet.forall(u => perUser.toMap.apply(u)._2 > 0))
  }

  test("sequenceMatch: order and window are enforced; repeated types work") {
    import graft.operators.Events
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(min * 60000L)
    val ev = Seq(
      // user 1: a-b-a in order, tight gaps → matches a,b,a
      (1L, "a", t(0)), (1L, "b", t(1)), (1L, "a", t(2)),
      // user 2: b before a only → no a,b,a (second a missing)
      (2L, "b", t(0)), (2L, "a", t(1)), (2L, "b", t(2)),
      // user 3: right order but second a outside the window
      (3L, "a", t(0)), (3L, "b", t(1)), (3L, "a", t(8 * 24 * 60)))
      .toDF("user_id", "event_type", "ts")
    val got = Events.sequenceMatchOf(ev, Seq("a", "b", "a"), "interval 7 days")
      .select("user_id").as[Long].collect().toSeq
    assert(got == Seq(1L), s"expected only user 1, got $got")
  }

  test("minMaxMap reconciles with sumMap: mn*n <= sum_k <= mx*n per (day, type)") {
    import graft.operators.Events
    def parse(df: org.apache.spark.sql.DataFrame): Map[(Long, String), Array[Long]] =
      df.as[(Long, String)].collect().flatMap { case (day, kv) =>
        kv.split(",").map { cell =>
          val p = cell.split(":")
          (day, p(0)) -> p.drop(1).map(_.toLong)
        }
      }.toMap
    val mm = parse(Events.minMaxMapDaily(spark, TestSpark.Sf)) // mn, mx, n
    val sm = parse(Events.sumMapDaily(spark, TestSpark.Sf))    // n_all, sum_k
    assert(mm.nonEmpty)
    mm.foreach { case (key, Array(mn, mx, n)) =>
      assert(mn <= mx && n > 0, s"$key bounds")
      val Array(nAll, sumK) = sm(key)
      assert(n <= nAll, s"$key metric rows within all rows")
      assert(mn * n <= sumK && sumK <= mx * n, s"$key sum bracket")
    }
  }

  test("funnelDedup: break-on-repeat cases, == direct simulation, dominated by default") {
    import graft.operators.Events
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(min * 60000L)
    def eids(rows: Seq[(Long, String, Timestamp)]) =
      rows.zipWithIndex.map { case ((u, ty, ts), i) => (i.toLong, u, ty, ts, 0.0) }
        .toDF("event_id", "user_id", "event_type", "ts", "value")
    val ev = eids(Seq(
      // user 1: clean chain → 3
      (1L, "view", t(0)), (1L, "click", t(1)), (1L, "purchase", t(2)),
      // user 2: second view while waiting for click → break at 1
      (2L, "view", t(0)), (2L, "view", t(1)), (2L, "click", t(2)),
      (2L, "purchase", t(3)),
      // user 3: repeat CLICK while waiting for purchase → break at 2
      (3L, "view", t(0)), (3L, "click", t(1)), (3L, "click", t(2)),
      (3L, "purchase", t(3)),
      // user 4: purchase while waiting for click is AHEAD of the chain
      //         (not matched yet) → ignored, chain completes → 3
      (4L, "view", t(0)), (4L, "purchase", t(1)), (4L, "click", t(2)),
      (4L, "purchase", t(3)),
      // user 5: no view at all → 0
      (5L, "click", t(0)), (5L, "purchase", t(1))))
    val got = Events.funnelDedupOf(ev)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 2L), s"got $got")
    // direct Scala simulation over the fixture
    val W = 7L * 24 * 3600 * 1000000L
    val sim = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().groupBy(_._1).view.mapValues { rs =>
        var (lv, a, tl, done) = (0L, 0L, 0L, false)
        rs.filter(r => Set("view", "click", "purchase")(r._4))
          .sortBy(r => (r._2, r._3)).foreach { case (_, us, _, ty) =>
            val sym = ty match { case "view" => 0; case "click" => 1; case _ => 2 }
            if (!done && lv < 3) {
              if (lv == 0) { if (sym == 0) { lv = 1; a = us; tl = us } }
              else if (sym == lv && us > tl && us <= a + W) { lv += 1; tl = us }
              else if (sym < lv) done = true
            }
          }
        lv
      }.toMap
    val simHist = sim.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fixture = Events.funnelDedup(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    assert(fixture == simHist, s"fixture $fixture vs sim $simHist")
    // cumulative >=k counts dominated by the default (loose) mode
    val loose = Events.funnelSteps(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    for (k <- 1L to 3L) {
      def cumAtLeast(h: Map[Long, Long]) =
        h.filter(_._1 >= k).values.sum
      assert(cumAtLeast(fixture) <= cumAtLeast(loose), s"level >= $k")
    }
  }

  test("sequenceMatchTimed: pairwise gap bounds, late-witness, == brute force") {
    import graft.operators.Events
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(min * 60000L)
    val g1 = 10L * 60000000L // 10 min in µs
    val g2 = 30L * 60000000L
    val ev = Seq(
      // user 1: tight chain inside both gaps → match
      (1L, "view", t(0)), (1L, "click", t(5)), (1L, "purchase", t(20)),
      // user 2: click arrives 11 min after the only view → gap 1 fails
      (2L, "view", t(0)), (2L, "click", t(11)), (2L, "purchase", t(12)),
      // user 3: first view too early, but a LATER view re-arms the
      //         chain (latest-admissible witness) → match
      (3L, "view", t(0)), (3L, "view", t(8)), (3L, "click", t(15)),
      (3L, "purchase", t(30)),
      // user 4: purchase 31 min after the click → gap 2 fails
      (4L, "view", t(0)), (4L, "click", t(5)), (4L, "purchase", t(36)),
      // user 5: click tied at the view's exact µs is NOT strictly after
      (5L, "view", t(0)), (5L, "click", t(0)), (5L, "purchase", t(10)))
      .toDF("user_id", "event_type", "ts")
    val got = Events.sequenceMatchTimedOf(ev,
        Seq("view", "click", "purchase"), Seq(g1, g2))
      .select("user_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L), s"got $got")
    // brute force over every (v, c, p) assignment on the sf fixture
    val gaps = Seq(3600000000L, 86400000000L)
    val evs = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_type"))
      .as[(Long, Long, String)].collect().groupBy(_._1)
    val want = evs.filter { case (_, rs) =>
      val vs = rs.filter(_._3 == "view").map(_._2)
      val cs = rs.filter(_._3 == "click").map(_._2)
      val ps = rs.filter(_._3 == "purchase").map(_._2)
      vs.exists(v => cs.exists(c => c > v && c - v <= gaps(0) &&
        ps.exists(p => p > c && p - c <= gaps(1))))
    }.keySet
    val fixture = Events.sequenceMatchTimed(spark, TestSpark.Sf)
      .select("user_id").as[Long].collect().toSet
    assert(fixture == want,
      s"missed=${(want -- fixture).take(3)} extra=${(fixture -- want).take(3)}")
    assert(want.nonEmpty, "fixture must contain timed conversions")
  }

  test("sequenceMatchNeg: negated gaps, adversarial witness, == brute force") {
    import graft.operators.Events
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(min * 60000L)
    val ev = Seq(
      // user 1: clean view->click->purchase, no poison → match
      (1L, "view", t(0)), (1L, "click", t(1)), (1L, "purchase", t(2)),
      // user 2: purchase between view and click poisons gap 1; no
      //         later clean view→click → no match
      (2L, "view", t(0)), (2L, "purchase", t(1)), (2L, "click", t(2)),
      (2L, "purchase", t(3)),
      // user 3: first view→click gap dirty, but a SECOND view after the
      //         poison gives a clean chain (adversarial witness) → match
      (3L, "view", t(0)), (3L, "purchase", t(1)), (3L, "view", t(2)),
      (3L, "click", t(3)), (3L, "purchase", t(4)),
      // user 4: view between click and purchase poisons gap 2 → no match
      (4L, "view", t(0)), (4L, "click", t(1)), (4L, "view", t(2)),
      (4L, "purchase", t(3)),
      // user 5: user-4 shape but a second click after the re-view
      //         re-opens gap 2 → match
      (5L, "view", t(0)), (5L, "click", t(1)), (5L, "view", t(2)),
      (5L, "click", t(3)), (5L, "purchase", t(4)))
      .toDF("user_id", "event_type", "ts")
    val got = Events.sequenceMatchNegOf(ev, Seq("view", "click", "purchase"),
        Seq(Some("purchase"), Some("view")))
      .select("user_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L, 5L), s"got $got")
    // brute force over every (v, c, p) assignment on the sf fixture:
    // the single-pass latest-admissible-prefix scan must agree exactly
    val evs = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_type"))
      .as[(Long, Long, String)].collect().groupBy(_._1)
    val want = evs.filter { case (_, rows) =>
      val vs = rows.filter(_._3 == "view").map(_._2)
      val cs = rows.filter(_._3 == "click").map(_._2)
      val ps = rows.filter(_._3 == "purchase").map(_._2)
      // the gap convention is half-open [step_k, step_k+1): a forbidden
      // event tied at the LOWER step's µs poisons, one tied at the
      // upper step's does not (matches the RANGE -1µs windows)
      vs.exists(v => cs.exists(c => v < c &&
        !ps.exists(x => v <= x && x < c) &&
        ps.exists(p => c < p && !vs.exists(x => c <= x && x < p))))
    }.keys.toSeq.sorted
    val gotSf = Events.sequenceMatchNeg(spark, TestSpark.Sf)
      .as[Long].collect().toSeq
    assert(gotSf == want, s"brute-force disagreement: got=$gotSf want=$want")
  }

  test("kmvOverlap: exact below cap, equal to direct set algebra, partition-invariant") {
    val tu = Seq.tabulate(5000)(i => (s"t${i % 3}", (i % 700).toLong))
      .toDF("event_type", "user_id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Events.kmvOverlapOf(df, 4096)
        .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    val kmv = run(tu)
    assert(kmv.length == 3) // 3 types -> 3 unordered pairs
    val sets = (0 until 3).map(t => s"t$t" ->
      (0 until 5000).filter(_ % 3 == t).map(i => (i % 700).toLong).toSet).toMap
    kmv.foreach { case (a, b, na, nb, nu, nov) =>
      assert(na == sets(a).size && nb == sets(b).size, s"sizes $a/$b")
      assert(nu == (sets(a) | sets(b)).size, s"union $a/$b")
      assert(nov == (sets(a) & sets(b)).size, s"overlap $a/$b")
    }
    assert(run(tu.repartition(13)) == kmv, "partition-count dependence")
  }

  test("kmvOverlap: above the cap the estimator lands within KMV error bounds") {
    val n = 20000
    // two types sharing exactly half their users: |a|=|b|=n, |a∪b|=1.5n
    val tu = ((0 until n).map(i => ("a", i.toLong)) ++
      (0 until n).map(i => ("b", (i + n / 2).toLong)))
      .toDF("event_type", "user_id")
    val k = 256
    val Array((_, _, na, nb, nu, nov)) = Events.kmvOverlapOf(tu, k)
      .as[(String, String, Long, Long, Long, Long)].collect()
    // KMV rsd = 1/sqrt(k-2) ≈ 6.3%; 5σ bound (deterministic hash — the
    // draw is fixed, the bound just documents the estimator's regime)
    val tol = 5.0 / math.sqrt(k - 2.0)
    assert(math.abs(na - n) <= n * tol, s"users_a $na vs $n")
    assert(math.abs(nb - n) <= n * tol, s"users_b $nb vs $n")
    assert(math.abs(nu - 1.5 * n) <= 1.5 * n * tol, s"union $nu vs ${1.5 * n}")
    // the intersection estimator compounds binomial c-noise with the
    // union estimate; allow the combined band
    assert(math.abs(nov - n / 2) <= n / 2 * 6 * tol, s"overlap $nov vs ${n / 2}")
  }

  test("kmvDailyRollup: merged sketches equal direct set algebra below cap, partition-invariant") {
    // 21 days × 2 types; per-day user pools drift so weekly sets differ
    // and the cumulative series strictly grows
    val rows = for {
      d <- 0 until 21; t <- Seq("ta", "tb"); u <- 0 until 80
    } yield (t,
      java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
      (d / 5) * 40L + (u % (40 + d % 7)) + (if (t == "ta") 0L else 100000L))
    val df = rows.toDF("event_type", "ts", "user_id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Events.kmvDailyRollupOf(d, 4096)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    val got = run(df)
    // independent replay with plain sets over the same (day, week) math
    val withDay = rows.map { case (t, ts, u) =>
      (t, ts.toLocalDateTime.toLocalDate.toEpochDay, u) }
    val wk = withDay.groupBy(r => (r._1, r._2 / 7))
    val expect = wk.toSeq.map { case ((t, w), rs) =>
      val cumUsers = withDay.filter(r => r._1 == t && r._2 / 7 <= w)
        .map(_._3).toSet
      (t, w, rs.map(_._2).toSet.size.toLong, rs.map(_._3).toSet.size.toLong,
        cumUsers.size.toLong)
    }.sortBy(r => (r._1, r._2))
    assert(got == expect, s"got $got\nexpect $expect")
    assert(got.map(_._5).distinct.size > 1, "cumulative series must grow")
    assert(run(df.repartition(13)) == got, "partition-count dependence")
  }

  test("kmvDailyRollup: above the cap the estimator lands within KMV error bounds") {
    // 3 weeks × 4000 FRESH users each ⇒ weekly true 4000, cumulative
    // 4000/8000/12000, against k = 256 (rsd ≈ 6.3%, 5σ band)
    val rows = for (w <- 0 until 3; d <- 0 until 7; u <- 0 until 4000 / 7 + 1)
      yield ("t",
        java.sql.Timestamp.valueOf(f"2024-03-${w * 7 + d + 1}%02d 12:00:00"),
        w * 100000L + d * 1000L + u)
    val k = 256
    val got = Events.kmvDailyRollupOf(rows.toDF("event_type", "ts", "user_id"), k)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._2)
    // epoch weeks (day div 7) need not align to the calendar layout —
    // replay the true counts from the data at the same grain
    val withDay = rows.map { case (_, ts, u) =>
      (ts.toLocalDateTime.toLocalDate.toEpochDay, u) }
    val weeks = withDay.groupBy(_._1 / 7).toSeq.sortBy(_._1)
    assert(got.map(_._2).toSeq == weeks.map(_._1), "week grain must match")
    val tol = 5.0 / math.sqrt(k - 2.0)
    got.zip(weeks).foreach { case ((_, w, nd, uw, uc), (_, rs)) =>
      val weekTrue = rs.map(_._2).toSet.size.toLong
      val cumTrue = withDay.filter(_._1 / 7 <= w).map(_._2).toSet.size.toLong
      assert(nd == rs.map(_._1).toSet.size.toLong)
      assert(weekTrue > k, "regime check: the estimator branch must arm")
      assert(math.abs(uw - weekTrue) <= weekTrue * tol, s"week $w: $uw vs $weekTrue")
      assert(math.abs(uc - cumTrue) <= cumTrue * tol, s"cum $w: $uc vs $cumTrue")
    }
  }

  test("sumMapDaily: serialized map reconciles with independent per-type scans") {
    // parse each day's type:n:sum_k entries back out and compare against
    // a from-scratch recompute over the collected fixture (exact
    // integers end to end, so equality is strict)
    val got = Events.sumMapDaily(spark, TestSpark.Sf)
      .as[(Long, String)].collect().toMap
      .map { case (d, kv) => d -> kv.split(',').map { s =>
        val Array(t, n, k) = s.split(':'); (t, (n.toLong, k.toLong))
      }.toMap }
    val want = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(expr("cast(unix_date(cast(ts as date)) as bigint)").as("d"),
        col("event_type"),
        expr("cast(get_json_object(props, '$.k') as long)").as("k"))
      .as[(Long, String, Option[Long])].collect()
      .groupBy(r => (r._1, r._2))
      .map { case ((d, t), rows) =>
        ((d, t), (rows.length.toLong, rows.flatMap(_._3).sum)) }
    assert(got.nonEmpty)
    want.foreach { case ((d, t), nv) =>
      assert(got(d)(t) == nv, s"day=$d type=$t: ${got(d)(t)} vs $nv") }
    assert(got.map(_._2.size).sum == want.size, "entry-count mismatch")
    // the map-typed seam carries the same entries as the string form
    val viaMap = Events.sumMapOf(
        graft.sources.Tables.events(spark, TestSpark.Sf))
      .select(col("day"), explode(col("kv")))
      .as[(Long, String, (Long, Long))].collect()
      .map { case (d, t, nv) => (d, t) -> nv }.toMap
    assert(viaMap == want.toMap)
  }

  test("sequenceNextNode: distribution equals a per-user brute-force walk") {
    val evs = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().groupBy(_._1)
    val window = 7L * 24 * 3600 * 1000000
    val want = evs.values.flatMap { rows =>
      // earliest-completion chain: min view, then min click after it
      // inside the 7-day window — then the (ts, event_id)-first successor
      val t1 = rows.filter(_._4 == "view").map(_._2).minOption
      val t2 = t1.flatMap(v => rows
        .filter(r => r._4 == "click" && r._2 > v && r._2 <= v + window)
        .map(_._2).minOption)
      t2.flatMap(c => rows.filter(_._2 > c)
        .sortBy(r => (r._2, r._3)).headOption.map(_._4))
    }.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val got = Events.sequenceNextNode(spark, TestSpark.Sf)
      .as[(String, Long)].collect().toMap
    assert(got == want, s"got=$got want=$want")
    assert(got.values.sum > 0)
  }

  test("bm25 top-k equals a brute-force integer recompute on the fixture") {
    import graft.functions.FixedLog2
    import graft.operators.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.length.toLong
    val t = toks.values.map(_.size.toLong).sum
    val avg = t / n
    val tf = toks.toSeq.flatMap { case (id, tk) =>
      tk.groupBy(identity).map { case (tok, xs) => (id, tok, xs.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (tok, xs) => tok -> xs.size.toLong }
    val l2x = FixedLog2.l2Long(2 * n + 2)
    def scoreFix(tok: String, tfv: Long, dl: Long): Long = {
      val idf = l2x - FixedLog2.l2Long(2 * df(tok) + 1)
      val tf1 = math.min(tfv, 1000L)
      idf * 44 * tf1 * avg / (20 * tf1 * avg + 6 * avg + 18 * dl)
    }
    val byDocTok = tf.map(r => (r._1, r._2) -> r._3).toMap
    val want = docs.map(_._1).sorted.take(5).flatMap { qid =>
      val qterms = toks(qid).take(6).distinct
      val scores = docs.map(_._1).flatMap { d =>
        val dl = toks(d).size.toLong
        val s = qterms.flatMap(tk => byDocTok.get((d, tk))
          .map(tfv => scoreFix(tk, tfv, dl))).sum
        val matched = qterms.exists(tk => byDocTok.contains((d, tk)))
        if (matched) Some((d, s)) else None
      }
      scores.sortBy { case (d, s) => (-s, d) }.take(5).zipWithIndex
        .map { case ((d, s), i) => (qid, i + 1L, d, s) }
    }.toSet
    val got = TextAnalysis.bm25TopK(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want,
      s"missed=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty)
    // every query yields a dense rank prefix 1..k
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).toSeq.sorted == (1L to rows.size).toSeq,
        s"query $qid ranks must be dense from 1")
    }
  }

  test("bm25 proximity equals a brute-force recompute incl. min cross-term gap") {
    import graft.functions.FixedLog2
    import graft.operators.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.length.toLong
    val avg = toks.values.map(_.size.toLong).sum / n
    val tf = toks.toSeq.flatMap { case (id, tk) =>
      tk.groupBy(identity).map { case (tok, xs) => (id, tok, xs.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (tok, xs) => tok -> xs.size.toLong }
    val byDocTok = tf.map(r => (r._1, r._2) -> r._3).toMap
    val l2x = FixedLog2.l2Long(2 * n + 2)
    def scoreFix(tok: String, tfv: Long, dl: Long): Long = {
      val idf = l2x - FixedLog2.l2Long(2 * df(tok) + 1)
      val tf1 = math.min(tfv, 1000L)
      idf * 44 * tf1 * avg / (20 * tf1 * avg + 6 * avg + 18 * dl)
    }
    val queries = docs.map(_._1).sorted.iterator
      .filter(q => toks(q).distinct.size >= 2).take(5).toSeq
    val want = queries.flatMap { qid =>
      val Seq(ta, tb) = toks(qid).distinct.sorted.take(2)
      val scored = docs.map(_._1).flatMap { d =>
        val tk = toks(d)
        // brute-force min gap: quadratic over ALL cross-term position
        // pairs — deliberately NOT the operator's sorted-adjacency trick
        val pa = tk.zipWithIndex.collect { case (t, i) if t == ta => i }
        val pb = tk.zipWithIndex.collect { case (t, i) if t == tb => i }
        if (pa.isEmpty || pb.isEmpty) None
        else {
          val gap = (for (a <- pa; b <- pb) yield math.abs(a - b)).min.toLong
          val bm = scoreFix(ta, byDocTok((d, ta)), tk.size.toLong) +
            scoreFix(tb, byDocTok((d, tb)), tk.size.toLong)
          Some((d, gap, bm + (1L << 20) / gap))
        }
      }
      scored.sortBy { case (d, _, s) => (-s, d) }.take(5).zipWithIndex
        .map { case ((d, g, s), i) => (qid, i + 1L, d, g, s) }
    }.toSet
    val got = TextAnalysis.bm25Proximity(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want,
      s"missed=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty)
    assert(got.exists(_._4 > 1), "fixture should exercise gaps > 1")
  }
}
