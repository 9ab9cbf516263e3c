package graft

import graft.operators.{Events, Extras, Relational, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent recomputation checks for the round-5 operators: each
  * query's result is rebuilt from the raw fixture rows with plain Scala
  * collections (a different algorithm, not a second run of the same
  * plan), so a wrong window frame, a dropped tie-break, or an off-by-one
  * in the integer-rational math shows up as a value diff here even
  * before the DuckDB gate runs. */
class SequenceAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (user_id, epoch_us, event_id, event_type) sorted the way every
    * sequence operator sorts: (ts, event_id) within user. */
  private lazy val seqs: Map[Long, Seq[(Long, Long, String)]] =
    Tables.events(spark, TestSpark.Sf)
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.map(r => (r._2, r._3, r._4)).sortBy(r => (r._1, r._2)).toSeq
      }

  test("ev_transitions equals a per-user sliding recompute") {
    val expected = seqs.values
      .flatMap(_.sliding(2).collect { case Seq(a, b) => (a._3, b._3) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Events.transitions(spark, TestSpark.Sf)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expected)
    assert(got.values.sum == seqs.values.map(_.size - 1).sum,
      "every non-first event is exactly one transition")
  }

  test("ev_sequence_pairs equals the quadratic ordered-pair count") {
    val expected = seqs.view.mapValues { evs =>
      val idx = evs.zipWithIndex
      idx.collect { case ((_, _, "click"), i) =>
        idx.count { case ((_, _, t), j) => t == "view" && j < i }.toLong
      }.sum
    }.filter(_._2 > 0).toMap
    val got = Events.sequencePairs(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("ev_histogram buckets partition the events and bound their values") {
    val rows = Events.valueHistogram(spark, TestSpark.Sf)
      .as[(Long, Double, Long, Double, Double)].collect()
    assert(rows.map(_._3).sum == Tables.events(spark, TestSpark.Sf).count())
    rows.foreach { case (b, lo, _, mn, mx) =>
      assert(b >= 0 && b <= 19 && lo == b * 25.0)
      assert(mn >= lo && mn <= mx)
      if (b < 19) assert(mx < lo + 25.0) // last bucket is open-topped
    }
  }

  test("rel_argmax matches the sort-based per-nation maximum") {
    val expected = Tables.customer(spark, TestSpark.Sf)
      .select($"c_nationkey".cast("long"), $"c_custkey", $"c_name", $"c_acctbal")
      .as[(Long, Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(
        _.minBy(r => (-r._4, r._2))).toMap
    val got = Relational.argMaxCustomer(spark, TestSpark.Sf)
      .as[(Long, String, Long, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (nk, name, key, bal) =>
      val e = expected(nk)
      assert((e._2, e._3, e._4) == ((key, name, bal)), s"nation $nk")
    }
  }

  test("rel_cond_aggs: conditional counts reconcile with filtered scans") {
    val orders = Tables.orders(spark, TestSpark.Sf)
    val got = Relational.condAggs(spark, TestSpark.Sf)
      .select($"o_orderpriority", $"n", $"n_f").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val n = orders.groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    val nF = orders.filter($"o_orderstatus" === "F")
      .groupBy($"o_orderpriority").count().as[(String, Long)].collect().toMap
    assert(got.keySet == n.keySet)
    got.foreach { case (p, (gn, gf)) =>
      assert(gn == n(p) && gf == nF.getOrElse(p, 0L), s"priority $p")
    }
  }

  test("x_salted_join aggregate equals the plain-join aggregate") {
    val plain = Tables.lineitem(spark, TestSpark.Sf)
      .join(Tables.orders(spark, TestSpark.Sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lineitems"),
        sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(38,6)")).cast("double").as("revenue"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val salted = Extras.saltedJoinQuery(spark, TestSpark.Sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(salted == plain)
  }

  test("text_vocab_coverage: greedy prefix recompute and minimality") {
    val counts = Tables.documents(spark, TestSpark.Sf)
      .select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").count().as[(String, Long)].collect()
      .map(_._2).sortBy(-_)
    val total = counts.sum
    val got = TextAnalysis.vocabCoverage(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    for ((th, num, den) <- Seq(("0.50", 1L, 2L), ("0.90", 9L, 10L), ("0.99", 99L, 100L))) {
      val needed = (num * total + den - 1) / den
      // greedy: take terms most-frequent-first until coverage reached
      var cum = 0L; var k = 0
      while (cum < needed) { cum += counts(k); k += 1 }
      val (nTerms, covered, gTotal) = got(th)
      assert(gTotal == total)
      assert(covered >= needed, s"$th covers the threshold")
      assert(nTerms == k, s"$th minimal term count")
      // ties make the exact covered value depend on which equal-count
      // terms are taken ONLY above/below the boundary level — the greedy
      // prefix and the histogram math agree because both take whole
      // levels then k-of-equal-count terms
      assert(covered == cum, s"$th covered tokens")
    }
  }

  test("text_bigram_lift equals a collections recompute, same IEEE order") {
    val texts = Tables.documents(spark, TestSpark.Sf)
      .select($"text").as[String].collect()
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val w = t.split(" ", -1)
      w.foreach(x => uni(x) = uni.getOrElse(x, 0L) + 1)
      w.sliding(2).foreach {
        case Array(a, b) => bi((a, b)) = bi.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val nT = uni.values.sum
    val nB = bi.values.sum
    val expected = bi.toSeq.filter(_._2 >= 5)
      .map { case ((a, b), cxy) =>
        (a, b, cxy, cxy.toDouble * nT * nT / (nB.toDouble * uni(a) * uni(b)))
      }
      .sortBy { case (a, b, _, l) => (-l, a, b) }
      .take(20)
    val got = TextAnalysis.bigramLift(spark, TestSpark.Sf)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == expected)
  }
}
