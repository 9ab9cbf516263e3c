package graft

import graft.functions.LttbAgg
import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LTTB downsampling: the aggregate's distributed buffering/merge path
  * against an independent sequential implementation written here (not
  * the shared helper), plus the structural invariants and the
  * partition-merge determinism the rows-only `ev_lttb` key claims. */
class LttbSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: textbook LTTB (Steinarsson 2013) with the
    * same bucket split and first-tie-wins rule, written from the paper
    * rather than from LttbAgg.select. */
  private def refLttb(pts: Seq[(Long, Double)], nOut: Int): Seq[(Long, Double)] = {
    val s = pts.sorted
    val n = s.length
    if (n <= nOut) return s
    val b = nOut - 2
    val ranges = (0 until b).map { i =>
      (1 + ((n - 2).toLong * i / b).toInt, 1 + ((n - 2).toLong * (i + 1) / b).toInt)
    }
    var prev = s.head
    val picked = ranges.zipWithIndex.map { case ((l, h), i) =>
      val (cx, cy) =
        if (i + 1 < b) {
          val nx = s.slice(ranges(i + 1)._1, ranges(i + 1)._2)
          (nx.map(_._1.toDouble).sum / nx.size, nx.map(_._2).sum / nx.size)
        } else (s.last._1.toDouble, s.last._2)
      val best = s.slice(l, h).maxBy { p =>
        // maxBy keeps the first max — matches the first-tie-wins rule
        math.abs((prev._1 - cx) * (p._2 - prev._2) -
          (prev._1 - p._1).toDouble * (cy - prev._2))
      }
      prev = best
      best
    }
    s.head +: picked :+ s.last
  }

  private def viaAgg(pts: Seq[(Long, Double)], nOut: Int, parts: Int): Seq[(Long, Double)] = {
    pts.toDF("t", "y").repartition(parts)
      .agg(LttbAgg.lttb($"t", $"y", nOut).as("p"))
      .select(explode($"p").as("e")).select($"e.t", $"e.y")
      .as[(Long, Double)].collect().toSeq
  }

  private val series: Seq[(Long, Double)] =
    (0L until 500L).map(i => (i, math.sin(i / 7.0) * 100 + (i % 13) * 3.0))

  test("aggregate equals the independent sequential LTTB") {
    val got = viaAgg(series, 24, 8)
    assert(got == refLttb(series, 24))
  }

  test("partition-merge invariant: 1 vs 13 partitions agree") {
    assert(viaAgg(series, 24, 1) == viaAgg(series, 24, 13))
  }

  test("structural invariants: endpoints, size, subset") {
    val got = viaAgg(series, 24, 4)
    assert(got.size == 24)
    assert(got.head == series.minBy(_._1) && got.last == series.maxBy(_._1))
    assert(got.toSet.subsetOf(series.toSet))
    assert(got == got.sortBy(_._1), "output in time order")
  }

  test("short series returned whole; nOut=3 keeps a middle point") {
    val short = Seq((1L, 2.0), (2L, 9.0), (3L, 1.0))
    assert(viaAgg(short, 24, 2) == short)
    val spiky = (0L until 10L).map(i => (i, if (i == 4) 50.0 else 0.0))
    val three = viaAgg(spiky, 3, 2)
    assert(three.size == 3 && three.contains((4L, 50.0)))
  }

  test("ev_lttb key: per-type output equals reference over the daily series") {
    val daily = graft.sources.Tables.events(spark, TestSpark.Sf)
      .groupBy($"event_type",
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum($"value".cast("decimal(38,6)")).cast("double").as("rev"))
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
    val got = Events.lttbDownsample(spark, TestSpark.Sf)
      .select($"event_type", $"idx", $"day", $"rev")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    assert(got.keySet == daily.keySet)
    got.foreach { case (tpe, pts) =>
      assert(pts == refLttb(daily(tpe), 24), s"type $tpe")
    }
  }
}
