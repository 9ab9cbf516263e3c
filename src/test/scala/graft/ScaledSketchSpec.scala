package graft

import graft.operators.Pipeline
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch error bounds asserted where they are HARDEST — a ×10 corpus —
  * instead of only at fixture scale (r16 verdict item 6, the substring
  * planting discipline applied to the quantile sketches): KLL and
  * Greenwald-Khanna compaction run DEEPER as n grows, so a bound that
  * holds at 6k rows is not yet evidence it holds under real compaction
  * pressure. The spec builds its own ×10 lineitem (10 key-shifted
  * replicas of the fixture — the make_sfx.py scaling model, so exact
  * rank percentiles are computable on the spot) and re-asserts the
  * SAME rank-error windows the fixture-scale PipelineSpec pins,
  * including the ALL row computed purely from merged sketch blobs. */
class ScaledSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** ×10 lineitem dir: 10 shifted replicas of the sf0.001 fixture. */
  private lazy val x10Dir: String = {
    val src = Tables.lineitem(spark, TestSpark.Sf)
    val maxKey = src.agg(max(col("l_orderkey"))).as[Long].head() + 1
    val reps = (0 until 10).map(i =>
      src.withColumn("l_orderkey", col("l_orderkey") + lit(i * maxKey)))
    val d = java.nio.file.Files.createTempDirectory("graft-x10li").toString
    reps.reduce(_ unionByName _).write.mode("overwrite")
      .parquet(s"$d/lineitem.parquet")
    d
  }

  test("x_kll_quantile_rollup: rank bounds hold at x10, including merged ALL") {
    val li = Tables.lineitem(spark, x10Dir)
    val rows = Pipeline.kllRollup(spark, x10Dir)
      .as[(String, Long, Double)].collect()
    val flags = rows.filter(_._1 != "ALL")
    assert(flags.nonEmpty && rows.exists(_._1 == "ALL"))
    assert(rows.find(_._1 == "ALL").get._2 == li.count(),
      "ALL n_rows is exact and must equal the x10 table size")
    rows.foreach { case (flag, nRows, p50) =>
      val slice = if (flag == "ALL") li else li.filter(col("l_returnflag") === flag)
      assert(nRows == slice.count(), s"$flag n_rows must stay exact at x10")
      // same ±5% rank window as the fixture-scale pin (KLL k=200 →
      // ~1.65% normalized rank error; the x10 corpus forces real
      // compaction depth, which is what this spec adds)
      val b = slice.select(expr(
        "percentile(cast(l_extendedprice as double), array(0.45, 0.55))"))
        .as[Seq[Double]].head()
      assert(p50 >= b(0) && p50 <= b(1), s"$flag x10 median $p50 outside $b")
    }
  }

  test("x_approx_quantiles: rank bounds hold at x10") {
    val li = Tables.lineitem(spark, x10Dir)
    val approx = Pipeline.approxQuantiles(spark, x10Dir)
      .selectExpr("l_returnflag", "cast(p25 as double)", "cast(p50 as double)",
        "cast(p75 as double)")
      .as[(String, Double, Double, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (flag, p25, p50, p75) =>
      assert(p25 <= p50 && p50 <= p75, s"quantiles out of order for $flag at x10")
      val b = li.filter(col("l_returnflag") === flag)
        .select(expr("percentile(cast(l_extendedprice as double), " +
          "array(0.20, 0.30, 0.45, 0.55, 0.70, 0.80))"))
        .as[Seq[Double]].head()
      assert(p25 >= b(0) && p25 <= b(1), s"p25 outside x10 rank bound for $flag")
      assert(p50 >= b(2) && p50 <= b(3), s"p50 outside x10 rank bound for $flag")
      assert(p75 >= b(4) && p75 <= b(5), s"p75 outside x10 rank bound for $flag")
    }
  }
}
