package graft

import graft.operators.Extras
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of `x_zorder_layout` is data skipping: with files laid
  * out along the Morton curve, per-file min/max footer stats are tight
  * on BOTH probe dimensions, so single-dimension predicates prune most
  * files regardless of which dimension they hit. This suite MEASURES
  * that claim on the fixture (correctness of the bucket stats
  * themselves is the oracle gate's job):
  *
  *  - a 90-day date probe and a ⅛-keyspace customer probe must each
  *    prune ≥ 60% of the 64 z-buckets (measured: 78% / 75%);
  *  - the custkey-sorted baseline layout — same ntile granularity,
  *    single-column order — must prune ≈ nothing for the date probe,
  *    and strictly less than the z layout (measured: 0%);
  *  - bucket row counts partition the table (no row lost or double-
  *    counted by the layout).
  */
class ZorderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class B(bucket: Long, n: Long, minD: Long, maxD: Long,
      minC: Long, maxC: Long)

  private lazy val zBuckets: Seq[B] =
    Extras.zorderLayout(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .map(t => B(t._1, t._2, t._3, t._4, t._5, t._6))

  /** Same 64-file equal-frequency layout, ordered by custkey alone —
    * the single-column-sort strawman every z-order pitch is measured
    * against. */
  private lazy val ckBuckets: Seq[B] = {
    val o = graft.sources.Tables.orders(spark, TestSpark.Sf)
      .select(expr("cast(unix_date(to_date(o_orderdate)) as bigint)").as("d"),
        col("o_custkey").cast("long").as("ck"))
    o.withColumn("bucket",
        ntile(64).over(Window.orderBy(col("ck"), col("d"))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("d")).as("min_d"), max(col("d")).as("max_d"),
        min(col("ck")).as("min_c"), max(col("ck")).as("max_c"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .map(t => B(t._1, t._2, t._3, t._4, t._5, t._6))
  }

  private def prunedFrac(bs: Seq[B], lo: Long, hi: Long,
      min: B => Long, max: B => Long): Double =
    bs.count(b => max(b) < lo || min(b) >= hi).toDouble / bs.size

  test("z layout: both single-dimension probes prune most buckets") {
    val dLo = zBuckets.map(_.minD).min
    val dHi = zBuckets.map(_.maxD).max
    val cLo = zBuckets.map(_.minC).min
    val cHi = zBuckets.map(_.maxC).max
    val d0 = dLo + (dHi - dLo) / 2
    val c0 = cLo + (cHi - cLo) / 2
    val dateProbe = prunedFrac(zBuckets, d0, d0 + 90, _.minD, _.maxD)
    val custProbe =
      prunedFrac(zBuckets, c0, c0 + math.max(1L, (cHi - cLo) / 8), _.minC, _.maxC)
    assert(dateProbe >= 0.6, s"date probe pruned only $dateProbe")
    assert(custProbe >= 0.6, s"cust probe pruned only $custProbe")
  }

  test("custkey-sorted layout cannot prune the date probe; z layout can") {
    val dLo = ckBuckets.map(_.minD).min
    val dHi = ckBuckets.map(_.maxD).max
    val d0 = dLo + (dHi - dLo) / 2
    val ckDate = prunedFrac(ckBuckets, d0, d0 + 90, _.minD, _.maxD)
    val zDate = prunedFrac(zBuckets, d0, d0 + 90, _.minD, _.maxD)
    assert(ckDate <= 0.05, s"single-column layout unexpectedly pruned $ckDate")
    assert(zDate > ckDate, s"z ($zDate) should beat custkey-sorted ($ckDate)")
  }

  test("distributed range-partitioned writer prunes like the ntile form") {
    val dist = Extras.zorderLayoutDistributed(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .map(t => B(t._1, t._2, t._3, t._4, t._5, t._6))
    assert(dist.map(_.n).sum ==
      graft.sources.Tables.orders(spark, TestSpark.Sf).count())
    val dLo = zBuckets.map(_.minD).min
    val dHi = zBuckets.map(_.maxD).max
    val d0 = dLo + (dHi - dLo) / 2
    val ntileFrac = prunedFrac(zBuckets, d0, d0 + 90, _.minD, _.maxD)
    val distFrac = prunedFrac(dist, d0, d0 + 90, _.minD, _.maxD)
    // sampled range boundaries vs exact ntile: same layout power
    // (allow a 15-point band for sampling wobble)
    assert(distFrac >= ntileFrac - 0.15,
      s"distributed $distFrac vs ntile $ntileFrac")
  }

  test("bucket counts partition the orders table") {
    val total = graft.sources.Tables.orders(spark, TestSpark.Sf).count()
    assert(zBuckets.map(_.n).sum == total)
    assert(zBuckets.size == 64 || total < 64, s"${zBuckets.size} buckets")
    // equal-frequency: ntile sizes differ by at most 1
    assert(zBuckets.map(_.n).max - zBuckets.map(_.n).min <= 1)
  }

  test("the layout plan has no unpartitioned window") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      p +: kids.flatMap(flatten)
    }
    val root = Extras.zorderLayout(spark, TestSpark.Sf)
      .queryExecution.executedPlan
    val bad = flatten(root)
      .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty,
      s"global-sort window in the layout plan: ${bad.headOption}")
  }
}
