package graft

import graft.operators.Extras
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `x_bloom_join` = Bloom-filter semi-join reduction. Result
  * correctness is the oracle gate's job; this suite pins the two
  * things the gate cannot see: the PLAN (the might_contain filter must
  * sit on the fact side BELOW the equi-join, or nothing was reduced)
  * and the reduction itself (the filter passes the true matches and
  * rejects most non-matching fact rows at the documented ~1% fp). */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("might_contain prunes the fact side below the join") {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // walk the physical tree (through AQE wrappers), not its toString —
    // print order is not containment
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      p +: kids.flatMap(flatten)
    }
    def isBloomFilter(p: SparkPlan): Boolean = p match {
      case f: FilterExec =>
        f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) &&
          f.output.exists(_.name == "o_custkey")
      case _ => false
    }
    val root = Extras.bloomJoin(spark, TestSpark.Sf)
      .queryExecution.executedPlan
    val joins = flatten(root).collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty, "no join node in plan")
    // the bloom FilterExec must sit in a join child's subtree, on the
    // side that carries the fact (orders) columns
    assert(joins.exists(_.children.exists(c => flatten(c).exists(isBloomFilter))),
      "might_contain FilterExec not found on the fact side below a join")
  }

  test("bloom-reduced join equals the plain join") {
    val got = Extras.bloomJoin(spark, TestSpark.Sf)
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    val cust = Tables.customer(spark, TestSpark.Sf)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val want = Tables.orders(spark, TestSpark.Sf)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(38,6)")).cast("double").as("rev"))
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("the bitmap rejects nearly all non-members (fp rate within spec)") {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val members = spark.range(0, 10000).select(col("id"))
    val bloomAgg = GraftBridge.column(
      BloomFilterAggregate(
        GraftBridge.expression(xxhash64(col("id"))),
        Literal(1000000L), Literal(8L * 1024 * 1024), 0, 0)
        .toAggregateExpression())
    val bf = members.agg(bloomAgg.as("bf"))
    def contains(probe: org.apache.spark.sql.DataFrame): Long = {
      val mc = GraftBridge.column(BloomFilterMightContain(
        ScalarSubquery(GraftBridge.planOf(bf)),
        GraftBridge.expression(xxhash64(col("id")))))
      probe.where(mc).count()
    }
    // zero false negatives: every member passes
    assert(contains(members) == 10000L)
    // non-members 10k..110k: fp rate must be far under 1%
    val fp = contains(spark.range(10000, 110000).select(col("id")))
    assert(fp < 1000L, s"false-positive count $fp out of 100k probes")
  }
}
