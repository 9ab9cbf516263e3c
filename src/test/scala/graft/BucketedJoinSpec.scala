package graft

import graft.plans.Bucketed
import org.scalatest.funsuite.AnyFunSuite

/** The scale story for the star build's fact-to-fact join: co-bucketed
  * tables join with zero Exchange (and zero Sort) in the plan. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("co-bucketed fact join plans without any shuffle") {
    Bucketed.materialize(spark, TestSpark.Sf)
    // force a non-broadcast join so the distribution requirement is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketed.join(spark)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // row parity with the unbucketed join
      val li = graft.sources.Tables.lineitem(spark, TestSpark.Sf)
      val o = graft.sources.Tables.orders(spark, TestSpark.Sf)
      val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    }
  }
}
