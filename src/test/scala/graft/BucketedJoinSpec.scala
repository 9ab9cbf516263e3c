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

  test("x_star_bucketed: order-keyed aggregate over the join plans with zero Exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Bucketed.orderRevenue(spark, TestSpark.Sf)
      val rows = df.collect() // AQE finalizes the plan on execution
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-aligned aggregate still shuffles:\n$plan")
      // hash-parity with the same aggregate over the raw (unbucketed) tables
      import org.apache.spark.sql.functions._
      val li = graft.sources.Tables.lineitem(spark, TestSpark.Sf)
      val o = graft.sources.Tables.orders(spark, TestSpark.Sf)
      val expected = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
            .cast("double").as("revenue"))
        .collect()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(rows.map(key).toSet == expected.map(key).toSet,
        "bucketed and unbucketed aggregates must agree value-exact")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    }
  }
}
