package graft

import graft.operators.{Events, Relational}
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the rows-only HLL query keys: `rel_approx_distinct`
  * and `ev_approx_users` have no DuckDB oracle (sketch internals
  * differ across engines), so this spec pins each estimate within
  * error bounds of its EXACT twin computed on the same fixture.
  * Spark's approx_count_distinct is HLL++ with a fixed hash — the
  * estimate is deterministic, so the bound cannot flake. rsd is 0.02;
  * 5× that (min 2 absolute) is a generous, stable ceiling. */
class ApproxInvariantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def within(approx: Long, exact: Long, what: String): Unit = {
    val slack = math.max(2.0, 0.10 * exact)
    assert(math.abs(approx - exact) <= slack,
      s"$what: approx $approx vs exact $exact (slack $slack)")
  }

  test("rel_approx_distinct estimates sit within rsd bounds of rel_distinct_exact") {
    val exact = Relational.distinctExact(spark, TestSpark.Sf).collect()(0)
    val approx = Relational.approxDistinct(spark, TestSpark.Sf).collect()(0)
    within(approx.getAs[Long]("approx_parts"), exact.getAs[Long]("n_parts"), "parts")
    within(approx.getAs[Long]("approx_orders"), exact.getAs[Long]("n_orders"), "orders")
  }

  test("ev_approx_users estimates sit within rsd bounds of exact per-type distincts") {
    val exact = Events.typeStats(spark, TestSpark.Sf)
      .select($"event_type", $"n_users").as[(String, Long)].collect().toMap
    val approx = Events.approxUsers(spark, TestSpark.Sf)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet, "per-type key sets must agree")
    assert(approx.nonEmpty)
    approx.foreach { case (t, est) => within(est, exact(t), s"type $t") }
  }
}
