package graft

import graft.plans.DateRangeRewrite
import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions for the engine — activate with
  * `spark.sql.extensions=graft.GraftExtensions` (done by Verify/Bench
  * and the test session). Currently injects [[DateRangeRewrite]]; the
  * natural home for future planner strategies. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => DateRangeRewrite)
}
