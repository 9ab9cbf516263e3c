package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: execute one query key at a given SF dir (default sf0.1) and
  * dump its physical plan — the `.explain` companion to [[PlanAudit]]'s
  * red-flag sweep, for single-query plan iteration and the
  * per-round `plans/` before/after artifacts.
  *
  * Prints the `.explain("formatted")` rendering (operator list +
  * details: PushedFilters, ReadSchema, join build sides, exchange
  * partitioning) taken AFTER execution so AQE shows the FINAL plan
  * (`isFinalPlan=true`), then the executed-plan tree string (the
  * post-AQE operator tree with reused-exchange markers). */
object Explain1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark,
      args.lift(1).getOrElse("/root/testdata/sf0.1"))
    df.collect()
    println(s"== explain formatted (post-execution, AQE final) ==")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println(s"== executed plan tree ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
