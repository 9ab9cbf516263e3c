package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: execute one query key at a given SF dir (default sf0.1) and
  * dump its final (post-AQE) physical plan — the `.explain` companion to
  * [[PlanAudit]]'s red-flag sweep, for single-query plan iteration. */
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
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
