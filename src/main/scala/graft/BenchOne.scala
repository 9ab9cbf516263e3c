package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time individual queries by name (args), or all when no
  * args. Same session config as [[Bench]]; prints per-rep seconds so
  * plan-vs-execution costs are visible while iterating. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // Production-scale note: Spark's default 10 MB broadcast threshold is
    // sized for small executors; once dimensions outgrow it the star
    // degrades to shuffle joins (measured: ssb_q4_profit ~100-160x at x100
    // data). A real cluster sizes this with executor memory.
    val bcMb = sys.env.getOrElse("SPARK_GRAFT_BROADCAST_MB", "10")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", s"${bcMb}MB")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"$name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
