package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one warmup pass per query (JIT +
  * whole-stage-codegen compilation + page-cache warm), then
  * SPARK_GRAFT_REPS timed passes (default 3), reported as ONE JSON line
  * with the per-query MEDIAN. A query that throws is reported as -1 in
  * `queries` with its message in `errors`, and excluded from the total
  * — a crash must never masquerade as a fast green run.
  * Set SPARK_GRAFT_BENCH_WARMUP=0 to time cold runs instead. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // let AQE coalesce below the parallelism floor: at bench SFs the
      // shuffles are far under one advisory partition, and 32 near-empty
      // tasks per stage cost more than the work itself (at production SF
      // partitions hit the advisory size and none of this kicks in)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    if (warmup) queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val results = queries.map { case (name, fn) =>
      val times = Vector.newBuilder[Double]
      var err: Option[String] = None
      (1 to reps).foreach { _ =>
        if (err.isEmpty) {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            err = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          }
        }
      }
      val ts = times.result().sorted
      val median = if (ts.isEmpty) -1.0 else ts(ts.size / 2)
      (name, median, err)
    }
    val qs = results.map { case (k, v, _) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
      s""""warmed":$warmup,"queries":$qs,"errors":$errs,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
