package graft

import graft.functions.VectorOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scratch stage-profiler for sim_topk_ivf (dev-only; run via
  * `runMain graft.ProfIvf`). Times Lloyd vs the final
  * assignment+probe+rerank, and reports recall at 0/1/2 Lloyd
  * iterations so the iteration count is evidence, not folklore. */
object ProfIvf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    Tables.embeddings(spark, dir).count()
    val c = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), VectorOps.norm("embedding").as("nrm"))
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val stride = graft.operators.Similarity.ivfStride(c.count())
      time("lloyd 2 iters total")(
        graft.operators.Similarity.lloydCentroids(spark, c, 2, stride))
      time("lloyd 0 iters (seed collect only)")(
        graft.operators.Similarity.lloydCentroids(spark, c, 0, stride))
      time("full query count")(graft.operators.Similarity.topKIvf(spark, dir).count())
    }
    // recall at each iteration count, vs brute force ground truth
    import spark.implicits._
    val gt = graft.operators.Similarity.topKBruteForce(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    (0 to 2).foreach { iters =>
      val got = time(s"ivf iters=$iters")(
        graft.operators.Similarity.topKIvfIters(spark, dir, iters)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet)
      println(f"[prof] iters=$iters recall=${(got & gt).size.toDouble / gt.size}%.2f")
    }
    spark.stop()
  }
}
