package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev experiment: below-gate pageRank round-loop shape A/B —
  * broadcast-state path (stateBroadcastMaxRows default) vs forced
  * giant path (co-partitioned shuffle-hash state joins, gate 0) at
  * several session shuffle widths. Wall + job counts per variant. */
object ExpPr {
  def main(args: Array[String]): Unit = {
    val width = args.headOption.getOrElse("32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.sources.Tables
    val li = Tables.lineitem(spark, dir)
    val items = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pid")).distinct()
    val a = items.select(col("ok"), col("pid").as("src"))
    val b = items.select(col("ok"), col("pid").as("dst"))
    val edges = a.join(b, "ok").filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    def prof(tag: String)(f: => Long): Unit = {
      f // warm
      var jobs = 0
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(l)
      println(f"EXP $tag%-28s jobs=$jobs%3d wall=$wall%6.2f s rows=$n")
    }
    prof(s"broadcast path w=$width") {
      graft.operators.Curation.pageRankOf(edges).count()
    }
    prof(s"giant path     w=$width") {
      graft.operators.Curation.pageRankOf(edges, stateBroadcastMaxRows = 0).count()
    }
    prof(s"giant+aqeOff   w=$width") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try graft.operators.Curation.pageRankOf(edges, stateBroadcastMaxRows = 0).count()
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    spark.stop()
  }
}
