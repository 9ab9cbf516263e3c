package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfPr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime; f
      println(f"PROF $tag%-20s ${(System.nanoTime-t0)/1e9}%8.2f s")
    }
    import graft.sources.Tables
    for (_ <- 1 to 2) {
      val li = Tables.lineitem(spark, dir)
      val items = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pid")).distinct()
      val a = items.select(col("ok"), col("pid").as("src"))
      val b = items.select(col("ok"), col("pid").as("dst"))
      val edgesPlan = a.join(b, "ok").filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct()
      var edges: org.apache.spark.sql.DataFrame = null
      time("edges+checkpoint") { edges = edgesPlan.localCheckpoint() }
      val degree = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      var withDeg: org.apache.spark.sql.DataFrame = null
      time("withDeg+checkpoint") { withDeg = edges.join(degree, "src").repartition(col("src")).localCheckpoint() }
      println("withDeg partitions: " + withDeg.rdd.getNumPartitions)
      var nodes: org.apache.spark.sql.DataFrame = null
      time("nodes") { nodes = edges.select(col("src").as("id")).distinct().localCheckpoint() }
      var ranks = nodes.select(col("id"), lit(1000000000000L).as("rank"))
      for (i <- 1 to 5) {
        time(s"round $i") {
          val contribs = withDeg.join(broadcast(ranks), col("src") === col("id"))
            .select(col("dst").as("id"), expr("rank div deg").as("c"))
            .groupBy(col("id")).agg(sum(col("c")).as("s"))
          ranks = nodes.join(broadcast(contribs), Seq("id"), "left")
            .select(col("id"), (lit(150000000000L) + expr("85 * coalesce(s, 0L) div 100")).as("rank"))
            .localCheckpoint()
        }
      }
    }
    spark.stop()
  }
}
