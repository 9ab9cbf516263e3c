package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev profiling for cur_triangles stage costs (not part of the surface). */
object ProfTri {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime; val r = f
      println(f"PROF $tag%-22s ${(System.nanoTime - t0) / 1e9}%8.2f s  $r")
    }
    import graft.sources.Tables
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val items = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pid")).distinct()
      val ePlan = items.select(col("ok"), col("pid").as("u"))
        .join(items.select(col("ok"), col("pid").as("v")), "ok")
        .filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()
      var e: org.apache.spark.sql.DataFrame = null
      time("edges+checkpoint") { e = ePlan.localCheckpoint(); e.rdd.getNumPartitions }
      val deg = e.select(explode(array(col("u"), col("v"))).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val withDeg = e
        .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      val orientedPlan = withDeg.select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"),
        greatest(col("du"), col("dv")).as("ddeg"))
      var oriented: org.apache.spark.sql.DataFrame = null
      time("oriented+checkpoint") { oriented = orientedPlan.localCheckpoint(); oriented.rdd.getNumPartitions }
      val x = oriented.repartition(32, col("src"))
        .select(col("src"), col("dst").as("v"), col("ddeg").as("vd"))
      val y = oriented
        .select(col("src"), col("dst").as("w"), col("ddeg").as("wd"))
      val wedges = x.join(broadcast(y), Seq("src"))
        .filter(col("vd") < col("wd") ||
          (col("vd") === col("wd") && col("v") < col("w")))
        .selectExpr("shiftleft(v, 32) | w as pk")
      time("wedges count") { wedges.count() }
      val nTri = wedges.join(
          broadcast(oriented.selectExpr("shiftleft(src, 32) | dst as pk")),
          Seq("pk"), "left_semi")
        .agg(count(lit(1)).as("n_triangles"))
      time("semi+count") { nTri.collect().head.getLong(0) }
    }
    spark.stop()
  }
}
