package graft
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach(_ => spark.range(1).count()) // warm
    val ts = (1 to 21).map { _ =>
      val t0 = System.nanoTime(); spark.range(1).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[floor] median=${ts(10)}%.4f min=${ts.head}%.4f max=${ts.last}%.4f")
    spark.stop()
  }
}
