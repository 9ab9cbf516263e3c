package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        def n(s: String) = s.r.findAllIn(p).length
        val flags = Seq(
          "shuffles" -> n("ShuffleExchange|Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition"),
          "cartesian" -> n("CartesianProduct"),
          "bnlj" -> n("BroadcastNestedLoopJoin"),
          "udf" -> n("BatchEvalPython|ScalaUDF"))
        println(f"$name%-24s ${flags.map{case(k,v)=>s"$k=$v"}.mkString(" ")}")
      } catch { case e: Throwable => println(s"$name AUDIT-FAIL ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
