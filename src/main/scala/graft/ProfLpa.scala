package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for cur_communities (not part of the
  * library surface; same pattern as ProfIvf/ProfPq). */
object ProfLpa {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val items = t("items distinct + checkpoint") {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pid"))
        .distinct()
        .repartition(32, col("ok"))
        .localCheckpoint()
    }
    val e = t("pair join + distinct + ckpt") {
      items.select(col("ok"), col("pid").as("u"))
        .join(items.select(col("ok"), col("pid").as("v")), "ok")
        .filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct()
        .localCheckpoint()
    }
    val und = t("union both directions") {
      e.select(col("u").as("src"), col("v").as("dst"))
        .union(e.select(col("v").as("src"), col("u").as("dst")))
        .localCheckpoint()
    }
    println(s"und rows: ${und.count()}")
    var labels = t("initial labels") {
      und.select(col("src").as("id")).distinct()
        .withColumn("lbl", col("id")).localCheckpoint()
    }
    (1 to 10).foreach { r =>
      val next = t(s"round $r mode+checkpoint") {
        und.join(broadcast(labels.withColumnRenamed("id", "dst")), "dst")
          .groupBy(col("src").as("id"))
          .agg(mode(col("lbl"), deterministic = true).as("lbl"))
          .localCheckpoint()
      }
      val changed = t(s"round $r fixpoint check") {
        next.as("n").join(labels.as("o"), col("n.id") === col("o.id"))
          .filter(col("n.lbl") =!= col("o.lbl")).count()
      }
      println(s"round $r changed=$changed")
      labels = next
    }
    spark.stop()
  }
}
