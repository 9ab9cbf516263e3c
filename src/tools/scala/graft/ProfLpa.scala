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
      .config("spark.sql.autoBroadcastJoinThreshold", "10MB")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    if (args.lift(1).contains("kcore")) { profKcore(spark, dir); spark.stop(); return }
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
    val nNodes = labels.count()
    var frontier: Option[(org.apache.spark.sql.DataFrame, Long)] = None
    var done = false
    (1 to 10).foreach { r => if (!done) {
      val full = frontier.forall(_._2 * 2 > nNodes)
      val scoreEdges = t(s"round $r score-edges (full=$full)") {
        if (full) und
        else {
          val (f, _) = frontier.get
          val aff = und
            .join(broadcast(f.select(col("id").as("dst"))), Seq("dst"), "left_semi")
            .select(col("src")).distinct().localCheckpoint()
          und.join(broadcast(aff), Seq("src"), "left_semi")
        }
      }
      val voted = scoreEdges
        .join(broadcast(labels.withColumnRenamed("id", "dst")), "dst")
        .repartition(32, col("src"))
        .groupBy(col("src").as("id"))
        .agg(mode(col("lbl"), deterministic = true).as("nlbl"))
      if (full) {
        val next = t(s"round $r voted ckpt") {
          voted.select(col("id"), col("nlbl").as("lbl")).localCheckpoint()
        }
        val changedIds = t(s"round $r diff ckpt") {
          next.hint("shuffle_hash")
            .join(labels.withColumnRenamed("lbl", "olbl"), "id")
            .filter(col("lbl") =!= col("olbl"))
            .select(col("id")).localCheckpoint()
        }
        val nChanged = changedIds.count()
        println(s"round $r changed=$nChanged")
        labels = next
        if (nChanged == 0) done = true
        else frontier = Some((changedIds, nChanged))
      } else {
        val changed = t(s"round $r changed ckpt") {
          voted.hint("shuffle_hash").join(labels, "id")
            .filter(col("nlbl") =!= col("lbl"))
            .select(col("id"), col("nlbl")).localCheckpoint()
        }
        val nChanged = changed.count()
        println(s"round $r changed=$nChanged")
        if (nChanged == 0) done = true
        else {
          labels = t(s"round $r labels update") {
            labels.join(broadcast(changed), Seq("id"), "left")
              .select(col("id"), coalesce(col("nlbl"), col("lbl")).as("lbl"))
              .localCheckpoint()
          }
          frontier = Some((changed.select(col("id")), nChanged))
        }
      }
    } }
    spark.stop()
  }

  /** Phase profile of the kcore peel (mirrors Curation.kcoreOf). */
  private def profKcore(spark: SparkSession, dir: String): Unit = {
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pid")).distinct()
    val e = items.select(col("ok"), col("pid").as("u"))
      .join(items.select(col("ok"), col("pid").as("v")), "ok")
      .filter(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
    val und = t("edges") {
      e.select(col("u").as("src"), col("v").as("dst"))
        .union(e.select(col("v").as("src"), col("u").as("dst")))
        .localCheckpoint()
    }
    val hist = t("degree histogram") {
      und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .groupBy(col("deg")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("deg")).collect()
    }
    val total = hist.map(_.getLong(1)).sum
    var cum = 0L; var median = 0L; var i = 0; var found = false
    while (i < hist.length && !found) {
      cum += hist(i).getLong(1)
      if (cum * 2L >= total) { median = hist(i).getLong(0); found = true }
      i += 1
    }
    val k = median * 3L / 5L
    println(s"median=$median k=$k")
    var core = und
    var nEdges = core.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < 30) {
      val next = t(s"round $rounds peel") {
        val keep = core.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k).select(col("src").as("id"))
        core.join(broadcast(keep.select(col("id").as("src"))), Seq("src"), "left_semi")
          .join(broadcast(keep.select(col("id").as("dst"))), Seq("dst"), "left_semi")
          .localCheckpoint()
      }
      val n = t(s"round $rounds count")(next.count())
      println(s"round $rounds edges=$n")
      converged = n == nEdges
      nEdges = n
      core = next
      rounds += 1
    }
  }
}
