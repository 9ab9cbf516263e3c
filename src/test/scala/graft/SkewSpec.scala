package graft

import graft.operators.Skew
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, TestSpark.Sf)
      .select($"l_orderkey", $"l_linenumber", $"l_suppkey")
    val s = Tables.supplier(spark, TestSpark.Sf)
      .select($"s_suppkey".as("l_suppkey"), $"s_name")
    val plain = li.join(s, Seq("l_suppkey"), "inner")
      .select("l_orderkey", "l_linenumber", "s_name")
      .as[(Long, Int, String)].collect().sorted
    val salted = Skew.saltedJoin(li, s, "l_suppkey",
        saltBy = $"l_orderkey" * 10 + $"l_linenumber", factor = 7)
      .select("l_orderkey", "l_linenumber", "s_name")
      .as[(Long, Int, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("salt spreads a single hot key across all buckets") {
    val hot = Seq.tabulate(1000)(i => (1L, i.toLong)).toDF("key", "row_id")
    val buckets = hot
      .withColumn("__salt", pmod(xxhash64($"row_id"), lit(7)))
      .select("__salt").distinct().count()
    assert(buckets == 7)
  }

  test("zipf hot key: AQE skew-split fires, salted join matches plain head-to-head") {
    // separate session: thresholds lowered so fixture-scale data shows
    // the same skew mechanics a 100 TB hot key would
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2048")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2048")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    import s2.implicits._
    // zipf-ish: half the rows share key 0, the rest spread over 1..100
    val big = s2.range(20000).select(
      when($"id" % 2 === 0, 0L)
        .otherwise(pmod(xxhash64($"id"), lit(100)) + 1).as("key"),
      $"id".as("row_id"))
    val small = s2.range(101).select($"id".as("key"),
      concat(lit("v"), $"id").as("v"))
    val joined = big.join(small, "key").select("row_id", "v")
    // collect on THIS dataset so its own AQE plan reaches the final state
    // (.as[...] would wrap a fresh, never-executed QueryExecution)
    val plain = joined.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(plain.size == 20000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"AQE skew split did not fire:\n$plan")
    val salted = Skew.saltedJoin(big, small, "key", $"row_id", 8)
      .select("row_id", "v").as[(Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("graft_dot is available as plain SQL via session extensions") {
    val v = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .as[Double].head()
    assert(v == 11.0)
  }
}
