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

  test("graft_dot is available as plain SQL via session extensions") {
    val v = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .as[Double].head()
    assert(v == 11.0)
  }
}
