package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth beyond the fixture parquet and the
  * reference's headerless CSV (GoldenCsvSpec): JSON and ORC round-trips
  * through the same schema-on-read contract — a reference user's other
  * two common landing formats. Equality checks use exact counters and
  * decimal sums (order-independent), so they hold under any
  * read-partitioning. */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("JSON lines round-trip with explicit schema (no inference pass)") {
    val out = tmp("graft-json")
    val ev = Tables.events(spark, TestSpark.Sf)
      .select($"event_id", $"user_id", $"event_type", $"value",
        unix_micros($"ts").as("ts_us"))
    ev.write.mode("overwrite").json(out)
    val schema = StructType.fromDDL(
      "event_id long, user_id long, event_type string, value double, ts_us long")
    val re = spark.read.schema(schema).json(out)
    assert(re.count() == ev.count())
    def sig(df: org.apache.spark.sql.DataFrame) = df.agg(
      sum($"event_id"), sum($"user_id"), sum($"ts_us"),
      sum($"value".cast(DecimalType(38, 6))),
      countDistinct($"event_type")).collect()(0).toSeq
    assert(sig(re) == sig(ev))
  }

  test("ORC round-trip preserves schema and exact contents") {
    val out = tmp("graft-orc")
    val li = Tables.lineitem(spark, TestSpark.Sf)
    li.write.mode("overwrite").orc(out)
    val re = spark.read.orc(out)
    assert(re.schema == li.schema, "ORC must carry the full Spark schema")
    assert(re.count() == li.count())
    val cols = Seq(sum($"l_orderkey"), sum($"l_quantity".cast(DecimalType(38, 6))),
      sum($"l_extendedprice".cast(DecimalType(38, 6))), countDistinct($"l_returnflag"))
    assert(re.agg(cols.head, cols.tail: _*).collect()(0).toSeq ==
      li.agg(cols.head, cols.tail: _*).collect()(0).toSeq)
  }
}
