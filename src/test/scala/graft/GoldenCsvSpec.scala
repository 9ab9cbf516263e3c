package graft

import graft.sources.SsbCsv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression goldens (the reference's correctness style, README.md:413-438:
  * pinned scalar answers) + the CSV schema-on-read ingestion surface. */
class GoldenCsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Q1 flight golden answers at sf0.001 (regression pins)") {
    def rev(q: String): Double =
      SparkEntry.queries(q)(spark, TestSpark.Sf).as[Double].head()
    // pinned from the verified round-1 run (hash-matched vs DuckDB)
    assert(rev("ssb_q1_1") == 154367.7186)
    assert(rev("ssb_q1_2") == 5036.3004)
    assert(rev("ssb_q1_3") == 6502.947)
  }

  test("yearly revenue goldens: totals and row counts per ship year") {
    val got = SparkEntry.queries("ssb_yearly_revenue")(spark, TestSpark.Sf)
      .as[(Long, Double, Long)].collect().toSeq
    val want = Seq(
      (1995L, 2271846.826, 837L), (1996L, 2576445.2488, 929L),
      (1997L, 2226991.4563, 885L), (1998L, 2174947.0057, 836L),
      (1999L, 2321399.4112, 875L), (2000L, 2467629.2377, 907L),
      (2001L, 2054657.9671, 731L))
    assert(got == want)
  }

  test("SSB CSV ingestion: dbgen-shaped .tbl round-trips with declared types") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val tbl = dir.resolve("lineorder.tbl")
    java.nio.file.Files.writeString(tbl,
      """1|1|101|201|301|1996-01-02|5-LOW|0|17|2116823|17366619|4|2032150|74711|2|1996-02-10|TRUCK
        |1|2|101|202|302|1996-01-02|5-LOW|0|36|4598316|17366619|9|4184467|76638|6|1996-03-01|MAIL
        |2|1|102|203|303|1993-06-10|1-URGENT|0|8|1330960|4692918|10|1197864|99822|2|1993-08-01|RAIL
        |""".stripMargin)
    val df = SsbCsv.read(spark, "lineorder", tbl.toString)
    assert(df.count() == 3)
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      SsbCsv.lineorderSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    // reference Q1.1 semantics on the CSV rows: integer money widens to long
    val rev = df.filter(year($"LO_ORDERDATE") === 1996 &&
        $"LO_DISCOUNT".between(4, 6) && $"LO_QUANTITY" < 25)
      .agg(sum($"LO_EXTENDEDPRICE" * $"LO_DISCOUNT")).as[Long].head()
    assert(rev == 2116823L * 4)
    // key columns read as longs (UInt32 -> LongType mapping, SURVEY §1.2)
    assert(df.select(max($"LO_ORDERKEY")).as[Long].head() == 2L)
  }

  test("malformed CSV rows are quarantined, not silently mangled") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badcsv")
    val f = dir.resolve("supplier.tbl")
    java.nio.file.Files.writeString(f,
      """1|Supplier#1|addr|CITY|NATION|REGION|phone
        |not_a_number|broken row
        |2|Supplier#2|addr|CITY|NATION|REGION|phone
        |""".stripMargin)
    import org.apache.spark.sql.types._
    val withCorrupt = StructType(SsbCsv.supplierSchema.fields :+
      StructField("_corrupt_record", StringType))
    val df = spark.read.schema(withCorrupt)
      .option("header", "false").option("sep", "|")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(f.toString).cache()
    try {
      assert(df.filter($"_corrupt_record".isNotNull).count() == 1)
      assert(df.filter($"_corrupt_record".isNull).count() == 2)
      assert(df.filter($"S_SUPPKEY" === 2L).count() == 1)
    } finally df.unpersist()
  }

  test("CSV write sink round-trip preserves values") {
    val out = java.nio.file.Files.createTempDirectory("graft-csv-out").toString
    val orig = graft.sources.Tables.nation(spark, TestSpark.Sf)
    orig.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(orig.schema).csv(out)
    assert(back.as[(Int, String, Int)].collect().toSet ==
      orig.as[(Int, String, Int)].collect().toSet)
  }
}
