package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DateRangeRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def li = Tables.lineitem(spark, TestSpark.Sf)

  test("year(ts) = y becomes a pushed timestamp range") {
    val df = li.filter(year($"l_shipdate") === 1996)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("year("), s"year() survived:\n$optimized")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThanOrEqual(l_shipdate"),
      s"range not pushed to scan:\n$physical")
  }

  test("rewrite preserves results exactly (year filter)") {
    val withRule = li.filter(year($"l_shipdate") === 1996).count()
    val manual = li.filter(
      $"l_shipdate" >= to_timestamp(lit("1996-01-01")) &&
      $"l_shipdate" < to_timestamp(lit("1997-01-01"))).count()
    val reference = li.collect()
      .count(r => r.getAs[java.time.LocalDateTime](10).getYear == 1996)
    assert(withRule == manual)
    assert(withRule == reference)
    assert(withRule > 0)
  }

  test("yyyymm composite becomes a one-month range, results identical") {
    val df = li.filter((year($"l_shipdate") * 100 + month($"l_shipdate")) === 199604)
    assert(!df.queryExecution.optimizedPlan.toString.contains("year("))
    val reference = li.collect().count { r =>
      val d = r.getAs[java.time.LocalDateTime](10)
      d.getYear == 1996 && d.getMonthValue == 4
    }
    assert(df.count() == reference)
    assert(reference > 0)
  }

  test("december yyyymm rolls the upper bound into the next year") {
    val df = li.filter((year($"l_shipdate") * 100 + month($"l_shipdate")) === 199612)
    val reference = li.collect().count { r =>
      val d = r.getAs[java.time.LocalDateTime](10)
      d.getYear == 1996 && d.getMonthValue == 12
    }
    assert(df.count() == reference)
  }

  test("non-matching year predicates are left alone") {
    // inequality is not rewritten (only equality is sargable this way)
    val df = li.filter(year($"l_shipdate") > 1996)
    val reference = li.collect()
      .count(r => r.getAs[java.time.LocalDateTime](10).getYear > 1996)
    assert(df.count() == reference)
  }

  test("out-of-range year literals fall back to the original predicate") {
    // would throw DateTimeException/ArithmeticException mid-optimization
    // if the rewrite ran; must instead plan fine and return zero rows
    assert(li.filter(year($"l_shipdate") === Int.MaxValue).count() == 0)
    assert(li.filter(year($"l_shipdate") === 0).count() == 0)
    assert(li.filter((year($"l_shipdate") * 100 + month($"l_shipdate")) ===
      Int.MaxValue).count() == 0)
  }

  test("date-typed column path also rewrites") {
    val d = li.select(to_date($"l_shipdate").as("d"))
    val df = d.filter(year($"d") === 1996)
    assert(!df.queryExecution.optimizedPlan.toString.contains("year("))
    val reference = d.as[java.sql.Date].collect()
      .count(_.toLocalDate.getYear == 1996)
    assert(df.count() == reference)
  }
}
