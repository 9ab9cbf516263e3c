package graft.operators

import graft.QueryPack
import graft.plans.Star
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** SSB Q1-flight parity — the reference's three golden queries
  * (`/root/reference/README.md:413-438`), re-expressed on the fixture star
  * (FIXTURES.md §B value domains: years 1995–2001 and fractional
  * discounts, vs the reference's 1993/integer-percent domain).
  *
  * Numeric determinism: `sum(double)` is order-dependent, and the driver
  * hash-compares against a DuckDB run, so money aggregates cast each
  * product to `DECIMAL(38,6)` before summing — decimal addition is exact
  * and associative, making the result bit-identical across engines and
  * partitionings — then surface as DOUBLE. The same widening concern is
  * the reference's UInt32→UInt64 silent overflow (SURVEY.md §1.2).
  *
  * Scale posture: the Q1.x predicates touch only lineitem columns, so
  * Catalyst pushes them below all four star joins down to the parquet
  * scan; the single-group aggregate runs partial-per-partition before the
  * 1-row exchange. No driver-side work.
  */
object Ssb extends QueryPack {

  /** Exact-sum revenue: Σ decimal(extendedprice·discount), as double. */
  private def revenue: Column =
    sum((col("l_extendedprice") * col("l_discount")).cast(DecimalType(38, 6)))
      .cast(DoubleType).as("revenue")

  private val revenueSql =
    "CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue"

  private def q1(spark: SparkSession, dir: String, pred: Column): DataFrame =
    Star.build(spark, dir).filter(pred).agg(revenue)

  /** Q1.1 (`README.md:413-419`): year + discount band + quantity cap. */
  def q1_1(spark: SparkSession, dir: String): DataFrame =
    q1(spark, dir,
      year(col("l_shipdate")) === 1996 &&
      col("l_discount").between(0.01, 0.03) &&
      col("l_quantity") < 25)

  /** Q1.2 (`README.md:421-428`): single month via yyyymm composite. */
  def q1_2(spark: SparkSession, dir: String): DataFrame =
    q1(spark, dir,
      (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))) === 199604 &&
      col("l_discount").between(0.04, 0.06) &&
      col("l_quantity").between(26, 35))

  /** Q1.3 (`README.md:430-438`): ISO week within a calendar year. */
  def q1_3(spark: SparkSession, dir: String): DataFrame =
    q1(spark, dir,
      weekofyear(col("l_shipdate")) === 6 &&
      year(col("l_shipdate")) === 1996 &&
      col("l_discount").between(0.05, 0.07) &&
      col("l_quantity").between(26, 35))

  /** Flagship: revenue by ship-year over the full star — smoke query. */
  def yearlyRevenue(spark: SparkSession, dir: String): DataFrame =
    Star.build(spark, dir)
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(revenue, count(lit(1)).as("n_rows"))
      .orderBy(col("ship_year"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ssb_q1_1" -> q1_1,
    "ssb_q1_2" -> q1_2,
    "ssb_q1_3" -> q1_3,
    "ssb_yearly_revenue" -> yearlyRevenue)

  override val oracles: Map[String, String] = Map(
    "ssb_q1_1" ->
      s"""SELECT $revenueSql
         |FROM ${Star.sql}
         |WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
         |  AND l_discount BETWEEN 0.01 AND 0.03
         |  AND l_quantity < 25""".stripMargin,
    "ssb_q1_2" ->
      s"""SELECT $revenueSql
         |FROM ${Star.sql}
         |WHERE EXTRACT(YEAR FROM l_shipdate) * 100 + EXTRACT(MONTH FROM l_shipdate) = 199604
         |  AND l_discount BETWEEN 0.04 AND 0.06
         |  AND l_quantity BETWEEN 26 AND 35""".stripMargin,
    "ssb_q1_3" ->
      s"""SELECT $revenueSql
         |FROM ${Star.sql}
         |WHERE EXTRACT(WEEK FROM l_shipdate) = 6
         |  AND EXTRACT(YEAR FROM l_shipdate) = 1996
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity BETWEEN 26 AND 35""".stripMargin,
    "ssb_yearly_revenue" ->
      s"""SELECT EXTRACT(YEAR FROM l_shipdate) AS ship_year, $revenueSql,
         |       COUNT(*) AS n_rows
         |FROM ${Star.sql}
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
