package graft.plans

import graft.sources.SsbCsv
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity mode: the EXACT star model and Q1 flight of
  * `/root/reference/README.md`, over dbgen CSV data — for a user who
  * wants drop-in behavior (same 38 aliased columns `:352-390`, same
  * three inner joins `:391-394`, same integer-unit predicates and
  * golden-answer semantics `:413-438`) rather than the fixture-schema
  * re-expression in [[Star]]/[[graft.operators.Ssb]].
  *
  * The reference's `ref('stg_customers')` typo (`README.md:392` vs the
  * model named `stg_customer` at `:296-302`) is implemented as the
  * evident intent, per SURVEY.md §1.3 inconsistency #2.
  *
  * All money/discount columns are Long/Int per SURVEY.md §1.2: the
  * reference's `sum(LO_EXTENDEDPRICE * LO_DISCOUNT)` silently widens
  * UInt32·UInt8 → UInt64 in ClickHouse; `LongType` sums reproduce the
  * published goldens (446,031,203,850 at SF=1) without overflow.
  */
object SsbReferenceStar {

  /** The 38-column star select (`README.md:352-395`): 17 lineorder + 7
    * customer + 7 supplier + 7 part columns, inner-joined on the three
    * dimension keys. `dir` holds dbgen `.tbl` files. */
  def build(spark: SparkSession, dir: String): DataFrame = {
    val l = SsbCsv.read(spark, "lineorder", s"$dir/lineorder.tbl")
    val c = SsbCsv.read(spark, "customer", s"$dir/customer.tbl")
    val s = SsbCsv.read(spark, "supplier", s"$dir/supplier.tbl")
    val p = SsbCsv.read(spark, "part", s"$dir/part.tbl")
    l.join(c, c("C_CUSTKEY") === l("LO_CUSTKEY"), "inner")
      .join(s, s("S_SUPPKEY") === l("LO_SUPPKEY"), "inner")
      .join(p, p("P_PARTKEY") === l("LO_PARTKEY"), "inner")
      .select(
        l("LO_ORDERKEY"), l("LO_LINENUMBER"), l("LO_CUSTKEY"), l("LO_PARTKEY"),
        l("LO_SUPPKEY"), l("LO_ORDERDATE"), l("LO_ORDERPRIORITY"),
        l("LO_SHIPPRIORITY"), l("LO_QUANTITY"), l("LO_EXTENDEDPRICE"),
        l("LO_ORDTOTALPRICE"), l("LO_DISCOUNT"), l("LO_REVENUE"),
        l("LO_SUPPLYCOST"), l("LO_TAX"), l("LO_COMMITDATE"), l("LO_SHIPMODE"),
        c("C_NAME"), c("C_ADDRESS"), c("C_CITY"), c("C_NATION"), c("C_REGION"),
        c("C_PHONE"), c("C_MKTSEGMENT"),
        s("S_NAME"), s("S_ADDRESS"), s("S_CITY"), s("S_NATION"), s("S_REGION"),
        s("S_PHONE"),
        p("P_NAME"), p("P_MFGR"), p("P_CATEGORY"), p("P_BRAND"), p("P_COLOR"),
        p("P_TYPE"), p("P_SIZE"), p("P_CONTAINER"))
  }

  /** Q1.1 (`README.md:413-419`): `SELECT sum(LO_EXTENDEDPRICE*LO_DISCOUNT)
    * AS revenue FROM star WHERE toYear(LO_ORDERDATE) = 1993 AND
    * LO_DISCOUNT BETWEEN 1 AND 3 AND LO_QUANTITY < 25`. */
  def q1_1(star: DataFrame): DataFrame =
    star.filter(year(col("LO_ORDERDATE")) === 1993 &&
        col("LO_DISCOUNT").between(1, 3) && col("LO_QUANTITY") < 25)
      .agg(sum(col("LO_EXTENDEDPRICE") * col("LO_DISCOUNT")).as("revenue"))

  /** Q1.2 (`README.md:421-428`): `toYYYYMM(LO_ORDERDATE) = 199401`,
    * discount 4–6, quantity 26–35. */
  def q1_2(star: DataFrame): DataFrame =
    star.filter(
        (year(col("LO_ORDERDATE")) * 100 + month(col("LO_ORDERDATE"))) === 199401 &&
        col("LO_DISCOUNT").between(4, 6) && col("LO_QUANTITY").between(26, 35))
      .agg(sum(col("LO_EXTENDEDPRICE") * col("LO_DISCOUNT")).as("revenue"))

  /** Q1.3 (`README.md:430-438`): ISO week 6 of 1994, discount 5–7,
    * quantity 26–35. */
  def q1_3(star: DataFrame): DataFrame =
    star.filter(weekofyear(col("LO_ORDERDATE")) === 6 &&
        year(col("LO_ORDERDATE")) === 1994 &&
        col("LO_DISCOUNT").between(5, 7) && col("LO_QUANTITY").between(26, 35))
      .agg(sum(col("LO_EXTENDEDPRICE") * col("LO_DISCOUNT")).as("revenue"))
}
