package graft.operators

import graft.QueryPack
import graft.sources.Tables
import graft.plans.Star
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Relational operator families the reference's query class implies but
  * never exercises (SURVEY.md §2.2 gap list + §2.3 X8–X12): grouped
  * aggregation, ordering/limit, window functions, set operations,
  * semi/anti joins, rollup/cube, HAVING, scalar subqueries, DISTINCT.
  *
  * Determinism rules shared with [[Ssb]]: money math goes through
  * DECIMAL(38,6) intermediates; `year()` and `row_number()` are cast to
  * long to match DuckDB's int64; every ORDER BY carries a unique
  * tie-break key.
  *
  * Scale posture: all aggregates are partial-before-exchange; windows
  * partition on high-cardinality keys (custkey/brand) so no single
  * partition explodes; set ops and semi/anti joins are shuffle joins on
  * keys that AQE can re-plan (broadcast the small side at test SF,
  * skew-split at cluster SF).
  */
object Relational extends QueryPack {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 6))
  private def money(c: Column, name: String): Column =
    sum(dec(c)).cast(DoubleType).as(name)

  /** TPC-H Q1-style pricing summary: grouped multi-aggregate scan. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        money(col("l_extendedprice"), "sum_base_price"),
        money(col("l_extendedprice") * (lit(1) - col("l_discount")), "sum_disc_price"),
        (sum(dec(col("l_extendedprice"))).cast(DoubleType) / count(lit(1)))
          .as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3 analogue (shipping-priority): the classic
    * filter-then-3-way-join — BUILDING-segment customers, orders placed
    * before / line items shipped after the cut date, top-10 open orders
    * by outstanding revenue. Both date predicates and the segment
    * filter push to the scans, so the join inputs are pruned before the
    * one fact-fact shuffle; customer is dimension-sized and
    * broadcast-eligible. Revenue is the decimal-exact money sum; the
    * top-10 is fully tie-broken (revenue desc, orderkey). */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = "1998-01-01"
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(cut).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        expr("cast(unix_date(to_date(o_orderdate)) as bigint)").as("order_day"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit(cut).cast("timestamp"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("order_day"), col("o_orderpriority"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")), "revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q18 analogue (large-volume orders): orders whose total
    * quantity exceeds 250 units, with their customer. The HAVING-then-
    * join-back shape: the quantity rollup runs FIRST over lineitem
    * alone (map-side partials on the order key), the > 250 filter
    * collapses it to a tiny key set, and only THEN do orders/customer
    * join — at 100 TB the enrichment joins see hundreds of rows, not
    * the fact table. Threshold 250 (TPC-H's 300 keeps 46 rows at
    * sf0.01; 250 keeps ~204 — a more meaningful hash surface at
    * fixture scale, same plan shape). */
  def bigOrders(spark: SparkSession, dir: String): DataFrame = {
    val qty = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty_d"))
      .filter(col("sum_qty_d") > 250)
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("cast(unix_date(to_date(o_orderdate)) as bigint)").as("order_day"),
        col("o_totalprice"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
    qty.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("order_day"),
        col("o_totalprice").cast("double").as("total_price"),
        col("sum_qty_d").cast(DoubleType).as("sum_qty"))
      .orderBy(col("total_price").desc, col("o_orderkey"))
  }

  /** TPC-H Q5 analogue (local-supplier volume): the classic 6-way join —
    * region → nation → customer → orders → lineitem → supplier, with the
    * LOCAL constraint c_nationkey = s_nationkey closing the cycle, 1997
    * orders, ASIA region, revenue per nation. Exercises join ordering
    * over four dimension tables + two facts: region/nation broadcast
    * (bounded), customer/supplier joins carry only keys, and the single
    * fact-fact shuffle happens on the order key. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val ord = Tables.orders(spark, dir)
      .filter(expr("year(o_orderdate) = 1997"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")), "revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** ORDER BY + LIMIT top-k (driver-wide total order with tie-break). */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Ranking window: top-3 parts per brand (X8 top-k per group). */
  def brandTop3(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
  }

  /** Analytic window: per-customer running spend (X11). */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(w).cast(DoubleType).as("running_spend"))
  }

  /** lag/lead analytic window over per-customer order history (X11). */
  def lagLeadOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
  }

  /** UNION (distinct) of customer and supplier nation keys (X12). */
  def setopUnion(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
      .distinct()

  /** INTERSECT of customer and supplier nation keys (X12). */
  def setopIntersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))

  /** EXCEPT: active-customer nations minus region-0 nations (X12). */
  def setopExcept(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).filter(col("c_acctbal") > 0)
      .select(col("c_nationkey").as("nationkey"))
      .except(Tables.nation(spark, dir).filter(col("n_regionkey") === 0)
        .select(col("n_nationkey").as("nationkey")))

  /** LEFT SEMI join: customers that have at least one order (X12). */
  def semiJoinCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** LEFT ANTI join: customers with no URGENT order (X12). */
  def antiJoinCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** ROLLUP over region → nation customer stats (X10). */
  def rollupRegionNation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        money(col("c_acctbal"), "sum_acctbal"))
  }

  /** CUBE over order status × priority (X10). */
  def cubeStatusPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        money(col("o_totalprice"), "sum_price"))

  /** GROUP BY + HAVING: nations holding at least 50 customers. */
  def havingNations(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .filter(col("n_customers") >= 50)

  /** Scalar-subquery pattern: orders above the global average price.
    * The average is formed as exact-decimal-sum / count so both engines
    * compute the identical IEEE double threshold. */
  def ordersAboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val avgDf = o.agg((sum(dec(col("o_totalprice"))).cast(DoubleType) /
      count(lit(1))).as("avg_price"))
    o.join(broadcast(avgDf))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  /** Exact DISTINCT counts over the fact table. */
  def distinctExact(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  /** Approx distinct via HLL sketch (X9) — rows-only check: DuckDB's
    * approx sketch differs, so no SQL oracle is declared. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))

  /** SSB Q2-style: yearly revenue per brand for one supplier region
    * (`/root/reference/README.md` Q-flight generalization; SSB spec Q2). */
  def ssbQ2BrandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val s  = Tables.supplier(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val p  = Tables.part(spark, dir)
    li.join(s, li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"), col("p_brand"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")), "revenue"))
      .orderBy(col("ship_year"), col("p_brand"))
  }

  /** SSB Q3-style: customer-nation × supplier-nation trade flows. */
  def ssbQ3NationFlows(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val s  = Tables.supplier(spark, dir)
    val cn = Tables.nation(spark, dir)
    val sn = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(cn.select(col("n_nationkey").as("c_nk"), col("n_name").as("c_nation"))),
        c("c_nationkey") === col("c_nk"))
      .join(broadcast(sn.select(col("n_nationkey").as("s_nk"), col("n_name").as("s_nation"))),
        s("s_nationkey") === col("s_nk"))
      .filter(col("c_nation").isin("NATION_0", "NATION_1", "NATION_2") &&
        col("s_nation").isin("NATION_0", "NATION_1", "NATION_2"))
      .groupBy(col("c_nation"), col("s_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")), "revenue"))
      .orderBy(col("ship_year"), col("c_nation"), col("s_nation"))
  }

  /** SSB Q4-style profit drill-down: proxy supply cost = 50% of part
    * retail price (fixtures carry no supplycost column). */
  def ssbQ4Profit(spark: SparkSession, dir: String): DataFrame = {
    val st = Star.build(spark, dir)
    st.groupBy(year(col("o_orderdate")).cast("long").as("order_year"),
        col("c_mktsegment"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("l_quantity") * col("p_retailprice") * lit(0.5), "profit"))
      .orderBy(col("order_year"), col("c_mktsegment"))
  }

  /** SSB Q2.2-style: brand range within one region. */
  def ssbQ2BrandRange(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val s  = Tables.supplier(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir).filter(col("r_name") === "EUROPE")
    val p  = Tables.part(spark, dir)
      .filter(col("p_brand") >= "Brand#10" && col("p_brand") <= "Brand#19")
    li.join(s, li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"), col("p_brand"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")), "revenue"))
      .orderBy(col("ship_year"), col("p_brand"))
  }

  /** SSB Q3.2-style: per-segment × supplier-nation flows in a window of
    * years (narrower grouping than Q3.1's nation×nation). */
  def ssbQ3SegmentFlows(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val s  = Tables.supplier(spark, dir)
    val sn = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(sn), s("s_nationkey") === sn("n_nationkey"))
      .filter(year(col("l_shipdate")).between(1996, 1998))
      .groupBy(col("c_mktsegment"), col("n_name").as("s_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")), "revenue"))
      .orderBy(col("ship_year"), col("c_mktsegment"), col("s_nation"))
  }

  /** SSB Q4.2-style profit drill-down: year × brand for one segment. */
  def ssbQ4BrandProfit(spark: SparkSession, dir: String): DataFrame =
    Star.build(spark, dir)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"), col("p_brand"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("l_quantity") * col("p_retailprice") * lit(0.5), "profit"))
      .orderBy(col("order_year"), col("p_brand"))

  /** SSB Q2.3-style: one exact brand, any region — the narrowest Q2
    * drill-down (the spec's single-brand probe). */
  def ssbQ2SingleBrand(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir).filter(col("p_brand") === "Brand#13")
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"), col("p_brand"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")), "revenue"))
      .orderBy(col("ship_year"), col("p_brand"))
  }

  /** SSB Q3.4-style: one nation pair in ONE month — the yyyymm
    * composite predicate rides [[graft.plans.DateRangeRewrite]] down to
    * the scan even inside the 4-way join. */
  def ssbQ3PairMonthly(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val s  = Tables.supplier(spark, dir)
    val cn = Tables.nation(spark, dir)
    val sn = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(cn.select(col("n_nationkey").as("c_nk"), col("n_name").as("c_nation"))),
        c("c_nationkey") === col("c_nk"))
      .join(broadcast(sn.select(col("n_nationkey").as("s_nk"), col("n_name").as("s_nation"))),
        s("s_nationkey") === col("s_nk"))
      .filter(col("c_nation").isin("NATION_0", "NATION_1") &&
        col("s_nation").isin("NATION_0", "NATION_1"))
      .filter((year(col("l_shipdate")) * 100 + month(col("l_shipdate"))) === 199703)
      .groupBy(col("c_nation"), col("s_nation"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")), "revenue"))
      .orderBy(col("c_nation"), col("s_nation"))
  }

  /** SSB Q3.3-style: city-pair drill-down. The fixtures carry no city
    * column, so city is a derived dimension attribute — a deterministic
    * key-residue bucket (`C_C<custkey%3>` / `S_C<suppkey%3>`) standing
    * in for the spec's city-within-nation; the operator shape (2×2 IN
    * filters on both derived sides, pair × year grain) is Q3.3's. */
  def ssbQ3CityPair(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
      .withColumn("c_city", concat(lit("C_C"), pmod(col("c_custkey"), lit(3))))
    val s  = Tables.supplier(spark, dir)
      .withColumn("s_city", concat(lit("S_C"), pmod(col("s_suppkey"), lit(3))))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .filter(col("c_city").isin("C_C1", "C_C2") &&
        col("s_city").isin("S_C1", "S_C2"))
      .groupBy(col("c_city"), col("s_city"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")), "revenue"))
      .orderBy(col("ship_year"), col("c_city"), col("s_city"))
  }

  /** SSB Q4.3-style: profit at (year × brand) grain for one supplier
    * nation in the Q4 window — the deepest drill-down of the flight. */
  def ssbQ4NationProfit(spark: SparkSession, dir: String): DataFrame =
    Star.build(spark, dir)
      .filter(col("s_nationkey") === 3 &&
        year(col("o_orderdate")).between(1996, 1997))
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"), col("p_brand"))
      .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("l_quantity") * col("p_retailprice") * lit(0.5), "profit"))
      .orderBy(col("order_year"), col("p_brand"))

  /** ClickHouse `argMax` analogue: the top customer by account balance
    * per nation, computed as `max(struct(...))` — a plain partial
    * aggregate (lexicographic struct max with a unique `-custkey`
    * tie-break), NOT a row_number window. The window form sorts every
    * partition's rows; the struct-max form keeps one 4-field struct per
    * group per task and merges — at 100 TB that is the difference
    * between a sort shuffle of the table and a 25-row reduce. The
    * oracle computes the window form; results agree because the struct
    * order is total. */
  def argMaxCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(max(struct(col("c_acctbal"), (-col("c_custkey")).as("neg_key"),
        col("c_name"))).as("m"))
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("m.c_name").as("top_customer"),
        (-col("m.neg_key")).cast("long").as("top_custkey"),
        col("m.c_acctbal").as("top_acctbal"))
      .orderBy(col("nationkey"))

  /** ClickHouse `-If` combinator analogues (`countIf`/`sumIf`/`avgIf`):
    * conditional aggregates inside ONE grouped pass instead of N
    * filtered scans. All money math rides DECIMAL(38,6) intermediates;
    * empty condition groups yield NULL in both engines (no `otherwise`
    * defaults). Single aggregate keyed by priority, partial-agg
    * friendly. */
  def condAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        count(when(col("o_orderstatus") === "F", lit(1))).as("n_f"),
        sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice"))))
          .cast(DoubleType).as("total_f"),
        (sum(when(col("o_orderstatus") === "O", dec(col("o_totalprice"))))
          .cast(DoubleType) /
          count(when(col("o_orderstatus") === "O", lit(1)))).as("avg_open"))
      .orderBy(col("o_orderpriority"))

  /** Pearson correlation from EXACT INTEGER moments. corr()'s streaming
    * Welford merge drifts with merge order, and even decimal-summed
    * moments combined in IEEE are not enough here: the numerator
    * n·Σxy − Σx·Σy cancels catastrophically (corr ≈ 0.008), so a single
    * per-row double→decimal cast ulp surfaces at the 8th significant
    * digit and the engines disagree. Instead both inputs are lossless
    * integers (quantity is integral; price has exactly 2 decimals →
    * cents via a decimal(18,2) hop, never a double round-trip), all
    * five moments are DECIMAL(38,0) sums of long per-row products
    * (p² ≤ ~1e14 fits a long; the sums are int128-exact in both
    * engines — DuckDB mirrors with HUGEINT), and the cancellation-prone
    * subtractions happen in exact integer arithmetic. Only the final
    * (num, varx, vary) triple is cast to double — one correctly-rounded
    * conversion per term, identical across engines and partitionings.
    * Correlation is scale-invariant, so the cents/units scaling does
    * not change the statistic. Single grouped pass, partial-agg
    * friendly; at 100 TB rows the moments stay < 1e34 ≪ 10³⁸. */
  def corrQuantityPrice(spark: SparkSession, dir: String): DataFrame = {
    val d0 = (c: Column) => c.cast(DecimalType(38, 0))
    val base = Tables.lineitem(spark, dir).select(col("l_returnflag"),
      col("l_quantity").cast("long").as("q"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("p"))
    val n38 = col("n").cast(DecimalType(38, 0))
    base.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(d0(col("q"))).as("sq"), sum(d0(col("p"))).as("sp"),
        sum(d0(col("q") * col("p"))).as("sqp"),
        sum(d0(col("q") * col("q"))).as("sq2"),
        sum(d0(col("p") * col("p"))).as("sp2"))
      .select(col("l_returnflag"), col("n"),
        ((n38 * col("sqp") - col("sq") * col("sp")).cast(DoubleType) /
          sqrt((n38 * col("sq2") - col("sq") * col("sq")).cast(DoubleType) *
            (n38 * col("sp2") - col("sp") * col("sp")).cast(DoubleType)))
          .as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  /** NTILE quartiles of order value within each priority class, reduced
    * to the per-(priority, quartile) revenue table. The exact NTILE is
    * a within-group sort — correct as the arbitration tier, but at
    * 100 TB the scale path cuts quartiles with approximate quantile
    * boundaries (the `x_kll_quantile_rollup` sketch) and buckets
    * map-side; this operator pins what those cut-points must converge
    * to. Ties are impossible under the (totalprice, orderkey) order. */
  def ntileRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sum(dec(col("o_totalprice"))).cast(DoubleType).as("revenue"))
      .orderBy(col("o_orderpriority"), col("quartile"))
  }

  /** ClickHouse `quantileExactWeighted` analogue: per return flag, the
    * quantity-weighted p25/p50/p75 of extended price — "what price
    * level splits the SHIPPED VOLUME into quarters", which an
    * unweighted price quantile misstates whenever quantity correlates
    * with price. Type-1 weighted quantile, exact: collapse to
    * (flag, cents) with summed weights FIRST (partial-agg friendly; at
    * 100 TB the distinct-price table is what sorts, never the fact
    * rows), one cumulative window over distinct prices, and the
    * integer crossing rule `4·cum ≥ k·W` — no interpolation, no
    * floats until the final /100 display division. The same
    * counts-then-window architecture as `ev_quantile_timing` /
    * `ev_hdr_quantiles`, on a weighted domain. */
  def weightedQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"),
        col("l_quantity").cast("long").as("w"))
    val byPrice = base.groupBy(col("flag"), col("cents"))
      .agg(sum(col("w")).as("wsum"))
    val cumW = Window.partitionBy(col("flag")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byPrice.withColumn("cum", sum(col("wsum")).over(cumW))
    val tot = byPrice.groupBy(col("flag")).agg(sum(col("wsum")).as("tw"))
    cum.join(broadcast(tot), "flag")
      .groupBy(col("flag"))
      .agg(max(col("tw")).as("total_weight"),
        (min(when(col("cum") * 4 >= col("tw"), col("cents")))
          .cast(DoubleType) / 100.0d).as("wp25"),
        (min(when(col("cum") * 2 >= col("tw"), col("cents")))
          .cast(DoubleType) / 100.0d).as("wp50"),
        (min(when(col("cum") * 4 >= col("tw") * 3, col("cents")))
          .cast(DoubleType) / 100.0d).as("wp75"))
      .orderBy(col("flag"))
  }

  /** Deterministic exact-decimal→double for moments beyond the 2⁸⁵
    * single-split bound (see `Events.splitToDouble`): three 2³²-limbs,
    * each exact in a double, reassembled with TWO rounded adds — the
    * identical fixed chain in both engines, good to 2⁹⁶. The n·Sxy
    * matrix moments cross 2⁸⁵ between sf0.1 and ×10, which is what
    * forces the extra limb here. */
  private def split3ToDouble(s: Column): Column = {
    val lo = s % lit(4294967296L)
    val r1 = (s - lo) / lit(4294967296L)
    val mid = r1 % lit(4294967296L)
    val hi = (r1 - mid) / lit(4294967296L)
    hi.cast(DoubleType) * lit(1.8446744073709552e19) +
      mid.cast(DoubleType) * lit(4294967296.0) + lo.cast(DoubleType)
  }

  /** One-pass Pearson correlation MATRIX over (quantity, price cents,
    * discount bp) — the multivariate generalization of [[rel_corr]]:
    * ALL k² moments (3 sums, 3 squares, 3 cross-products) accumulate
    * in ONE partial-agg-friendly pass as exact DECIMAL(38,0), so the
    * fact table is scanned once however many pairs are reported (a
    * per-pair plan scans it k(k−1)/2 times). The cancellation-prone
    * n·Sxy − SxSy subtractions stay exact; conversion rides
    * [[split3ToDouble]] (these moments cross the one-split 2⁸⁵ bound
    * between sf0.1 and ×10); the final r per pair is one divide + √ —
    * hash-exact. Output: the 3 unordered pairs as rows, exploded from
    * the single aggregate row (no second scan, no union). */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val d0 = (c: Column) => c.cast(DecimalType(38, 0))
    val base = Tables.lineitem(spark, dir).select(
      col("l_quantity").cast("long").as("q"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("p"),
      (col("l_discount").cast(DecimalType(18, 4)) * 10000)
        .cast("long").as("dc"))
    val a = base.agg(
      count(lit(1)).as("n"),
      sum(d0(col("q"))).as("sq"), sum(d0(col("p"))).as("sp"),
      sum(d0(col("dc"))).as("sd"),
      sum(d0(col("q")) * d0(col("q"))).as("sqq"),
      sum(d0(col("p")) * d0(col("p"))).as("spp"),
      sum(d0(col("dc")) * d0(col("dc"))).as("sdd"),
      sum(d0(col("q")) * d0(col("p"))).as("sqp"),
      sum(d0(col("q")) * d0(col("dc"))).as("sqd"),
      sum(d0(col("p")) * d0(col("dc"))).as("spd"))
    val n38 = d0(col("n"))
    def r(sxy: Column, sx: Column, sy: Column,
        sxx: Column, syy: Column): Column = {
      val num = n38 * sxy - sx * sy
      val f1 = n38 * sxx - sx * sx
      val f2 = n38 * syy - sy * sy
      when(f1 > 0 && f2 > 0,
        split3ToDouble(num) /
          sqrt(split3ToDouble(f1) * split3ToDouble(f2)))
    }
    a.select(col("n"), explode(array(
        struct(lit("quantity").as("var_x"), lit("price").as("var_y"),
          r(col("sqp"), col("sq"), col("sp"), col("sqq"), col("spp")).as("r")),
        struct(lit("quantity").as("var_x"), lit("discount").as("var_y"),
          r(col("sqd"), col("sq"), col("sd"), col("sqq"), col("sdd")).as("r")),
        struct(lit("price").as("var_x"), lit("discount").as("var_y"),
          r(col("spd"), col("sp"), col("sd"), col("spp"), col("sdd")).as("r"))))
        .as("pair"))
      .select(col("pair.var_x"), col("pair.var_y"), col("n"), col("pair.r"))
      .orderBy(col("var_x"), col("var_y"))
  }

  /** The SQL-standard `REGR_SLOPE` / `REGR_INTERCEPT` / `REGR_R2`
    * family (also ClickHouse `simpleLinearRegression`): ordinary
    * least-squares of price-cents on quantity per return flag, from
    * the same one-pass exact DECIMAL(38,0) moments as [[corrMatrix]].
    * All three statistics are fixed chains over the exact
    * n·Sxy − SxSy / n·Sxx − Sx² cores, converted through
    * [[split3ToDouble]] (per-flag n·Spp crosses the one-split 2⁸⁵
    * bound at ×10) — hash-exact; a zero-variance regressor yields
    * NULL slope/intercept/r2 in both engines. */
  def regression(spark: SparkSession, dir: String): DataFrame = {
    val d0 = (c: Column) => c.cast(DecimalType(38, 0))
    val base = Tables.lineitem(spark, dir).select(col("l_returnflag"),
      col("l_quantity").cast("long").as("q"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("p"))
    val a = base.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(d0(col("q"))).as("sq"), sum(d0(col("p"))).as("sp"),
        sum(d0(col("q")) * d0(col("q"))).as("sqq"),
        sum(d0(col("p")) * d0(col("p"))).as("spp"),
        sum(d0(col("q")) * d0(col("p"))).as("sqp"))
    val n38 = d0(col("n"))
    val num = n38 * col("sqp") - col("sq") * col("sp")
    val fxx = n38 * col("sqq") - col("sq") * col("sq")
    val fyy = n38 * col("spp") - col("sp") * col("sp")
    a.withColumn("numd", split3ToDouble(num))
      .withColumn("fxxd", split3ToDouble(fxx))
      .withColumn("fyyd", split3ToDouble(fyy))
      .withColumn("ok", fxx > 0 && fyy > 0)
      .withColumn("slope", when(col("ok"), col("numd") / col("fxxd")))
      .select(col("l_returnflag"), col("n"),
        (col("slope") / lit(100.0)).as("slope"),
        when(col("ok"),
          (split3ToDouble(col("sp")) -
            col("slope") * split3ToDouble(col("sq"))) /
            col("n").cast(DoubleType) / lit(100.0)).as("intercept"),
        when(col("ok"),
          (col("numd") / col("fxxd")) * (col("numd") / col("fyyd")))
          .as("r2"))
      .orderBy(col("l_returnflag"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_regression"       -> regression,
    "rel_corr_matrix"      -> corrMatrix,
    "rel_weighted_quantiles" -> weightedQuantiles,
    "rel_corr"             -> corrQuantityPrice,
    "rel_ntile"            -> ntileRevenue,
    "rel_argmax"           -> argMaxCustomer,
    "rel_cond_aggs"        -> condAggs,
    "ssb_q2_2_brand_range" -> ssbQ2BrandRange,
    "ssb_q2_3_single_brand" -> ssbQ2SingleBrand,
    "ssb_q3_3_city_pair" -> ssbQ3CityPair,
    "ssb_q3_4_pair_monthly" -> ssbQ3PairMonthly,
    "ssb_q4_3_nation_profit" -> ssbQ4NationProfit,
    "ssb_q3_2_segment_flows" -> ssbQ3SegmentFlows,
    "ssb_q4_2_brand_profit" -> ssbQ4BrandProfit,
    "rel_pricing_summary"  -> pricingSummary,
    "rel_shipping_priority" -> shippingPriority,
    "rel_big_orders"        -> bigOrders,
    "rel_local_volume"     -> localSupplierVolume,
    "rel_top_orders"       -> topOrders,
    "rel_brand_top3"       -> brandTop3,
    "rel_running_total"    -> runningTotal,
    "rel_lag_lead"         -> lagLeadOrders,
    "rel_setop_union"      -> setopUnion,
    "rel_setop_intersect"  -> setopIntersect,
    "rel_setop_except"     -> setopExcept,
    "rel_semi_join"        -> semiJoinCustomers,
    "rel_anti_join"        -> antiJoinCustomers,
    "rel_rollup"           -> rollupRegionNation,
    "rel_cube"             -> cubeStatusPriority,
    "rel_having"           -> havingNations,
    "rel_above_avg"        -> ordersAboveAvg,
    "rel_distinct_exact"   -> distinctExact,
    "rel_approx_distinct"  -> approxDistinct,
    "ssb_q2_brand_revenue" -> ssbQ2BrandRevenue,
    "ssb_q3_nation_flows"  -> ssbQ3NationFlows,
    "ssb_q4_profit"        -> ssbQ4Profit)

  private val discPrice = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))"

  override val oracles: Map[String, String] = Map(
    "rel_regression" ->
      """WITH b AS (
        |  SELECT l_returnflag AS f, CAST(l_quantity AS BIGINT) AS q,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS p
        |  FROM lineitem),
        |m AS (
        |  SELECT f, COUNT(*) AS n, SUM(q) AS sq, SUM(p) AS sp,
        |         SUM(q*q) AS sqq, SUM(p*p) AS spp, SUM(q*p) AS sqp
        |  FROM b GROUP BY 1),
        |g AS (
        |  SELECT f, n, sq, sp, n*sqp - sq*sp AS num,
        |         n*sqq - sq*sq AS fxx, n*spp - sp*sp AS fyy FROM m),
        |l1 AS (
        |  SELECT *,
        |    num % 4294967296 AS num_lo,
        |    (num - num % 4294967296) // 4294967296 AS num_r1,
        |    fxx % 4294967296 AS fxx_lo,
        |    (fxx - fxx % 4294967296) // 4294967296 AS fxx_r1,
        |    fyy % 4294967296 AS fyy_lo,
        |    (fyy - fyy % 4294967296) // 4294967296 AS fyy_r1,
        |    sq % 4294967296 AS sq_lo,
        |    (sq - sq % 4294967296) // 4294967296 AS sq_r1,
        |    sp % 4294967296 AS sp_lo,
        |    (sp - sp % 4294967296) // 4294967296 AS sp_r1
        |  FROM g),
        |l2 AS (
        |  SELECT *,
        |    num_r1 % 4294967296 AS num_mid,
        |    (num_r1 - num_r1 % 4294967296) // 4294967296 AS num_hi,
        |    fxx_r1 % 4294967296 AS fxx_mid,
        |    (fxx_r1 - fxx_r1 % 4294967296) // 4294967296 AS fxx_hi,
        |    fyy_r1 % 4294967296 AS fyy_mid,
        |    (fyy_r1 - fyy_r1 % 4294967296) // 4294967296 AS fyy_hi,
        |    sq_r1 % 4294967296 AS sq_mid,
        |    (sq_r1 - sq_r1 % 4294967296) // 4294967296 AS sq_hi,
        |    sp_r1 % 4294967296 AS sp_mid,
        |    (sp_r1 - sp_r1 % 4294967296) // 4294967296 AS sp_hi
        |  FROM l1),
        |v AS (
        |  SELECT f, n, fxx, fyy,
        |    CAST(num_hi AS DOUBLE) * 1.8446744073709552e19
        |      + CAST(num_mid AS DOUBLE) * 4294967296.0
        |      + CAST(num_lo AS DOUBLE) AS numd,
        |    CAST(fxx_hi AS DOUBLE) * 1.8446744073709552e19
        |      + CAST(fxx_mid AS DOUBLE) * 4294967296.0
        |      + CAST(fxx_lo AS DOUBLE) AS fxxd,
        |    CAST(fyy_hi AS DOUBLE) * 1.8446744073709552e19
        |      + CAST(fyy_mid AS DOUBLE) * 4294967296.0
        |      + CAST(fyy_lo AS DOUBLE) AS fyyd,
        |    CAST(sq_hi AS DOUBLE) * 1.8446744073709552e19
        |      + CAST(sq_mid AS DOUBLE) * 4294967296.0
        |      + CAST(sq_lo AS DOUBLE) AS sqd,
        |    CAST(sp_hi AS DOUBLE) * 1.8446744073709552e19
        |      + CAST(sp_mid AS DOUBLE) * 4294967296.0
        |      + CAST(sp_lo AS DOUBLE) AS spd
        |  FROM l2)
        |SELECT f AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  CASE WHEN fxx > 0 AND fyy > 0 THEN (numd / fxxd) / 100.0 END
        |    AS slope,
        |  CASE WHEN fxx > 0 AND fyy > 0 THEN
        |    (spd - (numd / fxxd) * sqd) / CAST(n AS DOUBLE) / 100.0 END
        |    AS intercept,
        |  CASE WHEN fxx > 0 AND fyy > 0 THEN
        |    (numd / fxxd) * (numd / fyyd) END AS r2
        |FROM v ORDER BY 1""".stripMargin,
    "rel_corr_matrix" ->
      """WITH b AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS p,
        |         CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |           AS dc
        |  FROM lineitem),
        |m AS (
        |  SELECT COUNT(*) AS n,
        |         SUM(q) AS sq, SUM(p) AS sp, SUM(dc) AS sd,
        |         SUM(q*q) AS sqq, SUM(p*p) AS spp, SUM(dc*dc) AS sdd,
        |         SUM(q*p) AS sqp, SUM(q*dc) AS sqd, SUM(p*dc) AS spd
        |  FROM b),
        |pairs AS (
        |  SELECT 'quantity' AS var_x, 'price' AS var_y, n,
        |         n*sqp - sq*sp AS num, n*sqq - sq*sq AS f1,
        |         n*spp - sp*sp AS f2 FROM m
        |  UNION ALL
        |  SELECT 'quantity', 'discount', n,
        |         n*sqd - sq*sd, n*sqq - sq*sq, n*sdd - sd*sd FROM m
        |  UNION ALL
        |  SELECT 'price', 'discount', n,
        |         n*spd - sp*sd, n*spp - sp*sp, n*sdd - sd*sd FROM m),
        |l1 AS (
        |  SELECT *,
        |    num % 4294967296 AS num_lo,
        |    (num - num % 4294967296) // 4294967296 AS num_r1,
        |    f1 % 4294967296 AS f1_lo,
        |    (f1 - f1 % 4294967296) // 4294967296 AS f1_r1,
        |    f2 % 4294967296 AS f2_lo,
        |    (f2 - f2 % 4294967296) // 4294967296 AS f2_r1
        |  FROM pairs),
        |l2 AS (
        |  SELECT *,
        |    num_r1 % 4294967296 AS num_mid,
        |    (num_r1 - num_r1 % 4294967296) // 4294967296 AS num_hi,
        |    f1_r1 % 4294967296 AS f1_mid,
        |    (f1_r1 - f1_r1 % 4294967296) // 4294967296 AS f1_hi,
        |    f2_r1 % 4294967296 AS f2_mid,
        |    (f2_r1 - f2_r1 % 4294967296) // 4294967296 AS f2_hi
        |  FROM l1),
        |v AS (
        |  SELECT var_x, var_y, n, f1, f2,
        |    CAST(num_hi AS DOUBLE) * 1.8446744073709552e19
        |      + CAST(num_mid AS DOUBLE) * 4294967296.0
        |      + CAST(num_lo AS DOUBLE) AS numd,
        |    CAST(f1_hi AS DOUBLE) * 1.8446744073709552e19
        |      + CAST(f1_mid AS DOUBLE) * 4294967296.0
        |      + CAST(f1_lo AS DOUBLE) AS f1d,
        |    CAST(f2_hi AS DOUBLE) * 1.8446744073709552e19
        |      + CAST(f2_mid AS DOUBLE) * 4294967296.0
        |      + CAST(f2_lo AS DOUBLE) AS f2d
        |  FROM l2)
        |SELECT var_x, var_y, CAST(n AS BIGINT) AS n,
        |  CASE WHEN f1 > 0 AND f2 > 0 THEN numd / sqrt(f1d * f2d) END AS r
        |FROM v ORDER BY 1, 2""".stripMargin,
    "rel_weighted_quantiles" ->
      """WITH base AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS cents,
        |         CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |bp AS (SELECT flag, cents, CAST(SUM(w) AS BIGINT) AS wsum
        |       FROM base GROUP BY 1, 2),
        |c AS (
        |  SELECT flag, cents, wsum,
        |         SUM(wsum) OVER (PARTITION BY flag ORDER BY cents
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(wsum) OVER (PARTITION BY flag) AS tw
        |  FROM bp)
        |SELECT flag, CAST(MAX(tw) AS BIGINT) AS total_weight,
        |  CAST(MIN(CASE WHEN cum * 4 >= tw THEN cents END) AS DOUBLE) / 100.0
        |    AS wp25,
        |  CAST(MIN(CASE WHEN cum * 2 >= tw THEN cents END) AS DOUBLE) / 100.0
        |    AS wp50,
        |  CAST(MIN(CASE WHEN cum * 4 >= tw * 3 THEN cents END) AS DOUBLE) / 100.0
        |    AS wp75
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_shipping_priority" ->
      s"""SELECT o.o_orderkey,
        |       CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |         AS order_day,
        |       o.o_orderpriority,
        |       CAST(SUM($discPrice) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l.l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o.o_orderkey LIMIT 10""".stripMargin,
    "rel_big_orders" ->
      """WITH q AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sum_qty_d
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |       CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |         AS order_day,
        |       CAST(o.o_totalprice AS DOUBLE) AS total_price,
        |       CAST(q.sum_qty_d AS DOUBLE) AS sum_qty
        |FROM q
        |JOIN orders o ON q.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY total_price DESC, o.o_orderkey""".stripMargin,
    "rel_local_volume" ->
      s"""SELECT n.n_name,
        |       CAST(SUM($discPrice) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_lineitems
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |               AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND EXTRACT(year FROM o.o_orderdate) = 1997
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "rel_corr" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |         CAST(l_quantity AS BIGINT) AS q,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |         CAST(SUM(CAST(q AS HUGEINT)) AS HUGEINT) AS sq,
        |         CAST(SUM(CAST(p AS HUGEINT)) AS HUGEINT) AS sp,
        |         CAST(SUM(CAST(q * p AS HUGEINT)) AS HUGEINT) AS sqp,
        |         CAST(SUM(CAST(q * q AS HUGEINT)) AS HUGEINT) AS sq2,
        |         CAST(SUM(CAST(p AS HUGEINT) * CAST(p AS HUGEINT)) AS HUGEINT) AS sp2
        |  FROM b GROUP BY 1)
        |SELECT l_returnflag, n,
        |       CAST(CAST(n AS HUGEINT) * sqp - sq * sp AS DOUBLE)
        |         / sqrt(CAST(CAST(n AS HUGEINT) * sq2 - sq * sq AS DOUBLE)
        |              * CAST(CAST(n AS HUGEINT) * sp2 - sp * sp AS DOUBLE))
        |         AS corr_qty_price
        |FROM m ORDER BY 1""".stripMargin,
    "rel_ntile" ->
      """WITH q AS (
        |  SELECT o_orderpriority, o_totalprice,
        |         CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
        |  FROM orders)
        |SELECT o_orderpriority, quartile, COUNT(*) AS n,
        |       MIN(o_totalprice) AS min_price,
        |       MAX(o_totalprice) AS max_price,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rel_argmax" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |       c_name AS top_customer,
        |       c_custkey AS top_custkey,
        |       c_acctbal AS top_acctbal
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |        ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer) t
        |WHERE rn = 1 ORDER BY nationkey""".stripMargin,
    "rel_cond_aggs" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
        |            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_f,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
        |            FILTER (WHERE o_orderstatus = 'O') AS DOUBLE)
        |         / COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS avg_open
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "ssb_q2_3_single_brand" ->
      s"""SELECT EXTRACT(YEAR FROM l_shipdate) AS ship_year, p_brand,
         |       CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_brand = 'Brand#13'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ssb_q3_3_city_pair" ->
      s"""SELECT concat('C_C', c_custkey % 3) AS c_city,
         |       concat('S_C', s_suppkey % 3) AS s_city,
         |       EXTRACT(YEAR FROM l_shipdate) AS ship_year,
         |       CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |WHERE concat('C_C', c_custkey % 3) IN ('C_C1', 'C_C2')
         |  AND concat('S_C', s_suppkey % 3) IN ('S_C1', 'S_C2')
         |GROUP BY 1, 2, 3 ORDER BY 3, 1, 2""".stripMargin,
    "ssb_q3_4_pair_monthly" ->
      s"""SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
         |       CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE cn.n_name IN ('NATION_0', 'NATION_1')
         |  AND sn.n_name IN ('NATION_0', 'NATION_1')
         |  AND EXTRACT(YEAR FROM l_shipdate) * 100 + EXTRACT(MONTH FROM l_shipdate) = 199703
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ssb_q4_3_nation_profit" ->
      s"""SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year, p_brand,
         |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
         |              - l_quantity * p_retailprice * 0.5 AS DECIMAL(38,6)))
         |            AS DOUBLE) AS profit
         |FROM ${Star.sql}
         |WHERE s_nationkey = 3
         |  AND EXTRACT(YEAR FROM o_orderdate) BETWEEN 1996 AND 1997
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ssb_q2_2_brand_range" ->
      s"""SELECT EXTRACT(YEAR FROM l_shipdate) AS ship_year, p_brand,
         |       CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
         |JOIN part ON l_partkey = p_partkey
         |WHERE p_brand >= 'Brand#10' AND p_brand <= 'Brand#19'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ssb_q3_2_segment_flows" ->
      s"""SELECT c_mktsegment, n_name AS s_nation,
         |       EXTRACT(YEAR FROM l_shipdate) AS ship_year,
         |       CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE EXTRACT(YEAR FROM l_shipdate) BETWEEN 1996 AND 1998
         |GROUP BY 1, 2, 3 ORDER BY 3, 1, 2""".stripMargin,
    "ssb_q4_2_brand_profit" ->
      s"""SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year, p_brand,
         |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
         |                     - l_quantity * p_retailprice * 0.5
         |                     AS DECIMAL(38,6))) AS DOUBLE) AS profit
         |FROM ${Star.sql}
         |WHERE c_mktsegment = 'AUTOMOBILE'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        |       COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rel_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "rel_brand_top3" ->
      """SELECT * FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |         ROW_NUMBER() OVER (PARTITION BY p_brand
        |                            ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) t WHERE rn <= 3""".stripMargin,
    "rel_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |         AS running_spend
        |FROM orders""".stripMargin,
    "rel_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |       LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |       LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders""".stripMargin,
    "rel_setop_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "rel_setop_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "rel_setop_except" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 0
        |EXCEPT SELECT n_nationkey AS nationkey FROM nation WHERE n_regionkey = 0""".stripMargin,
    "rel_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "rel_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin,
    "rel_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "rel_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "rel_having" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
        |GROUP BY c_nationkey HAVING COUNT(*) >= 50""".stripMargin,
    "rel_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
        |  FROM orders)""".stripMargin,
    "rel_distinct_exact" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps,
        |       COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
    "ssb_q2_brand_revenue" ->
      s"""SELECT EXTRACT(YEAR FROM l_shipdate) AS ship_year, p_brand,
         |       CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
         |JOIN part ON l_partkey = p_partkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ssb_q3_nation_flows" ->
      s"""SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
         |       EXTRACT(YEAR FROM l_shipdate) AS ship_year,
         |       CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE cn.n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
         |  AND sn.n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
         |GROUP BY 1, 2, 3 ORDER BY 3, 1, 2""".stripMargin,
    "ssb_q4_profit" ->
      s"""SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year, c_mktsegment,
         |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
         |                     - l_quantity * p_retailprice * 0.5
         |                     AS DECIMAL(38,6))) AS DOUBLE) AS profit
         |FROM ${Star.sql}
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
