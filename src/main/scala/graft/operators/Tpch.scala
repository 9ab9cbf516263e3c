package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The remaining TPC-H query *shapes* (Q2, Q4, Q7, Q8, Q9, Q10, Q11,
  * Q12, Q13, Q14, Q15, Q16, Q17, Q19, Q20, Q21, Q22 analogues — with
  * [[Relational]]'s Q1/Q3/Q5/Q18, all 22), adapted to the driver fixture
  * schema — no `partsupp`, no `l_commitdate`/`l_receiptdate`, so the
  * queries that depend on those columns substitute equivalent plan
  * shapes over the columns that exist (documented per query). Together
  * with [[Relational]]'s Q1/Q3/Q5/Q18 this closes the classic ad-hoc
  * decision-support surface a warehouse engine is expected to run —
  * the query class the reference's ClickHouse+dbt stack targets
  * (`/root/reference/README.md:1-17`) beyond its SSB flights.
  *
  * Shared determinism rules (same as [[Relational]]/[[Ssb]]): money
  * sums go through DECIMAL(38,6); ratios divide two decimal-exact
  * DOUBLEs (one deterministic FP op); `year()`/counts are BIGINT;
  * every output carries a total ORDER BY for the driver's
  * order-sensitive hash gate.
  *
  * Scale posture, per query, in each scaladoc — the common theme: every
  * fact-side filter is pushed to the scan, every dimension is
  * broadcast, and the one unavoidable fact-fact shuffle happens on the
  * join key AFTER pruning, so each plan survives a 1000-executor 100 TB
  * run with exactly one large exchange (or zero, for the
  * aggregate-first shapes).
  */
object Tpch extends QueryPack {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 6))
  private def money(c: Column, name: String): Column =
    sum(dec(c)).cast(DoubleType).as(name)
  private val discPrice: Column =
    col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** TPC-H Q4 analogue (order-priority checking). The fixture has no
    * l_commitdate/l_receiptdate, so "late" is re-expressed as: an order
    * counts when at least one of its line items shipped more than 90
    * days after the order date — the same EXISTS-with-extra-predicate
    * plan shape (left-semi join whose condition mixes the equi key with
    * a non-equi timestamp comparison). At scale: the quarter filter
    * prunes orders at the scan, lineitem carries only (orderkey,
    * shipdate) into the semi join, and the semi join short-circuits per
    * order — no aggregation state on the fact side. */
  def priorityWaiting(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q7 analogue (volume shipping): revenue flowing between two
    * specific nations (supplier side ↔ customer side), by ship year.
    * The two single-nation filters are applied to the 25-row nation
    * dim FIRST and broadcast, so supplier and customer shrink to ~1/25
    * before touching the facts; the only big exchange is
    * lineitem ⋈ orders on the order key. */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val (na, nb) = ("NATION_3", "NATION_8")
    def nations(alias: String) = Tables.nation(spark, dir)
      .filter(col("n_name").isin(na, nb))
      .select(col("n_nationkey").as(s"${alias}_nationkey"),
        col("n_name").as(s"${alias}_nation"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nations("supp")),
        col("s_nationkey") === col("supp_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nations("cust")),
        col("c_nationkey") === col("cust_nationkey"))
      .select(col("c_custkey"), col("cust_nation"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"),
        expr("cast(year(l_shipdate) as bigint)").as("ship_year"))
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
        (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
      .agg(money(discPrice, "revenue"), count(lit(1)).as("n_lineitems"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  /** TPC-H Q8 analogue (national market share): NATION_3's share of
    * ECONOMY-part revenue sold to EUROPE customers, per order year.
    * The share is a single DOUBLE division of two decimal-exact sums
    * (deterministic across both engines). Part/type and region/nation
    * filters all collapse to broadcast dims; the conditional numerator
    * rides the same aggregate pass as the denominator (one scan, one
    * shuffle — not two queries). */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val target = "NATION_3"
    val pt = Tables.part(spark, dir)
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    val eurNationKeys = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(eurNationKeys), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("cast(year(o_orderdate) as bigint)").as("o_year"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        money(when(col("supp_nation") === target, discPrice)
          .otherwise(lit(0)), "nation_revenue"),
        money(discPrice, "total_revenue"))
      .withColumn("mkt_share", col("nation_revenue") / col("total_revenue"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 analogue (product-type profit): the fixture has no
    * partsupp/ps_supplycost, so cost is proxied as 0.5 ·
    * p_retailprice · l_quantity; profit = disc price − cost, summed by
    * supplier nation × order year over STANDARD-type parts. The profit
    * arithmetic runs in DOUBLE with identical association in both
    * engines, then the sum goes through DECIMAL(38,6). Part filter
    * broadcasts; nation broadcast; one fact-fact exchange. */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_retailprice"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        expr("cast(year(o_orderdate) as bigint)").as("o_year"))
    val amount = discPrice -
      lit(0.5) * col("p_retailprice") * col("l_quantity")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(money(amount, "sum_profit"), count(lit(1)).as("n_lineitems"))
      .orderBy(col("n_name"), col("o_year"))
  }

  /** TPC-H Q11 analogue (important stock → value concentration): parts
    * whose lifetime discounted revenue exceeds 1.5× the mean per-part
    * revenue. (Q11's absolute fraction-of-total cutoff empties as the
    * part count grows — a mean-relative cutoff keeps the result set
    * meaningful at every SF, which is what a 100 TB run needs too; the
    * fixture's per-part values are near-uniform with max ≈ 1.8× mean,
    * so 1.5× keeps the top ~1%.) The global threshold is a one-row
    * broadcast (scalar aggregate over the ALREADY-grouped per-part
    * rollup, not a second fact scan); the comparison multiplies out the
    * division with integer factors (2·val·n > 3·total, in DOUBLE from
    * decimal-exact operands) so both engines evaluate the identical
    * expression. At 100 TB the per-part rollup is the only shuffle; the
    * threshold join is a broadcast of one row. */
  def valueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val pv = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(dec(discPrice)).as("val"))
    val total = pv.agg(sum(col("val")).cast(DoubleType).as("total"),
      count(lit(1)).as("n_parts"))
    pv.join(broadcast(total))
      .filter(lit(2) * col("val").cast(DoubleType) * col("n_parts") >
        lit(3) * col("total"))
      .select(col("l_partkey"), col("val").cast(DoubleType).as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** TPC-H Q13 analogue (customer order-count distribution): LEFT OUTER
    * join so zero-order customers survive with c_count = 0, then the
    * double aggregation (per customer → per count). The outer join
    * shuffles on custkey once; the second aggregate runs over ≤
    * |distinct counts| rows. The priority exclusion keeps the join
    * from being a plain FK count and exercises the ON-clause (not
    * WHERE) outer-join filter semantics. */
  def orderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14 analogue (promotion effect): share of September-1997
    * revenue from PROMO-type parts. Numerator and denominator are one
    * conditional-aggregate pass (single scan/shuffle); the share is one
    * DOUBLE division of decimal-exact sums. Part is broadcast; the
    * month filter prunes the fact scan. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .agg(
        money(when(col("p_type") === "PROMO", discPrice).otherwise(lit(0)),
          "promo_revenue"),
        money(discPrice, "total_revenue"))
      .withColumn("promo_share",
        col("promo_revenue") / col("total_revenue"))
  }

  /** TPC-H Q15 analogue (top supplier): supplier(s) whose 1997-Q1
    * shipped revenue equals the maximum. The revenue rollup happens
    * once (grouped on suppkey, map-side partials); the max is a one-row
    * broadcast back onto the rollup — the classic view + scalar
    * subquery shape, with the equality taken on the DECIMAL before any
    * double cast so ties are exact. Supplier enrichment joins the ~1-row
    * winner set, not the rollup. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(discPrice)).as("rev"))
    val mx = rev.agg(max(col("rev")).as("mx"))
    val winners = rev.join(broadcast(mx)).filter(col("rev") === col("mx"))
    winners
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast(DoubleType).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q17 analogue (small-quantity-order revenue): revenue from
    * Brand#11 line items whose quantity is below 20% of that part's
    * average quantity. Expressed through the SQL front end so Catalyst
    * DECORRELATES the per-part correlated scalar subquery into an
    * aggregate + join (the per-part average never materializes as a
    * per-row subquery execution). Quantities are integer-valued
    * doubles, so the per-part AVG is exact (integer sums < 2^53 are
    * order-independent in IEEE double) and the 0.2·avg threshold is the
    * same double in both engines. */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("part")
    spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
        |         AS total_price,
        |       COUNT(*) AS n_small
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#11'
        |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }

  /** TPC-H Q19 analogue (discounted revenue, disjunctive predicates):
    * three OR'd brand × size × quantity conjunction blocks across the
    * part ⋈ lineitem join. The per-side factors of the disjunction
    * (brand ∈ {…} on part, quantity ∈ [1,30] on lineitem) are hoisted
    * EXPLICITLY per side, because Catalyst pushes a mixed-side
    * disjunction only to the side owning every factor (part gets the
    * whole Or; lineitem would get nothing and feed the join its entire
    * scan — the classic hand-optimization every TPC-H Q19 kernel
    * applies). TpchSpec asserts the hoisted quantity range reaches the
    * lineitem parquet scan's PushedFilters. */
  def disjunctiveJoin(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
        col("p_size").between(1, 35))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .filter(col("l_quantity").between(1, 30))
    val blocks =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 30))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .filter(blocks)
      .agg(money(discPrice, "revenue"), count(lit(1)).as("n_lineitems"))
  }

  /** TPC-H Q21 analogue (suppliers who kept orders waiting): the
    * fixture lacks commit/receipt dates, so "the supplier everyone
    * waited for" is re-expressed as: in orders served by ≥ 2 suppliers,
    * the UNIQUE supplier whose latest ship date is strictly after every
    * other supplier's (ties disqualify the order, mirroring Q21's
    * exists/not-exists pair). Counted per supplier, top 10.
    *
    * Shape, iterated under measurement at sf0.1: ONE explicit orderkey
    * repartition feeds both the (orderkey, suppkey) rollup (subset
    * partitioning satisfies the grouping's ClusteredDistribution) and
    * the per-order reduction — map-side combine is skipped because the
    * rollup barely reduces (~1.2 line items per pair), so pre-shuffling
    * the skinny 3-column projection once beats groupBy's 2-exchange
    * default (1.3 s vs 2.2 s; a rollup+join-back form re-aggregating sm
    * three times was the 2.2 s starting point, a window form tied at
    * 1.3 s but adds a 500k-row SortExec this form avoids).
    * "Strictly latest" without a sort: max(struct(ship, +suppkey)) vs
    * max(struct(ship, −suppkey)) pick the highest and lowest suppkey at
    * the max ship date — the winner is unique iff they coincide. */
  def lateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val sm = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("last_ship"))
    val per = sm.groupBy(col("l_orderkey")).agg(
      max(struct(col("last_ship"), col("l_suppkey"))).as("hi"),
      max(struct(col("last_ship"), (-col("l_suppkey")).as("neg"))).as("lo"),
      count(lit(1)).as("nsupp"))
    val winners = per
      .filter(col("nsupp") >= 2 && col("hi.l_suppkey") === -col("lo.neg"))
      .select(col("hi.l_suppkey").as("l_suppkey"))
    winners
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** TPC-H Q22 analogue (global sales opportunity): customers with
    * above-average positive account balance and no order since
    * 1999-01-01, rolled up by nation. Scalar global threshold
    * (broadcast one row) + LEFT ANTI join against the date-pruned
    * orders scan — the anti join sees only 1999+ orders, and customer
    * never shuffles twice: threshold compare is map-side after the
    * broadcast. */
  def idleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val thr = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast(DoubleType) / count(lit(1)))
        .as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(broadcast(thr))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), money(col("c_acctbal"), "totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** TPC-H Q2 analogue (minimum-cost supplier): the fixture has no
    * partsupp, so the supplier catalog is derived from shipment history —
    * per (part, supplier), cost = MIN observed unit price
    * (l_extendedprice / l_quantity, one IEEE division per row, so both
    * engines see bit-identical doubles). Among EUROPE suppliers, every
    * supplier matching the per-part minimum cost is returned for
    * STANDARD parts of size ≤ 10 — Q2's correlated-min semantics
    * including ties.
    *
    * Scale: the (part,supp) rollup is the one big shuffle; the EUROPE
    * supplier set and the filtered part keys are broadcast pruned BEFORE
    * the per-part window (the min over eligible suppliers is unaffected
    * by part attributes, so pruning early shrinks the windowed data
    * ~30× without changing it), and the per-part min rides a window
    * aggregate over the partkey exchange — no second rollup + join-back
    * of the same data. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val eu = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val pt = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
      .select(col("p_partkey"))
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("l_suppkey"))
      .agg(min(col("unit")).as("cost"))
      .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
    val w = Window.partitionBy(col("p_partkey"))
    ps.withColumn("mc", min(col("cost")).over(w))
      .filter(col("cost") === col("mc"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("s_acctbal"), col("cost").as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"), col("p_partkey"))
  }

  /** TPC-H Q10 analogue (returned-item reporting): top 20 customers by
    * returned-line revenue for orders placed in 1997-Q4. The
    * scale-defining choice: aggregate on the bare custkey FIRST, take
    * the top 20 via TakeOrderedAndProject (no global sort
    * materializes), and only THEN join the 20-row winner set against
    * customer/nation for names — the enrichment join broadcasts 20
    * rows, never shuffling the customer table against the rollup. */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val top = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(money(discPrice, "revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(20)
    top
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name")))
        .join(Tables.customer(spark, dir),
          col("c_nationkey") === col("n_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("revenue"), col("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
  }

  /** TPC-H Q12 analogue (shipping-mode priority): the fixture has no
    * l_shipmode, so the mode axis is re-expressed as a derived
    * ship-delay class (≥ 60 days after order date = SLOW) — the same
    * join + CASE-bucketed conditional-count shape. One orderkey
    * exchange; the date filter prunes the lineitem scan; counts use
    * COUNT(CASE WHEN … THEN 1 END) so both engines produce BIGINT. */
  def shipDelayPriority(spark: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_class",
        when(col("l_shipdate") >=
          col("o_orderdate") + expr("INTERVAL 60 DAYS"), "SLOW")
          .otherwise("FAST"))
      .groupBy(col("delay_class"))
      .agg(count(when(hi, 1)).as("high_line_count"),
        count(when(!hi, 1)).as("low_line_count"))
      .orderBy(col("delay_class"))
  }

  /** TPC-H Q16 analogue (parts/supplier relationship): distinct supplier
    * counts per (brand, type, size) over the shipment-derived
    * part–supplier catalog, excluding one brand, one type, sizes outside
    * a fixed list, and "complaint" suppliers (no comment column in the
    * fixture, so the exclusion subquery keys on negative account
    * balance — the same NOT-IN-subquery plan shape). The part filter
    * and the exclusion list are both broadcast; the single exchange is
    * the two-phase distinct aggregate, whose partial pass already
    * dedups (suppkey, brand, type, size) map-side. */
  def supplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#11" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 19, 23, 36, 45, 49, 50))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 analogue (excess-share suppliers): suppliers holding an
    * outsized share of 1997 shipments of red-prefixed parts — per
    * (part, supplier) quantity vs 30% of the part's total, the nested
    * aggregate-vs-aggregate comparison at Q20's core (availqty
    * re-expressed from shipment history). Quantities are integer-valued
    * doubles (sums exact and order-independent under 2^53). The
    * per-part total rides a window over the partkey exchange of the
    * ALREADY-rolled-up (part,supp) rows — not a second scan; the final
    * supplier/nation enrichment broadcasts the small qualifying set. */
  def excessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val red = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("red")).select(col("p_partkey"))
    val sq = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .join(broadcast(red), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("supp_qty"))
    val w = Window.partitionBy(col("p_partkey"))
    val excess = sq
      .withColumn("total_qty", sum(col("supp_qty")).over(w))
      .filter(col("supp_qty") > lit(0.3) * col("total_qty"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_excess_parts"))
    broadcast(excess)
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("n_excess_parts"))
      .orderBy(col("s_suppkey"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_priority_waiting"    -> priorityWaiting,
    "rel_volume_shipping"     -> volumeShipping,
    "rel_market_share"        -> marketShare,
    "rel_product_profit"      -> productProfit,
    "rel_value_concentration" -> valueConcentration,
    "rel_order_distribution"  -> orderDistribution,
    "rel_promo_revenue"       -> promoRevenue,
    "rel_top_supplier"        -> topSupplier,
    "rel_small_qty_revenue"   -> smallQtyRevenue,
    "rel_disjunctive_join"    -> disjunctiveJoin,
    "rel_late_supplier"       -> lateSupplier,
    "rel_idle_customers"      -> idleCustomers,
    "rel_min_cost_supplier"   -> minCostSupplier,
    "rel_returned_items"      -> returnedItems,
    "rel_ship_delay_priority" -> shipDelayPriority,
    "rel_supplier_cnt"        -> supplierCnt,
    "rel_excess_suppliers"    -> excessSuppliers)

  private val discSql = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))"

  override val oracles: Map[String, String] = Map(
    "rel_priority_waiting" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
        |       CAST(SUM($discSql) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_lineitems
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8') OR
        |       (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "rel_market_share" ->
      s"""SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
        |       CAST(SUM(CASE WHEN ns.n_name = 'NATION_3' THEN $discSql
        |                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
        |         AS nation_revenue,
        |       CAST(SUM($discSql) AS DOUBLE) AS total_revenue,
        |       CAST(SUM(CASE WHEN ns.n_name = 'NATION_3' THEN $discSql
        |                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
        |         / CAST(SUM($discSql) AS DOUBLE) AS mkt_share
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        |JOIN region r ON nc.n_regionkey = r.r_regionkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        |WHERE p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_product_profit" ->
      """SELECT n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
        |         AS o_year,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     - 0.5 * p_retailprice * l_quantity
        |                     AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit,
        |       COUNT(*) AS n_lineitems
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_type = 'STANDARD'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rel_value_concentration" ->
      s"""WITH pv AS (
        |  SELECT l_partkey, SUM($discSql) AS val
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
        |FROM pv
        |WHERE 2 * CAST(val AS DOUBLE) * (SELECT COUNT(*) FROM pv) >
        |      3 * (SELECT CAST(SUM(val) AS DOUBLE) FROM pv)
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "rel_order_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |      FROM customer c
        |      LEFT OUTER JOIN orders o
        |        ON c.c_custkey = o.o_custkey
        |       AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "rel_promo_revenue" ->
      s"""SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $discSql
        |                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
        |         AS promo_revenue,
        |       CAST(SUM($discSql) AS DOUBLE) AS total_revenue,
        |       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $discSql
        |                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
        |         / CAST(SUM($discSql) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "rel_top_supplier" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey, SUM($discSql) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, CAST(rev AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
        |WHERE rev = (SELECT MAX(rev) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,
    "rel_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
        |         AS total_price,
        |       COUNT(*) AS n_small
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#11'
        |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "rel_disjunctive_join" ->
      s"""SELECT CAST(SUM($discSql) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_lineitems
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "rel_late_supplier" ->
      """WITH sm AS (
        |  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS last_ship
        |  FROM lineitem GROUP BY 1, 2),
        |om AS (
        |  SELECT l_orderkey AS ok, MAX(last_ship) AS mx,
        |         COUNT(*) AS nsupp
        |  FROM sm GROUP BY 1),
        |am AS (
        |  SELECT sm.l_orderkey AS ok2, COUNT(*) AS n_at_max
        |  FROM sm JOIN om ON sm.l_orderkey = om.ok
        |                 AND sm.last_ship = om.mx
        |  GROUP BY 1)
        |SELECT s.s_name, COUNT(*) AS numwait
        |FROM sm
        |JOIN om ON sm.l_orderkey = om.ok AND sm.last_ship = om.mx
        |JOIN am ON sm.l_orderkey = am.ok2
        |JOIN supplier s ON sm.l_suppkey = s.s_suppkey
        |WHERE om.nsupp >= 2 AND am.n_at_max = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,
    "rel_idle_customers" ->
      """SELECT c_nationkey, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
        |         AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6)))
        |                               AS DOUBLE) / COUNT(*)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_min_cost_supplier" ->
      """WITH eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier s JOIN nation n ON s_nationkey = n_nationkey
        |  JOIN region r ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |ps AS (
        |  SELECT l_partkey, l_suppkey,
        |         MIN(l_extendedprice / l_quantity) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |eps AS (
        |  SELECT ps.l_partkey, ps.l_suppkey, ps.cost,
        |         eu.s_name, eu.s_acctbal, eu.n_name
        |  FROM ps JOIN eu ON ps.l_suppkey = eu.s_suppkey),
        |mn AS (SELECT l_partkey AS pk, MIN(cost) AS mc FROM eps GROUP BY 1)
        |SELECT p.p_partkey, e.l_suppkey AS s_suppkey, e.s_name, e.n_name,
        |       e.s_acctbal, e.cost AS supply_cost
        |FROM eps e JOIN mn ON e.l_partkey = mn.pk AND e.cost = mn.mc
        |JOIN part p ON e.l_partkey = p.p_partkey
        |WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
        |ORDER BY e.s_acctbal DESC, s_suppkey, p.p_partkey""".stripMargin,
    "rel_returned_items" ->
      s"""WITH top AS (
        |  SELECT o_custkey,
        |         CAST(SUM($discSql) AS DOUBLE) AS revenue,
        |         COUNT(*) AS n_items
        |  FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1997-10-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1 ORDER BY revenue DESC, o_custkey LIMIT 20)
        |SELECT c.c_custkey, c.c_name, n.n_name, t.revenue, t.n_items
        |FROM top t
        |JOIN customer c ON t.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY t.revenue DESC, c.c_custkey""".stripMargin,
    "rel_ship_delay_priority" ->
      """SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |            THEN 'SLOW' ELSE 'FAST' END AS delay_class,
        |       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                  THEN 1 END) AS high_line_count,
        |       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                  THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 19, 23, 36, 45, 49, 50)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "rel_excess_suppliers" ->
      """WITH sq AS (
        |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
        |  FROM lineitem l JOIN part p ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2),
        |tq AS (SELECT l_partkey AS pk, SUM(supp_qty) AS total_qty
        |       FROM sq GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, n.n_name, COUNT(*) AS n_excess_parts
        |FROM sq JOIN tq ON sq.l_partkey = tq.pk
        |JOIN supplier s ON sq.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE sq.supp_qty > 0.3 * tq.total_qty
        |GROUP BY 1, 2, 3
        |ORDER BY s_suppkey""".stripMargin)
}
