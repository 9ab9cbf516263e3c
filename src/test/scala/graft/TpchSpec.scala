package graft

import graft.operators.Tpch
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the TPC-H analogue pack (every query is also
  * oracle-paired in CORRECTNESS; these pin the properties a value-hash
  * can't express — conservation laws, plan shape, and independent
  * recomputations through a different plan). Fixture: sf0.001. */
class TpchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("rel_priority_waiting: counts match inner-join-distinct recomputation") {
    val viaSemi = Tpch.priorityWaiting(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Different plan: inner join + distinct orderkeys, then regroup.
    val ord = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_shipdate")
    val viaDistinct = ord
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSemi == viaDistinct)
    assert(viaSemi.values.sum > 0, "quarter has late-shipping orders")
  }

  test("rel_volume_shipping: only the two nations appear, both directions") {
    val rows = Tpch.volumeShipping(spark, sf).collect()
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_8"), ("NATION_8", "NATION_3"))))
    assert(pairs.size == 2, "trade flows in both directions at fixture scale")
    val years = rows.map(_.getLong(2)).toSet
    assert(years.subsetOf(Set(1996L, 1997L)), "ship-year window respected")
  }

  test("rel_market_share: share = nation/total and lies in [0,1]") {
    Tpch.marketShare(spark, sf).collect().foreach { r =>
      val (nat, tot, share) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nat >= 0 && nat <= tot)
      assert(share == nat / tot, "share is the single division of the sums")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("rel_value_concentration: exact threshold set vs manual recompute") {
    val got = Tpch.valueConcentration(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pv = Tables.lineitem(spark, sf)
      .groupBy("l_partkey")
      .agg(sum(expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))"))
        .as("val"))
      .collect()
      .map(r => r.getLong(0) -> r.getDecimal(1))
    val total = pv.map(_._2.doubleValue).sum
    // Recompute the predicate exactly as both engines evaluate it.
    val want = pv.filter { case (_, v) =>
        2 * v.doubleValue * pv.length > 3 * total }
      .map { case (k, v) => k -> v.doubleValue }.toMap
    assert(got == want)
    assert(got.nonEmpty, "concentration threshold keeps some parts")
  }

  test("rel_order_distribution: conservation of customers and orders") {
    val rows = Tpch.orderDistribution(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nCust = Tables.customer(spark, sf).count()
    val nOrd = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(rows.map(_._2).sum == nCust, "every customer in exactly one bucket")
    assert(rows.map { case (c, d) => c * d }.sum == nOrd,
      "order counts weighted by bucket recover all non-urgent orders")
    val nWithOrders = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey").distinct().count()
    val zeroBucket = rows.find(_._1 == 0L).map(_._2).getOrElse(0L)
    assert(zeroBucket == nCust - nWithOrders,
      "zero bucket holds exactly the customers absent from the join side")
  }

  test("rel_promo_revenue: conditional sums are a partition of the total") {
    val r = Tpch.promoRevenue(spark, sf).collect().head
    val (promo, total, share) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(promo >= 0 && promo <= total)
    assert(share == promo / total)
  }

  test("rel_top_supplier: winner revenue equals independent max") {
    val winners = Tpch.topSupplier(spark, sf).collect()
    assert(winners.nonEmpty)
    val revs = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))"))
        .cast("double").as("rev"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mx = revs.values.max
    val wantWinners = revs.filter(_._2 == mx).keySet
    assert(winners.map(_.getLong(0)).toSet == wantWinners)
    winners.foreach(w => assert(w.getDouble(2) == mx))
  }

  test("rel_disjunctive_join: quantity disjunct pushed below the join") {
    val df = Tpch.disjunctiveJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // The OR-extraction: l_quantity ∈ [1,30] is implied by all three
    // blocks and must reach the lineitem parquet scan as a pushed range.
    assert(plan.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      plan.contains("LessThanOrEqual(l_quantity,30.0)"),
      s"no extracted quantity range in PushedFilters:\n$plan")
    val r = df.collect().head
    assert(r.getLong(1) > 0, "some line items satisfy a block")
  }

  test("rel_late_supplier: winners are strict, unique latest in multi-supplier orders") {
    // Manual recomputation from raw lineitem (6k rows at sf0.001);
    // ship dates surface as epoch days to sidestep the NTZ row type.
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("cast(unix_date(to_date(l_shipdate)) as bigint)")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byOrder = li.groupBy(_._1).map { case (ok, rs) =>
      val lastPerSupp = rs.groupBy(_._2).map { case (sk, ss) =>
        sk -> ss.map(_._3).max }
      ok -> lastPerSupp
    }
    val wantCounts = byOrder.values
      .filter(m => m.size >= 2 && m.values.count(_ == m.values.max) == 1)
      .map(m => m.maxBy(_._2)._1)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val suppName = Tables.supplier(spark, sf).select("s_suppkey", "s_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val wantTop = wantCounts.toSeq
      .map { case (sk, n) => (suppName(sk), n) }
      .sortBy { case (name, n) => (-n, name) }.take(10)
    val got = Tpch.lateSupplier(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == wantTop)
  }

  test("rel_idle_customers: members above threshold and orderless since cutoff") {
    val total = Tpch.idleCustomers(spark, sf).collect().map(_.getLong(1)).sum
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val pos = cust.map(_._2).filter(_ > 0)
    val thr = pos.map(BigDecimal(_)).sum.toDouble / pos.length
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val want = cust.count { case (k, b) => b > thr && !recent.contains(k) }
    assert(total.toInt == want)
  }

  test("rel_min_cost_supplier: rows are exactly the per-part EUROPE minima") {
    val got = Tpch.minCostSupplier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    // Manual recompute: per (part, supp) min unit price over EUROPE
    // suppliers, then the per-part min with ties kept.
    val eu = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val wantParts = Tables.part(spark, sf)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2) / r.getDouble(3)))
      .filter(t => eu.contains(t._2))
    val perPair = li.groupBy(t => (t._1, t._2))
      .map { case (k, rs) => k -> rs.map(_._3).min }
    val want = perPair.groupBy(_._1._1).flatMap { case (pk, m) =>
      val mc = m.values.min
      m.filter(_._2 == mc).map { case ((_, sk), c) => (pk, sk, c) }
    }.filter(t => wantParts.contains(t._1)).toSet
    assert(got.toSet == want)
    assert(got.nonEmpty, "some STANDARD small parts have EUROPE suppliers")
    // Output order is the Q2 contract: acctbal desc, suppkey, partkey.
    val bal = Tpch.minCostSupplier(spark, sf).collect()
      .map(r => (-r.getDouble(4), r.getLong(1), r.getLong(0))).toSeq
    assert(bal == bal.sorted, "total order by acctbal desc, suppkey, partkey")
  }

  test("rel_returned_items: top-20 equals manual rollup, enrichment loses no rows") {
    val got = Tpch.returnedItems(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getLong(4)))
    val ordQ4 = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount").collect()
      .flatMap { r =>
        ordQ4.get(r.getLong(0)).map(ck =>
          ck -> BigDecimal(r.getDouble(1)) * (1 - BigDecimal(r.getDouble(2))))
      }
    val want = li.groupBy(_._1)
      .map { case (ck, rs) => (ck, rs.map(_._2).sum.toDouble, rs.length.toLong) }
      .toSeq.sortBy(t => (-t._2, t._1)).take(20)
    assert(got.toSeq == want)
  }

  test("rel_ship_delay_priority: class counts partition the joined rows") {
    val rows = Tpch.shipDelayPriority(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet.subsetOf(Set("FAST", "SLOW")))
    val total = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(rows.values.map(t => t._1 + t._2).sum == total,
      "every joined line item lands in exactly one (class, priority) cell")
  }

  test("rel_supplier_cnt: counts equal manual recompute with exclusions") {
    // sf0.001 may have zero negative-balance suppliers — the recompute
    // covers both the empty and non-empty exclusion cases (sf0.01, where
    // the exclusion set IS non-empty, is covered by the oracle gate).
    val bad = Tables.supplier(spark, sf).filter(col("s_acctbal") < 0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val pt = Tables.part(spark, sf)
      .filter(col("p_brand") =!= "Brand#11" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 19, 23, 36, 45, 49, 50))
      .select("p_partkey", "p_brand", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3)))
      .toMap
    val want = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => pt.contains(t._1) && !bad.contains(t._2))
      .groupBy(t => pt(t._1))
      .map { case (k, rs) => k -> rs.map(_._2).toSet.size.toLong }
    val got = Tpch.supplierCnt(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("rel_excess_suppliers: every reported supplier holds >30% of some part") {
    val got = Tpch.excessSuppliers(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val red = Tables.part(spark, sf)
      .filter(col("p_name").startsWith("red"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(t => red.contains(t._1))
    val perPair = li.groupBy(t => (t._1, t._2))
      .map { case (k, rs) => k -> rs.map(_._3).sum }
    val perPart = perPair.groupBy(_._1._1)
      .map { case (pk, m) => pk -> m.values.sum }
    val want = perPair.filter { case ((pk, _), q) => q > 0.3 * perPart(pk) }
      .keys.groupBy(_._2).map { case (sk, ps) => sk -> ps.size.toLong }
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("rel_small_qty_revenue: decorrelated subquery matches manual threshold") {
    val r = Tpch.smallQtyRevenue(spark, sf).collect().head
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
    val brand = Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#11")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    // Integer-valued quantities: sum exact in double, same 0.2*avg expr.
    val avgQty = li.groupBy(_._1).map { case (pk, rs) =>
      pk -> rs.map(_._2).sum / rs.length }
    val small = li.filter { case (pk, q, _) =>
      brand.contains(pk) && q < 0.2 * avgQty(pk) }
    assert(r.getLong(1) == small.length.toLong)
    assert(r.getDouble(0) ==
      small.map(x => BigDecimal(x._3)).sum.toDouble)
  }
}
