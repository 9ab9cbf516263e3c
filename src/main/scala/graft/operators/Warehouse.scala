package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Warehouse-lifecycle + analytics operators rounding out the dbt-side
  * surface of the reference (baikulov/clickhouse_vs_dbt): the reference
  * manages models with dbt, whose flagship lifecycle features beyond
  * materialization are snapshots (SCD type 2) and data tests
  * (unique / not-null / relationships / accepted-values) — re-expressed
  * here as first-class Spark operators — plus the ClickHouse-flavored
  * funnel/path/topK analytics families the reference's engine is known
  * for (cf. reference README's star-schema flight, `README.md:352-438`).
  *
  * Every query is oracle-paired. Date outputs are epoch-day bigints and
  * money/value sums ride DECIMAL(38,6) intermediates, per the parity
  * rules in `Events`/`Relational`.
  */
object Warehouse extends QueryPack {

  private def dec(c: Column) = c.cast(DecimalType(38, 6))
  private def d0(c: Column) = c.cast(DecimalType(38, 0))

  // ---------------------------------------------------------------- SCD2

  /** dbt-snapshot analogue (SCD type 2): collapse each customer's
    * order-priority history into validity intervals. Runs of consecutive
    * equal priorities (ordered by (o_orderdate, o_orderkey) — a total
    * order, so islands are deterministic) become one row with
    * [valid_from, valid_to) epoch-day bounds; the live segment has NULL
    * valid_to, exactly like a dbt snapshot's `dbt_valid_to`.
    *
    * Islands via the classic rn−rn gaps-and-islands difference; segment
    * order for the `lead` that closes intervals is `min(rn_all)` per
    * island (valid_from alone can tie when one customer places
    * different-priority orders on the same day). `seg_ord` is also
    * OUTPUT and is the final ORDER BY tie-break: (custkey, valid_from,
    * priority) alone is not a total order — interleaved same-day
    * priorities (P1,P2,P1) can yield two same-priority islands sharing
    * a valid_from — and the hash gate is order-sensitive.
    *
    * Scale posture: both windows partition by o_custkey — per-customer
    * sequences (tens of rows), never a global sort; one shuffle on
    * custkey serves rn, the island aggregate, and the closing lead. */
  def scd2Dim(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Seq(col("o_orderdate"), col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_custkey")).orderBy(byKey: _*)
    val wVal = Window.partitionBy(col("o_custkey"), col("o_orderpriority"))
      .orderBy(byKey: _*)
    val wSeg = Window.partitionBy(col("o_custkey")).orderBy(col("seg_ord"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderpriority"),
        expr("cast(unix_date(to_date(o_orderdate)) as bigint)").as("day"),
        col("o_orderdate"), col("o_orderkey"))
      .withColumn("rn_all", row_number().over(wAll))
      .withColumn("grp", col("rn_all") - row_number().over(wVal))
      .groupBy(col("o_custkey"), col("o_orderpriority"), col("grp"))
      .agg(min(col("day")).as("valid_from"), max(col("day")).as("last_day"),
        count(lit(1)).as("n_orders"),
        min(col("rn_all")).cast("long").as("seg_ord"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wSeg))
      .select(col("o_custkey"), col("o_orderpriority"), col("valid_from"),
        col("valid_to"), col("n_orders"), col("seg_ord"))
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderpriority"),
        col("seg_ord"))
  }

  // ------------------------------------------------------------ dbt tests

  /** dbt data-test pack as one report table: every relationships
    * (FK orphan), unique, and accepted-values test in the schema,
    * one row per test with its violation count (all 0 on the fixtures —
    * the assertion is that BOTH engines prove it).
    *
    * Scale posture: every fact table is scanned ONCE no matter how many
    * tests it carries — all of a table's FK probes are chained
    * broadcast/shuffle LEFT joins on key-set projections inside one
    * pass, and its unique/accepted-values tests ride the same final
    * aggregate as conditional counts (a naive per-test plan re-scans
    * lineitem three times; at 100 TB the fact scans ARE the cost). The
    * per-table aggregate rows then unpivot via a literal struct array —
    * plan width, not data width.
    *
    * NULL FK semantics follow dbt's relationships test (and SQL
    * `NOT IN`): a NULL foreign key is NOT a violation — the violation
    * predicate requires the FK itself non-null, or a join miss on a
    * NULL key would be miscounted. */
  def referentialTests(spark: SparkSession, dir: String): DataFrame = {
    // one row per (test, violations) from a single already-aggregated row
    def unpivot(agg: DataFrame, tests: Seq[(String, String)]): DataFrame =
      agg.select(explode(array(tests.map { case (n, c) =>
        struct(lit(n).as("test_name"), col(c).as("n_violations")) }: _*)).as("t"))
        .select(col("t.test_name").as("test_name"),
          col("t.n_violations").as("n_violations"))
    def keyset(t: DataFrame, k: String): DataFrame = t.select(col(k)).distinct()
    val nationKeys = keyset(Tables.nation(spark, dir), "n_nationkey")
    // lineitem: one scan, three chained FK probes
    val li = unpivot(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        .join(keyset(Tables.orders(spark, dir), "o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left")
        .join(broadcast(keyset(Tables.part(spark, dir), "p_partkey")),
          col("l_partkey") === col("p_partkey"), "left")
        .join(broadcast(keyset(Tables.supplier(spark, dir), "s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left")
        .agg(count(when(col("l_orderkey").isNotNull && col("o_orderkey").isNull,
            lit(1))).as("v_ord"),
          count(when(col("l_partkey").isNotNull && col("p_partkey").isNull,
            lit(1))).as("v_part"),
          count(when(col("l_suppkey").isNotNull && col("s_suppkey").isNull,
            lit(1))).as("v_supp")),
      Seq("lineitem_orderkey_fk" -> "v_ord", "lineitem_partkey_fk" -> "v_part",
        "lineitem_suppkey_fk" -> "v_supp"))
    // orders: one scan carries the FK probe, the PK-unique test, and the
    // accepted-values test
    val ord = unpivot(
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .join(broadcast(keyset(Tables.customer(spark, dir), "c_custkey")),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(count(when(col("o_custkey").isNotNull && col("c_custkey").isNull,
            lit(1))).as("v_cust"),
          (count(lit(1)) - count_distinct(col("o_orderkey"))).as("v_uniq"),
          count(when(!col("o_orderstatus").isin("O", "F", "P"), lit(1)))
            .as("v_status")),
      Seq("orders_custkey_fk" -> "v_cust", "orders_orderkey_unique" -> "v_uniq",
        "orders_status_accepted" -> "v_status"))
    val cust = unpivot(
      Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(nationKeys), col("c_nationkey") === col("n_nationkey"),
          "left")
        .agg(count(when(col("c_nationkey").isNotNull && col("n_nationkey").isNull,
            lit(1))).as("v_nat"),
          (count(lit(1)) - count_distinct(col("c_custkey"))).as("v_uniq")),
      Seq("customer_nationkey_fk" -> "v_nat",
        "customer_custkey_unique" -> "v_uniq"))
    val supp = unpivot(
      Tables.supplier(spark, dir)
        .select(col("s_nationkey"))
        .join(broadcast(nationKeys), col("s_nationkey") === col("n_nationkey"),
          "left")
        .agg(count(when(col("s_nationkey").isNotNull && col("n_nationkey").isNull,
            lit(1))).as("v_nat")),
      Seq("supplier_nationkey_fk" -> "v_nat"))
    val nat = unpivot(
      Tables.nation(spark, dir)
        .select(col("n_regionkey"))
        .join(broadcast(keyset(Tables.region(spark, dir), "r_regionkey")),
          col("n_regionkey") === col("r_regionkey"), "left")
        .agg(count(when(col("n_regionkey").isNotNull && col("r_regionkey").isNull,
            lit(1))).as("v_reg")),
      Seq("nation_regionkey_fk" -> "v_reg"))
    Seq(li, ord, cust, supp, nat).reduce(_ unionByName _)
      .orderBy(col("test_name"))
  }

  // ---------------------------------------------------- rolling distinct

  /** Rolling 7-day distinct users (WAU) per day, EXACTLY — the
    * arbitration tier for the mergeable-HLL rollup (`ev_hll_daily`),
    * which approximates precisely this when the distinct count stops
    * fitting. Distinct (day, user) pairs first (the only corpus-sized
    * shuffle, and it shrinks events to at most DAU×days rows), then each
    * pair EXPLODES to the ≤7 trailing window anchors it covers
    * (`sequence(pday, pday+6)`) — a true map-side ×7 expansion — and a
    * broadcast EQUI-join against the observed-day grid drops anchors
    * beyond the data's horizon. (The earlier non-equi `BETWEEN` join
    * form compiled to a BroadcastNestedLoopJoin: O(|pairs|×|days|)
    * predicate evaluations — at multi-year scale that inner loop over
    * every day dwarfs the ×7 fan-out this op actually needs.) No
    * per-day self-scan of raw events.
    *
    * `dau` rides along from the same pairs (COUNT(DISTINCT CASE …)
    * restricted to the window's own day). */
  def trailingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.events(spark, dir)
      .select(expr("cast(unix_date(to_date(ts)) as bigint)").as("pday"),
        col("user_id")).distinct()
    val days = pairs.select(col("pday").as("day")).distinct()
    pairs
      .select(col("pday"), col("user_id"),
        explode(expr("sequence(pday, pday + 6)")).as("day"))
      .join(broadcast(days), "day")
      .groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("wau7"),
        count_distinct(when(col("pday") === col("day"), col("user_id")))
          .as("dau"))
      .orderBy(col("day"))
  }

  // ------------------------------------------------------- attribution

  /** First-touch / last-touch attribution for purchases: per purchase
    * event, the user's first-ever event type (first touch) and the most
    * recent NON-purchase type strictly before it (last touch; 'direct'
    * when the purchase opens the history), rolled up to the
    * (first_touch, last_touch) matrix with purchase count, distinct
    * buyers, and attributed value. (ts, event_id) is a total order, so
    * both window reads are deterministic.
    *
    * Scale posture: both windows partition by user_id — one shuffle,
    * per-user sequences; the rollup output is |types|² rows. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val byTs = Seq(col("ts"), col("event_id"))
    val wFull = Window.partitionBy(col("user_id")).orderBy(byTs: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.partitionBy(col("user_id")).orderBy(byTs: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("first_touch", first(col("event_type")).over(wFull))
      .withColumn("last_touch",
        coalesce(last(when(col("event_type") =!= "purchase",
          col("event_type")), ignoreNulls = true).over(wPrev), lit("direct")))
      .filter(col("event_type") === "purchase")
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_purchases"),
        count_distinct(col("user_id")).as("n_buyers"),
        sum(dec(col("value"))).cast(DoubleType).as("attributed_value"))
      .orderBy(col("first_touch"), col("last_touch"))
  }

  // ----------------------------------------------------------- z-score

  /** Daily-volume z-scores per event type — the monitoring/anomaly
    * operator. Same exactness contract as `rel_corr`: counts are
    * integers, the per-type moments (Σn, Σn²) are DECIMAL(38,0) sums
    * (HUGEINT in the oracle), the cancellation-prone numerator
    * n·days − Σn and variance days·Σn² − (Σn)² are computed in exact
    * integer arithmetic, and only the final ratio is IEEE:
    * z = (n·days − Σn) / sqrt(days·Σn² − (Σn)²) — the population
    * z-score, one correctly-rounded conversion per term.
    *
    * Scale posture: events collapse to (type, day) counts (one
    * partial-agg shuffle); the 5-row moment table broadcasts back. At
    * 100 TB, n ~ 1e9/day keeps n² inside a long and the moments inside
    * 38 digits. */
  def dailyZscore(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("cast(unix_date(to_date(ts)) as bigint)").as("day"))
      .agg(count(lit(1)).as("n"))
    val moments = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("days"), sum(d0(col("n"))).as("m1"),
        sum(d0(col("n") * col("n"))).as("m2"))
    val d38 = col("days").cast(DecimalType(38, 0))
    daily.join(broadcast(moments), "event_type")
      .select(col("event_type"), col("day"), col("n"),
        ((col("n") * d38 - col("m1")).cast(DoubleType) /
          sqrt((d38 * col("m2") - col("m1") * col("m1")).cast(DoubleType)))
          .as("z"))
      .withColumn("is_outlier",
        (abs(col("z")) >= 2.0).cast("long"))
      .orderBy(col("event_type"), col("day"))
  }

  // -------------------------------------------------------- user paths

  /** ClickHouse-style user-path analytics: each user's first 8 events
    * (by the (ts, event_id) total order) joined into a '>' journey
    * string, rolled up to (path, n_users). The row_number cap bounds
    * the string at 8 segments, so the path cardinality — and the final
    * aggregate — stays |types|⁸-bounded regardless of corpus size.
    *
    * The per-user join is order-tagged: sort_array over (rn, type)
    * structs, NOT collect_list order (which is partition-dependent). */
  def pathStrings(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8)
      .groupBy(col("user_id"))
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(rn, event_type))), s -> s.event_type)"),
        ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
  }

  // ------------------------------------------------- entity resolution

  /** Blocked edit-distance entity resolution over part names — the
    * catalog-dedup pattern: collapse rows to distinct entities first
    * (64 names regardless of part count — the blocking input must be
    * entity-, not row-, sized), block on the head noun (last token), and
    * compare only within blocks: Σ block² pairs instead of n². Pairs at
    * Levenshtein 1–3 surface as merge candidates with each side's row
    * support. Distances are integers — exact across engines.
    *
    * At 100 TB the same shape holds: entities ≪ rows (the groupBy is
    * the corpus-sized shuffle), and hot blocks — not corpus size —
    * bound the pair count; a second blocking key (first token) would
    * split any hot block the way the LSH band split does in `Dedup`. */
  def nameEr(spark: SparkSession, dir: String): DataFrame = {
    val ents = Tables.part(spark, dir)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("block", regexp_extract(col("p_name"), "[^ ]+$", 0))
    val a = ents.select(col("block"), col("p_name").as("name_a"),
      col("n_parts").as("n_parts_a"))
    val b = ents.select(col("block"), col("p_name").as("name_b"),
      col("n_parts").as("n_parts_b"))
    a.join(b, "block")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist").between(1, 3))
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_parts_a"), col("n_parts_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Robust (MAD) twin of [[dailyZscore]]: the same per-(type, day)
    * counts scored by the median/median-absolute-deviation instead of
    * mean/stddev — the estimator that does NOT get dragged by the very
    * outliers it is hunting (one bot-spike day inflates stddev and can
    * mask a second spike; it barely moves the MAD). Two exact-`percentile`
    * aggregates per type (DuckDB `quantile_cont` parity precedented by
    * `x_quantity_median`), both joined back broadcast; the consistency
    * constant 1.4826 (≈ 1/Φ⁻¹(3/4)) rescales MAD to σ-equivalent units
    * so the 3.0 flag threshold matches the z-score convention. A
    * constant series has MAD 0 → NULL score (nullif), flagged false. */
  def dailyMad(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("cast(unix_date(to_date(ts)) as bigint)").as("day"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy(col("event_type"))
      .agg(percentile(col("n"), lit(0.5)).as("med"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("n") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .select(col("event_type"), col("day"), col("n"), col("med"), col("mad"),
        ((col("n") - col("med")) / (lit(1.4826) * expr("nullif(mad, 0.0d)")))
          .as("robust_z"))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) >= 3.0, lit(false)).cast("long"))
      .orderBy(col("event_type"), col("day"))
  }

  /** dbt `source freshness` analogue: per source, the newest loaded
    * record (epoch-day/µs integer, per the oracle-parity rule), the
    * row count, and staleness in days against the corpus' own
    * observation horizon (the max across sources — deterministic,
    * where dbt uses wall-clock `now()`; a production deployment passes
    * the run timestamp in). One metadata-cheap aggregate per source,
    * unioned — the freshness gate every warehouse run starts with. */
  def sourceFreshness(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Seq(
      Tables.orders(spark, dir).agg(
        lit("orders").as("source"),
        max(expr("cast(unix_date(to_date(o_orderdate)) as bigint)")).as("max_epoch_day"),
        count(lit(1)).as("n_rows")),
      Tables.lineitem(spark, dir).agg(
        lit("lineitem").as("source"),
        max(expr("cast(unix_date(to_date(l_shipdate)) as bigint)")).as("max_epoch_day"),
        count(lit(1)).as("n_rows")),
      Tables.events(spark, dir).agg(
        lit("events").as("source"),
        max(expr("cast(unix_date(to_date(ts)) as bigint)")).as("max_epoch_day"),
        count(lit(1)).as("n_rows"))
    ).reduce(_ unionAll _)
    val horizon = Window.partitionBy()
    perSource
      .withColumn("stale_days",
        (max(col("max_epoch_day")).over(horizon) - col("max_epoch_day")))
      .orderBy(col("source"))
  }

  // -------------------------------------------------------- approx topK

  /** ClickHouse-`topK` analogue via Spark 4's ApproxTopK sketch —
    * mergeable frequent-items state, the 100 TB path for "top N values"
    * without a full groupBy when the value domain explodes. The sketch
    * is EXACT while the tracked-item budget (default 10⁴) covers the
    * true cardinality — the fixtures' event-type domain (5) is far
    * inside it, which is what lets this query be oracle-paired against
    * the plain exact histogram rather than rows-only. The exploded
    * output is re-sorted (est desc, item) so sketch-internal order never
    * reaches the result. */
  def approxTopK(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(expr("approx_top_k(event_type, 8)").as("tk"))
      .select(explode(col("tk")).as("s"))
      .select(col("s.item").as("item"), col("s.count").cast("long").as("est"))
      .orderBy(col("est").desc, col("item"))

  /** ClickHouse `topKWeighted` analogue: top brands by revenue via the
    * bounded-state weighted Misra-Gries summary
    * ([[graft.functions.MisraGriesAgg]] — m = 64 counters per task,
    * map-side-mergeable, never a brand-keyed shuffle of the fact
    * table). The 25-brand domain sits far inside the counter budget,
    * so every estimate is exact and the query oracle-pairs against
    * plain SUM-GROUP BY (the x_approx_topk policy); the same plan over
    * a billion-key domain degrades to the ε = 1/(m+1) frequent-items
    * contract, which CatalystAggSpec exercises above the cap. Revenue
    * rides as exact integer cents (DECIMAL round), so weights are
    * hash-stable across engines. */
  def topKWeightedBrands(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr("cast(round(cast(l_extendedprice as decimal(38,6)) * 100) as bigint)")
          .as("cents"))
    val brands = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    li.join(broadcast(brands), col("l_partkey") === col("p_partkey"))
      .agg(graft.functions.MisraGriesAgg
        .topKWeighted(col("p_brand"), col("cents"), 64, 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("brand"), col("e.est").as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("brand"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_topk_weighted"      -> topKWeightedBrands,
    "x_scd2_dim"           -> scd2Dim,
    "x_referential_tests"  -> referentialTests,
    "ev_trailing_distinct" -> trailingDistinct,
    "ev_attribution"       -> attribution,
    "ev_daily_zscore"      -> dailyZscore,
    "ev_path_strings"      -> pathStrings,
    "dedup_name_er"        -> nameEr,
    "x_approx_topk"        -> approxTopK,
    "x_source_freshness"   -> sourceFreshness,
    "ev_daily_mad"         -> dailyMad)

  override val oracles: Map[String, String] = Map(
    "ev_daily_mad" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |         COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
        |        FROM daily GROUP BY 1),
        |dev AS (SELECT d.event_type, d.day, d.n, m.med, ABS(d.n - m.med) AS adev
        |        FROM daily d JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |        FROM dev GROUP BY 1)
        |SELECT dev.event_type, dev.day, dev.n, dev.med, mad.mad,
        |       (dev.n - dev.med) / (1.4826 * NULLIF(mad.mad, 0.0)) AS robust_z,
        |       CAST(COALESCE(ABS((dev.n - dev.med) / (1.4826 * NULLIF(mad.mad, 0.0)))
        |                     >= 3.0, FALSE) AS BIGINT) AS is_outlier
        |FROM dev JOIN mad USING (event_type)
        |ORDER BY 1, 2""".stripMargin,
    "x_source_freshness" ->
      """WITH f AS (
        |  SELECT 'orders' AS source,
        |         MAX(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) AS max_epoch_day,
        |         COUNT(*) AS n_rows
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem',
        |         MAX(CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)),
        |         COUNT(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'events',
        |         MAX(CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)),
        |         COUNT(*)
        |  FROM events)
        |SELECT source, max_epoch_day, n_rows,
        |       CAST(MAX(max_epoch_day) OVER () - max_epoch_day AS BIGINT) AS stale_days
        |FROM f ORDER BY source""".stripMargin,
    "x_scd2_dim" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderpriority,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS rn_all,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderpriority
        |           ORDER BY o_orderdate, o_orderkey) AS rn_val
        |  FROM orders),
        |seg AS (
        |  SELECT o_custkey, o_orderpriority,
        |         MIN(day) AS valid_from, COUNT(*) AS n_orders,
        |         MIN(rn_all) AS seg_ord
        |  FROM o GROUP BY o_custkey, o_orderpriority, rn_all - rn_val)
        |SELECT o_custkey, o_orderpriority, valid_from,
        |       LEAD(valid_from) OVER (PARTITION BY o_custkey
        |         ORDER BY seg_ord) AS valid_to,
        |       n_orders, seg_ord
        |FROM seg
        |ORDER BY o_custkey, valid_from, o_orderpriority, seg_ord""".stripMargin,
    "x_referential_tests" ->
      """SELECT * FROM (
        |  SELECT 'customer_nationkey_fk' AS test_name, COUNT(*) AS n_violations
        |    FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |  UNION ALL
        |  SELECT 'lineitem_orderkey_fk', COUNT(*)
        |    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'lineitem_partkey_fk', COUNT(*)
        |    FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
        |  UNION ALL
        |  SELECT 'lineitem_suppkey_fk', COUNT(*)
        |    FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
        |  UNION ALL
        |  SELECT 'nation_regionkey_fk', COUNT(*)
        |    FROM nation WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region)
        |  UNION ALL
        |  SELECT 'orders_custkey_fk', COUNT(*)
        |    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'supplier_nationkey_fk', COUNT(*)
        |    FROM supplier WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |  UNION ALL
        |  SELECT 'customer_custkey_unique',
        |         COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer
        |  UNION ALL
        |  SELECT 'orders_orderkey_unique',
        |         COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'orders_status_accepted',
        |         COUNT(*) FILTER (o_orderstatus NOT IN ('O','F','P')) FROM orders
        |) ORDER BY test_name""".stripMargin,
    "ev_trailing_distinct" ->
      """WITH pairs AS (
        |  SELECT DISTINCT
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS pday,
        |         user_id
        |  FROM events),
        |days AS (SELECT DISTINCT pday AS day FROM pairs)
        |SELECT day,
        |       COUNT(DISTINCT user_id) AS wau7,
        |       COUNT(DISTINCT CASE WHEN pday = day THEN user_id END) AS dau
        |FROM pairs JOIN days ON pday BETWEEN day - 6 AND day
        |GROUP BY day ORDER BY day""".stripMargin,
    "ev_attribution" ->
      """WITH t AS (
        |  SELECT user_id, event_type, value,
        |         FIRST_VALUE(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS first_touch,
        |         COALESCE(LAST_VALUE(
        |             CASE WHEN event_type <> 'purchase' THEN event_type END
        |             IGNORE NULLS) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           'direct') AS last_touch
        |  FROM events)
        |SELECT first_touch, last_touch, COUNT(*) AS n_purchases,
        |       COUNT(DISTINCT user_id) AS n_buyers,
        |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |         AS attributed_value
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_daily_zscore" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |         COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, COUNT(*) AS days,
        |         CAST(SUM(CAST(n AS HUGEINT)) AS HUGEINT) AS m1,
        |         CAST(SUM(CAST(n * n AS HUGEINT)) AS HUGEINT) AS m2
        |  FROM daily GROUP BY 1)
        |SELECT d.event_type, d.day, d.n,
        |       CAST(CAST(d.n AS HUGEINT) * CAST(m.days AS HUGEINT) - m.m1
        |            AS DOUBLE)
        |         / sqrt(CAST(CAST(m.days AS HUGEINT) * m.m2 - m.m1 * m.m1
        |                     AS DOUBLE)) AS z,
        |       CAST(CASE WHEN abs(
        |           CAST(CAST(d.n AS HUGEINT) * CAST(m.days AS HUGEINT) - m.m1
        |                AS DOUBLE)
        |           / sqrt(CAST(CAST(m.days AS HUGEINT) * m.m2 - m.m1 * m.m1
        |                       AS DOUBLE))) >= 2.0
        |         THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM daily d JOIN m USING (event_type)
        |ORDER BY d.event_type, d.day""".stripMargin,
    "ev_path_strings" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, STRING_AGG(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 8 GROUP BY user_id)
        |SELECT path, COUNT(*) AS n_users
        |FROM p GROUP BY path ORDER BY n_users DESC, path""".stripMargin,
    "dedup_name_er" ->
      """WITH e AS (
        |  SELECT p_name, COUNT(*) AS n_parts,
        |         regexp_extract(p_name, '[^ ]+$') AS block
        |  FROM part GROUP BY 1)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
        |       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
        |FROM e a JOIN e b ON a.block = b.block AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
        |ORDER BY name_a, name_b""".stripMargin,
    "x_approx_topk" ->
      """SELECT event_type AS item, COUNT(*) AS est
        |FROM events GROUP BY 1 ORDER BY est DESC, item""".stripMargin,
    "x_topk_weighted" ->
      """SELECT p_brand AS brand,
        |       CAST(SUM(CAST(round(CAST(l_extendedprice AS DECIMAL(38,6)) * 100)
        |                     AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 10""".stripMargin)
}
