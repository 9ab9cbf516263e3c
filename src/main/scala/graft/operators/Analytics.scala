package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-series imputation, rank analytics, per-document keyword
  * extraction, and activity profiling — round-6 widening of the
  * analytics surface. Every query is oracle-paired; the determinism
  * contracts follow `Relational`/`Events` (decimal-sum averages, exact
  * integer counts into ONE IEEE division, epoch-day bigint dates,
  * fully tie-broken orders).
  */
object Analytics extends QueryPack {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 6))

  /** Last-observation-carried-forward gap fill — the time-series
    * imputation twin of `x_gap_fill_daily` (which fills zeros): sparse
    * daily average order value per priority, projected onto the full
    * calendar grid, gaps carrying the most recent observed value.
    * Days before a priority's first observation stay NULL — LOCF has
    * nothing to carry, and fabricating a value would be wrong.
    *
    * Scale posture: the observed aggregate is one partial-agg shuffle;
    * the calendar grid is |days|×|priorities| rows built from a 1-row
    * span aggregate (never corpus-sized); the LOCF window partitions by
    * priority — bounded frames, no global sort. */
  def gapFillLocf(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val daily = o.groupBy(col("o_orderpriority").as("priority"),
        expr("cast(unix_date(to_date(o_orderdate)) as bigint)").as("day"))
      .agg((sum(dec(col("o_totalprice"))).cast(DoubleType) / count(lit(1)))
        .as("avg_price"))
    val grid = o.agg(
        expr("cast(unix_date(to_date(min(o_orderdate))) as bigint)").as("d0"),
        expr("cast(unix_date(to_date(max(o_orderdate))) as bigint)").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .crossJoin(o.select(col("o_orderpriority").as("priority")).distinct())
    val w = Window.partitionBy(col("priority")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("priority", "day"), "left")
      .select(col("priority"), col("day"),
        last(col("avg_price"), ignoreNulls = true).over(w).as("avg_price_locf"),
        col("avg_price").isNotNull.cast("long").as("is_observed"))
      .orderBy(col("priority"), col("day"))
  }

  /** PERCENT_RANK + CUME_DIST of suppliers by account balance within
    * nation — the distribution-rank window pair. The window order
    * includes the key (acctbal, suppkey), a total order, so rank values
    * are deterministic even under balance ties. Both functions are
    * (rank−1)/(n−1)-style integer ratios → one IEEE division, identical
    * across engines. */
  def percentRankSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal"), col("s_suppkey"))
    Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("s_nationkey"),
        col("s_acctbal"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .orderBy(col("s_nationkey"), col("s_suppkey"))
  }

  /** Per-document keyword extraction: top-3 terms by tf·N/df (the
    * integer-ratio core of tf-idf — no log, so no libm ulp drift
    * between engines; log is monotone in N/df, so the RANKING is the
    * tf-idf ranking whenever tf ties don't cross, and ties break
    * lexicographically either way).
    *
    * Scale posture: tf is the corpus-sized shuffle (doc_id, term);
    * df is vocab-bounded and joins back term-keyed; the top-3 window
    * partitions by doc_id — per-doc frames. */
  def docKeywords(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tf = docs
      .select(col("doc_id"), explode(expr("split(text, ' ')")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df_, "term").crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast(DoubleType) / col("df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk").cast("long").as("rnk"), col("term"),
        col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** Hour-of-week activity heatmap: (ISO weekday × hour) event counts
    * and share of total — the load-profile matrix capacity planning and
    * anomaly baselines read from. 168 output rows regardless of corpus
    * size; share = count / total in one integer→IEEE division. */
  def hourHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy((weekday(col("ts")) + 1).cast("long").as("isodow"),
        hour(col("ts")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"))
    val total = Window.partitionBy()
    cells
      .select(col("isodow"), col("hour"), col("n"),
        (col("n").cast(DoubleType) / sum(col("n")).over(total)).as("share"))
      .orderBy(col("isodow"), col("hour"))
  }

  /** Snapshot diff audit (dbt audit-helper analogue): row-level
    * reconciliation of two per-customer revenue snapshots built from
    * overlapping order windows (1995–97 vs 1996–98), classified per key
    * as added / removed / changed / unchanged via one FULL OUTER join,
    * rolled up to a per-class report with key counts and the exact
    * decimal revenue delta. The detail rows are the join output; only
    * the bounded report materializes.
    *
    * Scale posture: both snapshots are partial-agg collapses of the
    * fact table; the diff join is keyed on the snapshot key (one
    * shuffle, co-partitioned); the classification is a map-side CASE.
    * Equality on DECIMAL(38,6) sums is exact — no float fuzz in the
    * changed/unchanged split. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    def snap(lo: Int, hi: Int) = Tables.orders(spark, dir)
      .filter(expr(s"year(o_orderdate) between $lo and $hi"))
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"), count(lit(1)).as("n"))
    val a = snap(1995, 1997).select(col("o_custkey").as("k"),
      col("rev").as("rev_a"), col("n").as("n_a"))
    val b = snap(1996, 1998).select(col("o_custkey").as("k"),
      col("rev").as("rev_b"), col("n").as("n_b"))
    a.join(b, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("rev_a").isNull, "added")
          .when(col("rev_b").isNull, "removed")
          .when(col("rev_a") === col("rev_b") && col("n_a") === col("n_b"),
            "unchanged")
          .otherwise("changed").as("change_type"),
        coalesce(col("rev_b"), lit(0)).cast(DecimalType(38, 6))
          .minus(coalesce(col("rev_a"), lit(0)).cast(DecimalType(38, 6)))
          .as("delta"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("delta")).cast(DoubleType).as("revenue_delta"))
      .orderBy(col("change_type"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_snapshot_diff"   -> snapshotDiff,
    "x_gap_fill_locf"   -> gapFillLocf,
    "rel_percent_rank"  -> percentRankSuppliers,
    "text_doc_keywords" -> docKeywords,
    "ev_hour_heatmap"   -> hourHeatmap)

  override val oracles: Map[String, String] = Map(
    "x_snapshot_diff" ->
      """WITH a AS (
        |  SELECT o_custkey AS k,
        |         SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev_a,
        |         COUNT(*) AS n_a
        |  FROM orders WHERE EXTRACT(year FROM o_orderdate) BETWEEN 1995 AND 1997
        |  GROUP BY 1),
        |b AS (
        |  SELECT o_custkey AS k,
        |         SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev_b,
        |         COUNT(*) AS n_b
        |  FROM orders WHERE EXTRACT(year FROM o_orderdate) BETWEEN 1996 AND 1998
        |  GROUP BY 1),
        |d AS (
        |  SELECT COALESCE(a.k, b.k) AS k,
        |         CASE WHEN a.rev_a IS NULL THEN 'added'
        |              WHEN b.rev_b IS NULL THEN 'removed'
        |              WHEN a.rev_a = b.rev_b AND a.n_a = b.n_b THEN 'unchanged'
        |              ELSE 'changed' END AS change_type,
        |         CAST(COALESCE(b.rev_b, 0) AS DECIMAL(38,6))
        |           - CAST(COALESCE(a.rev_a, 0) AS DECIMAL(38,6)) AS delta
        |  FROM a FULL OUTER JOIN b ON a.k = b.k)
        |SELECT change_type, COUNT(*) AS n_keys,
        |       CAST(SUM(delta) AS DOUBLE) AS revenue_delta
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_gap_fill_locf" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |           / COUNT(*) AS avg_price
        |  FROM orders GROUP BY 1, 2),
        |span AS (
        |  SELECT CAST(MIN(CAST(o_orderdate AS DATE)) - DATE '1970-01-01' AS BIGINT) AS d0,
        |         CAST(MAX(CAST(o_orderdate AS DATE)) - DATE '1970-01-01' AS BIGINT) AS d1
        |  FROM orders),
        |grid AS (
        |  SELECT p.priority, g.day
        |  FROM (SELECT DISTINCT o_orderpriority AS priority FROM orders) p,
        |       (SELECT UNNEST(generate_series(d0, d1)) AS day FROM span) g)
        |SELECT grid.priority, grid.day,
        |       LAST_VALUE(daily.avg_price IGNORE NULLS) OVER (
        |         PARTITION BY grid.priority ORDER BY grid.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS avg_price_locf,
        |       CAST(daily.avg_price IS NOT NULL AS BIGINT) AS is_observed
        |FROM grid LEFT JOIN daily
        |  ON grid.priority = daily.priority AND grid.day = daily.day
        |ORDER BY grid.priority, grid.day""".stripMargin,
    "rel_percent_rank" ->
      """SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS s_nationkey,
        |       s_acctbal,
        |       PERCENT_RANK() OVER (PARTITION BY s_nationkey
        |         ORDER BY s_acctbal, s_suppkey) AS pr,
        |       CUME_DIST() OVER (PARTITION BY s_nationkey
        |         ORDER BY s_acctbal, s_suppkey) AS cd
        |FROM supplier ORDER BY s_nationkey, s_suppkey""".stripMargin,
    "text_doc_keywords" ->
      """WITH tf AS (
        |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        |  FROM documents),
        |tfc AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
        |dfc AS (
        |  SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
        |         CAST(tfc.tf * n.n_docs AS DOUBLE) / dfc.df AS score
        |  FROM tfc JOIN dfc USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rnk
        |  FROM scored)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, df, score
        |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "ev_hour_heatmap" ->
      """WITH cells AS (
        |  SELECT CAST(isodow(ts) AS BIGINT) AS isodow,
        |         CAST(hour(ts) AS BIGINT) AS hour, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT isodow, hour, n,
        |       CAST(n AS DOUBLE) / SUM(n) OVER () AS share
        |FROM cells ORDER BY isodow, hour""".stripMargin)
}
