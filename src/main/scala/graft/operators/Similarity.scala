package graft.operators

import graft.QueryPack
import graft.functions.{HyperplaneSigs, VectorOps}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` fixture
  * (north-star surface; SURVEY.md §2.3 X3): brute-force cosine top-k as
  * the exact baseline, then two sub-linear scale paths — random-
  * hyperplane LSH and IVF (inverted-file) probing with Lloyd-refined
  * centroids.
  *
  * Scale posture: the query set is small and broadcast; the corpus scan
  * is the only large side, so brute force is one pass, no shuffle on the
  * corpus — at 100 TB the LSH/IVF variants cut the *rerank* set, and the
  * bucket/centroid assignment is a map-side computation against a
  * reference-object plane array ([[HyperplaneSigs]]) or a broadcast
  * centroid table.
  *
  * Parameter honesty: the fixture embeddings are near-uniform random
  * vectors, the adversarial regime for ANN — high recall inherently
  * costs a large scan fraction (~0.6 here for recall@5 ≥ 0.9, measured
  * in DedupSimilaritySpec). On clustered production embeddings the same
  * machinery prunes far harder at the same recall; the tables/bits/
  * probes knobs below are the tuning surface. That claim is PINNED, not
  * asserted: ClusteredAnnSpec runs the same operators over a
  * deterministic mixture-of-Gaussians corpus
  * ([[graft.sources.SyntheticEmbeddings]]) and measures recall 1.0 at
  * scan fraction 0.087 (LSH, 12-bit tables), 0.125 (IVF, 3 of 25
  * probes), with the uniform-vs-clustered table in SCALE.md.
  *
  * Determinism: hyperplanes come from a fixed LCG seed (no RNG calls);
  * Lloyd means are order-independent long fixed-point sums (6-decimal,
  * the precision decimal(38,6) gave, without per-value BigDecimal
  * boxing); every ranking is (cosine desc, vec_id) so ties are stable;
  * cosine math follows the [[VectorOps]] bit-exact fold contract.
  */
object Similarity extends QueryPack {

  private val K = 5
  private val NQueries = 10

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), VectorOps.norm("embedding").as("nrm"))

  private def rankedTopK(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Exact top-5 cosine neighbors for the first 10 vectors: broadcast the
    * queries, single scan of the corpus, per-query top-k window. */
  def topKBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val q = c.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val pairs = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", VectorOps.dot("qe", "embedding") / (col("qn") * col("nrm")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
    rankedTopK(pairs)
  }

  private val RangeTau = 0.2

  /** Radius (range) search: every corpus vector within cosine ≥ 0.2 of
    * each query — the fixed-threshold twin of [[topKBruteForce]] (ANN
    * benchmarks' "range query"; the retrieval mode semantic dedup and
    * near-dup mining actually run, where the similarity BAR, not the
    * neighbor COUNT, is the contract). Plan: broadcast the 10 queries,
    * one corpus scan, codegen dot product, filter — NO window and no
    * shuffle at all beyond the final presentation sort, so unlike the
    * top-k forms this is embarrassingly parallel at 100 TB: map-only
    * over the corpus with a per-row bounded candidate emit. A
    * production-scale corpus would put the LSH banding of [[topKLsh]]
    * in front as a prefilter; the threshold form keeps exact semantics
    * here because cosine ≥ τ survives the oracle hash gate bit-exactly
    * while a recall-bounded prefilter could not. */
  def rangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val q = c.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        VectorOps.dot("qe", "embedding") / (col("qn") * col("nrm")))
      .filter(col("cosine") >= RangeTau)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("cosine").desc, col("neighbor_id"))
  }

  /** Deterministic pseudo-random hyperplanes in [-1, 1] from a fixed LCG
    * (Numerical Recipes constants) — reproducible across runs/JVMs. */
  private[operators] def hyperplanes(n: Int, dim: Int,
      seed: Long = 0xC0FFEEL): Array[Array[Double]] = {
    var x = seed
    def next(): Double = {
      x = x * 1664525L + 1013904223L
      ((x >>> 16) & 0xFFFFFFL).toDouble / 0xFFFFFFL.toDouble * 2.0 - 1.0
    }
    Array.fill(n)(Array.fill(dim)(next()))
  }

  private val NTables = 8
  private val BitsPerTable = 6
  private val Dim = 64

  /** (tbl, sig) rows for every vector: all tables' signatures computed in
    * ONE fused native-expression pass ([[HyperplaneSigs]]), posexploded. */
  private def withSigs(df: DataFrame, vecCol: String,
      planes: Array[Array[Double]], bits: Int): DataFrame =
    df.select(col("*"),
        posexplode(HyperplaneSigs.sigs(col(vecCol), planes, bits)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "sig")

  /** Candidate (query_id, vec_id) pairs from the LSH tables — the scan
    * set whose size/corpus ratio IS the index's cost (ClusteredAnnSpec
    * measures it on both embedding regimes). Bits-per-table is the
    * regime knob: 6 bits + Hamming-1 multiprobe is the uniform-regime
    * default; clustered corpora support far more bits (signatures
    * concentrate per cluster), which is what cuts the scan fraction. */
  private[graft] def lshCandidateIds(spark: SparkSession, dir: String,
      nTables: Int = NTables, bits: Int = BitsPerTable): DataFrame = {
    val planes = hyperplanes(nTables * bits, Dim)
    // corpus keyed by (table, sig): one row per table per vector
    val c = withSigs(corpus(spark, dir), "embedding", planes, bits)
      .select(col("vec_id"), col("tbl"), col("sig"))
    // queries probe their bucket and every Hamming-1 neighbor per table
    val probes = (0 until bits).map(p => col("sig").bitwiseXOR(lit(1 << p)))
    val q = withSigs(corpus(spark, dir).filter(col("vec_id") < NQueries),
        "embedding", planes, bits)
      .select(col("vec_id").as("query_id"), col("tbl"),
        explode(array(col("sig") +: probes: _*)).as("sig"))
    // dedup candidates on ids only (never on the embedding arrays)
    c.join(broadcast(q), Seq("tbl", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")).distinct()
  }

  /** Clustered-regime signature width: 12 bits/table (4096 cells) —
    * ClusteredAnnSpec's measured operating point, where same-cluster
    * vectors concentrate per bucket and the candidate fraction drops
    * ~an order of magnitude at the same recall floor. The uniform
    * regime keeps [[BitsPerTable]] = 6: its scan FRACTION is
    * bits-determined and n-invariant, and widening bits there would
    * silently shrink it below the recall point (the ScaledAnnSpec
    * invariance note). */
  private val BitsClustered = 12

  /** LSH ANN: 8 independent random-hyperplane tables — 6 bits/table
    * uniform, [[BitsClustered]] when the regime signal reads clustered
    * (the last fixed ANN knob made regime-adaptive; bits is the regime
    * knob, tables the recall-variance knob) — multiprobe at Hamming ≤ 1
    * within each table, exact rerank of union-of-buckets candidates.
    * Rows-only; recall vs [[topKBruteForce]] pinned by
    * DedupSimilaritySpec (uniform fixture) and ClusteredAnnSpec /
    * ScaledAnnSpec (clustered, both scales). */
  def topKLsh(spark: SparkSession, dir: String): DataFrame =
    topKLshParams(spark, dir, NTables,
      if (isClusteredAt(spark, dir)) BitsClustered else BitsPerTable)

  private[graft] def topKLshParams(spark: SparkSession, dir: String,
      nTables: Int, bits: Int): DataFrame = {
    // candidates re-attach the 10 query vectors via a broadcast join
    val candIds = lshCandidateIds(spark, dir, nTables, bits)
    val qVecs = corpus(spark, dir).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val pairs = corpus(spark, dir)
      .select(col("vec_id"), col("embedding").as("ne"), col("nrm").as("nn"))
      .join(broadcast(candIds), Seq("vec_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (VectorOps.dot("qe", "ne") / (col("qn") * col("nn"))).as("cosine"))
    rankedTopK(pairs)
  }

  private val SeedStride = 20
  private val LloydIters = 2

  // ---- Derived index parameters ----------------------------------------
  // The r13/r14 lesson generalized (SemDeDup's k got it first): a fixed
  // index constant is a silent scale hole — at 10-100x the corpus it
  // keeps the fixture's geometry, not the contract. Every sizing knob
  // below DERIVES from the corpus row count n (one count job, driver
  // bookkeeping), and ScaledAnnSpec re-gates recall@5 >= 0.9 at a x10
  // (20k-vector) corpus in BOTH embedding regimes.

  /** IVF cell count ~ ⌈√n⌉ (the standard FAISS sizing: √n cells keeps
    * both the centroid table and the per-cell rerank grain at O(√n)),
    * realized as an exemplar stride so the seed set stays
    * SQL-selectable: stride = ⌊n/⌈√n⌉⌋, seeds = every stride-th vector.
    * n=500 → 24 cells (the fixture's former fixed 25); n=2000 → 46;
    * n=20000 → 142. */
  private[graft] def ivfStride(n: Long): Long = {
    val k = math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong)
    math.max(1L, n / k)
  }

  /** Probe fraction: the measured uniform-regime recall@5 ≥ 0.9 point
    * (17 of 25 cells on the fixture — the adversarial regime; the
    * clustered regime runs 3 probes at the same floor, ClusteredAnnSpec).
    * Deriving probes as a FRACTION of the derived cell count keeps the
    * probed-corpus share — the recall determinant — constant at any n,
    * where a fixed probe count would silently shrink it. */
  private val ProbeFrac = 0.68

  private[graft] def ivfProbes(k: Int): Int =
    math.max(1, math.min(k, math.ceil(k * ProbeFrac).toInt))

  // ---- Regime-adaptive defaults (r15 verdict item 4) -------------------
  // The derived UNIFORM-regime parameter curves above are near-linear
  // scan fractions — the honest price of direction-uniform random
  // vectors, where no index prunes. Production embeddings are
  // clustered, and there the measured operating points (ClusteredAnnSpec)
  // prune an order of magnitude harder at the same recall floor. The
  // index now ESTIMATES its regime from assignment statistics it
  // computes anyway and selects the curve, instead of paying the
  // uniform price on clustered data.

  /** Exemplar count for the regime probe: enough that every plausible
    * cluster is represented (any cluster holding ≥ ~1/64 of the corpus
    * hits an exemplar w.h.p.), few enough that the probe is one
    * map-side argmax over a 64-entry literal. */
  private val RegimeExemplars = 64

  /** Regime decision threshold on [[regimeSignal]]. Measured: the
    * driver's near-uniform fixture reads ~0.3 (best-of-64 random
    * 64-dim cosines ≈ 2σ ≈ 0.25-0.35); the mixture-of-Gaussians
    * fixture reads ~0.95 (σ=0.15 noise around norm-4.6 centers ⇒
    * same-cluster cosine ≈ 4.6²/(4.6²+1.2²)). 0.6 splits the regimes
    * with wide margin on both sides; an ambiguous corpus falls back to
    * the conservative uniform curve. */
  private val ClusteredSignal = 0.6

  /** Mean best-cosine of each (nonzero-norm) corpus vector against
    * ≤ [[RegimeExemplars]] stride exemplars — the clusteredness
    * estimate driving the regime selection. Why not the centroid
    * OCCUPANCY histogram alone: k-means with mass-proportional stride
    * seeds equalizes cell mass in BOTH regimes, so occupancy barely
    * separates them; the assignment GEOMETRY (how close rows sit to
    * their best exemplar) separates by ~3× (see [[ClusteredSignal]]).
    * Cost: one count-free map-side argmax pass + a 1-row avg — the
    * same shape as one Lloyd assignment round, at 64/k of its width. */
  private[graft] def regimeSignal(spark: SparkSession, c: DataFrame,
      n: Long): Double = {
    import spark.implicits._
    val stride = math.max(1L, n / RegimeExemplars)
    val ex = c.filter(col("vec_id") % stride === 0 &&
        col("vec_id") < stride * RegimeExemplars)
      .select((col("vec_id") / stride).cast("int").as("cid"), col("embedding"))
      .as[(Int, Array[Float])].collect().sortBy(_._1).toSeq
    if (ex.isEmpty) return 0.0
    c.filter(col("nrm") > 0)
      .select(assignedCentBest(ex, "embedding", "nrm")
        .getField("best").as("b"))
      .agg(avg(col("b"))).as[Double].head()
  }

  // ---- Per-corpus trained-statistic cache -------------------------------
  // Centroids, regime signals, PQ/residual codebooks, and the OPQ
  // rotation are all STATISTICS OF THE CORPUS, not of any one query —
  // an index serves many queries, and re-training per key was measured
  // waste (canonical-cache precedent; sim_topk_opq retrained R + books
  // per invocation at 5.5 s/key in the r16 sweep). One cache holds them
  // all, keyed by:
  //  - the session UUID STRING (not the SparkSession object — a strong
  //    session reference would pin every stopped session's state for
  //    the process lifetime);
  //  - a corpus FINGERPRINT (file listing + sizes + mtimes of the
  //    embeddings parquet), so a same-path fixture REWRITE invalidates
  //    naturally instead of serving stale statistics — previously the
  //    contract was only enforced by test convention (clear + fresh
  //    temp dirs);
  //  - a tag naming the statistic and its parameters.
  // Bounded: at [[StatCacheMax]] entries the whole cache clears (the
  // values are re-derivable; correctness never depends on a hit).
  private val statCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), Any]
  private val StatCacheMax = 512

  /** Cheap invalidation signal: the embeddings parquet's file listing
    * with sizes and mtimes. Unlistable paths (remote schemes) fall back
    * to the dir string — per-path caching without rewrite detection,
    * the pre-r17 contract (callers must clear explicitly). */
  private[graft] def corpusFingerprint(dir: String): String = {
    val root = new java.io.File(s"$dir/embeddings.parquet")
    val files =
      if (root.isDirectory)
        Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(_.isFile).sortBy(_.getName)
      else if (root.isFile) Array(root)
      else Array.empty[java.io.File]
    if (files.isEmpty) s"unlistable:$dir"
    else files.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString(s"$dir|", ",", "")
  }

  private def statCached[T](spark: SparkSession, dir: String, tag: String)(
      train: => T): T = {
    if (statCache.size > StatCacheMax) statCache.clear()
    statCache.getOrElseUpdate(
      (org.apache.spark.sql.GraftBridge.sessionUUID(spark),
        corpusFingerprint(dir), tag), train).asInstanceOf[T]
  }

  /** Test seam: drop every cached per-corpus statistic (regime signal,
    * centroids, codebooks, rotation) so a rerun genuinely retrains. */
  def clearStatCache(): Unit = statCache.clear()
  def clearRegimeCache(): Unit = clearStatCache()
  def clearCentroidCache(): Unit = clearStatCache()

  /** [[regimeSignal]] off a fixture dir, cached per corpus. */
  private[graft] def regimeSignalAt(spark: SparkSession, dir: String): Double =
    statCached(spark, dir, "regime") {
      val c = corpus(spark, dir)
      regimeSignal(spark, c, c.count())
    }

  private[graft] def isClusteredAt(spark: SparkSession, dir: String): Boolean =
    regimeSignalAt(spark, dir) >= ClusteredSignal

  /** Clustered-regime probe fraction with its floor: ≈ 1.6× the
    * 20-cluster fixture's per-cluster cell share (a cluster spans
    * ~k/C cells, so probing 0.08·k covers the query's whole cluster
    * with margin at C = 20, and more easily at larger C), floored at
    * the measured 3-probe fixture operating point. */
  private val ProbeFracClustered = 0.08
  private val ProbesClusteredFloor = 3

  private[graft] def ivfProbesRegime(k: Int, clustered: Boolean): Int =
    if (!clustered) ivfProbes(k)
    else math.max(ProbesClusteredFloor,
      math.min(k, math.ceil(k * ProbeFracClustered).toInt))

  /** Clustered-regime ADC shortlist: 1.5× the expected cluster size at
    * the fixture's C = 20 (ADC codes resolve BETWEEN clusters, not
    * within one — the shortlist must still cover the query's cluster;
    * ClusteredAnnSpec's measured 150-row point at n = 2000 is exactly
    * this 0.075·n), floored at that measured point. */
  private val PqShortFracClustered = 0.075

  private[graft] def pqShortlistRegime(n: Long, clustered: Boolean): Int =
    if (!clustered) pqShortlist(n)
    else math.max(150, math.ceil(n * PqShortFracClustered).toInt)

  /** Nearest-`keep` centroids per row against a broadcast centroid
    * table; ties break on cent_id (deterministic). */
  private def nearest(df: DataFrame, cents: DataFrame, keep: Int,
      idCol: String, eCol: String, nCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cdist").desc, col("cent_id")) // cosine desc = nearest
    df.join(broadcast(cents))
      .withColumn("cdist", VectorOps.dot(eCol, "ce") / (col(nCol) * col("cn")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= keep)
  }

  /** Literal centroid table as a column — array<struct<_1: cid,
    * _2: vec, _3: norm>> packed into ONE `Literal` node via typedlit
    * (a CreateArray tree of 25×64 scalar literals re-compiles codegen on
    * every invocation, since each Lloyd run produces fresh values — that
    * cold cost measured ~2× the query itself). The norm folds on the
    * driver in the same array-order double accumulation as
    * [[VectorOps.norm]]. */
  private def centArray(cents: Seq[(Int, Array[Float])]): Column =
    typedlit(cents.map { case (cid, vec) =>
      (cid, vec.toSeq,
        math.sqrt(vec.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))
    })

  /** Nearest-centroid (best cosine, cent_id) for each row as a PURE
    * MAP-SIDE pass — no join, no window, no shuffle — via the codegen
    * [[graft.functions.CellArgmax]] expression (centroids ride as
    * reference objects, O(1) generated code in k·dim). Ties break to
    * the lowest cent_id (strict `>` keeps the earlier entry), matching
    * the (cosine desc, cent_id) window order used for probes.
    *
    * Zero-norm or NaN embeddings are deliberately EXCLUDED: their cosine
    * is NULL/NaN, never `>` the accumulator, so cent_id stays -1 and the
    * vector joins no probe list — an undefined-direction vector has no
    * meaningful cosine neighbors. (The fixture corpus contains none; a
    * production ingest should drop or impute them upstream, mirroring
    * the nullif guard in quantizeInt8.)
    *
    * History: through r16 this was an interpreted `aggregate(...)` fold
    * over a `typedlit` centroid array — k lambda dispatches per row,
    * measured (SCALE.md, the capped 2M-vector decade) as the dominant
    * cost of every IVF-family key at scale. The fold is retained below
    * as [[argmaxFoldRef]], solely as CellArgmaxSpec's bit-equality
    * oracle. */
  /** The INTERPRETED reference fold, over ANY array<struct<_1 id,
    * _2 vec, _3 norm>> column — retained as the spec oracle for the
    * codegen expression (identical IEEE order by construction:
    * graft_dot ascending accumulation, divide by rowNorm·centNorm,
    * try_divide's NULL-on-zero-denominator semantics). */
  private def argmaxFold(arr: Column, eCol: String, nCol: String): Column =
    aggregate(arr,
      struct(lit(Double.MinValue).as("best"), lit(-1).as("cid")),
      (acc, c) => {
        // try_divide: a zero-norm row's cosine is NULL (ANSI mode makes
        // a plain divide THROW on /0, even for doubles), NULL > x is
        // never true, so the fold keeps cid -1 — the documented
        // undefined-direction degradation instead of a task failure
        val cos = try_divide(
          call_function("graft_dot", c.getField("_2"), col(eCol)),
          col(nCol) * c.getField("_3"))
        when(cos > acc.getField("best"),
          struct(cos.as("best"), c.getField("_1").as("cid"))).otherwise(acc)
      })

  /** Spec-only: the r16 interpreted flat assignment, bit-equality
    * oracle for [[graft.functions.CellArgmax]] (CellArgmaxSpec). */
  private[graft] def argmaxFoldRef(cents: Seq[(Int, Array[Float])],
      eCol: String, nCol: String): Column =
    argmaxFold(centArray(cents), eCol, nCol)

  /** Spec-only: the r16 interpreted NESTED assignment (fold over a
    * runtime-selected slice of a nested literal), bit-equality oracle
    * for [[graft.functions.CellArgmaxNested]]. */
  private[graft] def argmaxFoldNestedRef(slices: Seq[Seq[(Int, Array[Float])]],
      sid: Column, eCol: String, nCol: String): Column = {
    val nested = typedlit(slices.map(_.map { case (cid, vec) =>
      (cid, vec.toSeq, math.sqrt(fdot(vec, vec))) }))
    argmaxFold(element_at(nested, sid + 1), eCol, nCol)
  }

  private def assignedCentBest(cents: Seq[(Int, Array[Float])],
      eCol: String, nCol: String): Column =
    graft.functions.CellArgmax.best(col(eCol), col(nCol), cents)

  private def assignedCentId(cents: Seq[(Int, Array[Float])],
      eCol: String, nCol: String): Column =
    assignedCentBest(cents, eCol, nCol).getField("cid")

  /** The FROZEN serving-index statistics a vector-ingest path assigns
    * against ([[graft.streaming.VectorStream]]): the standing corpus's
    * derived-stride IVF centroids + PQ codebooks, trained ONCE (the
    * production contract — arriving vectors are encoded under the
    * index that is serving; retraining is an offline rebuild, never a
    * per-batch side effect). Rides the per-corpus centroid cache. */
  private[graft] def servingIndex(spark: SparkSession, dir: String)
      : (Seq[(Int, Array[Float])], Seq[Seq[(Int, Array[Double])]]) = {
    val c = pqCorpus(spark, dir)
    val n = c.count()
    (lloydCentroidsFor(spark, dir, c, LloydIters, ivfStride(n), "pq"),
      pqCodebooksFor(spark, dir, c))
  }

  /** Index-entry encoding of arbitrary (vec_id, embedding) rows under
    * frozen stats: (vec_id, cent_id, codes) — the posting a serving
    * IVF-PQ index appends per vector. Pure map-side codegen against
    * broadcast-sized statistics (the [[topKIvfPq]] encode stage as a
    * reusable seam); zero-norm vectors degrade to cent_id −1 / all −1
    * codes, the documented undefined-direction contract. */
  private[graft] def encodeForIndex(df: DataFrame,
      cents: Seq[(Int, Array[Float])],
      books: Seq[Seq[(Int, Array[Double])]]): DataFrame =
    df.select(col("vec_id"), col("embedding"),
        VectorOps.norm("embedding").as("nrm"))
      .select(col("vec_id"),
        assignedCentId(cents, "embedding", "nrm").as("cent_id"),
        graft.functions.PqEncode.codes(col("embedding"), books).as("codes"))

  /** Lloyd-refined IVF centroids: deterministic every-`stride`-th-vector
    * seeds (stride from [[ivfStride]] — k = ⌈n/stride⌉ ≈ √n derives
    * from the corpus, the SemDeDup treatment applied to IVF's cell
    * count), then `iters` k-means rounds — assignment by cosine (ties
    * to the lowest cent_id), new centroid = per-dimension mean computed
    * from order-independent fixed-point sums, cast to float. Centroids
    * live on the driver between rounds (bounded k×dim bookkeeping), so
    * each round is one map-side argmax pass + one skinny (cent, pos,
    * value) aggregate — the round-3 form's per-round broadcast join +
    * 125k-row window shuffle carrying embeddings profiled at
    * ~0.7 s/round, ~2/3 of the whole query. Empty clusters keep their
    * previous centroid. */
  private[graft] def lloydCentroids(spark: SparkSession, c: DataFrame,
      iters: Int, stride: Long): Seq[(Int, Array[Float])] =
    lloydRefine(spark, c, c.filter(col("vec_id") % stride === 0),
      iters, stride)

  /** Cached Lloyd centroids per corpus — see [[statCache]]: the PQ
    * family (ivfpq / ivfpq_res / opq) plus the IVF keys re-derive the
    * identical seed set and refinement (deterministic stride seeds,
    * fixed-point sums) per key. The tier string separates the raw
    * corpus from the nrm>0-filtered [[pqCorpus]] and the SemDeDup
    * exemplar stride, whose training frames can differ on corpora with
    * zero-norm vectors. */
  private def lloydCentroidsFor(spark: SparkSession, dir: String,
      c: DataFrame, iters: Int, stride: Long,
      tier: String): Seq[(Int, Array[Float])] =
    statCached(spark, dir, s"cents:$tier:$iters:$stride") {
      lloydCentroids(spark, c, iters, stride)
    }

  /** Cached [[semCentroids]] for the dir-based SemDeDup keys. */
  private def semCentroidsFor(spark: SparkSession, dir: String,
      c: DataFrame, iters: Int): Seq[(Int, Array[Float])] =
    statCached(spark, dir, s"cents:sem:$iters:$SeedStride") {
      semCentroids(spark, c, iters)
    }

  /** Exemplar seeds at the SemDeDup stride — every [[SeedStride]]-th
    * vector, so the centroid count derives from the corpus:
    * k = ⌈n/stride⌉ grows ∝ n (the paper's posture: constant target
    * cluster size, 50k clusters for 1B examples), with zero driver
    * computation and a seed set both engines select with one modulo
    * predicate. IVF's [[lloydCentroids]] derives its own (√n) stride —
    * cluster-size contract vs probe-grain contract. */
  private[graft] def semCentroids(spark: SparkSession, c: DataFrame,
      iters: Int): Seq[(Int, Array[Float])] =
    lloydRefine(spark, c, c.filter(col("vec_id") % SeedStride === 0),
      iters, SeedStride)

  private def lloydRefine(spark: SparkSession, c: DataFrame,
      seeds: DataFrame, iters: Int, stride: Long): Seq[(Int, Array[Float])] = {
    import spark.implicits._
    var cents: Seq[(Int, Array[Float])] = seeds
      .select((col("vec_id") / stride).cast("int").as("cent_id"),
        col("embedding"))
      .as[(Int, Array[Float])].collect().sortBy(_._1).toSeq
    val dim = Dim
    for (_ <- 1 to iters) {
      val assigned = c.select(
        assignedCentId(cents, "embedding", "nrm").as("cent_id"),
        col("embedding"))
      // per-dimension sums as `dim` flat agg columns: fully codegen'd
      // with map-side partials (25 rows × dim per task), where a
      // posexplode would materialize and hash-aggregate n×dim rows.
      // LONG fixed-point (×10⁶) instead of decimal(38,6): the same
      // 6-decimal order-independent determinism, but the accumulator
      // stays a primitive long (no per-value BigDecimal boxing); no
      // overflow risk — |x|·10⁶ ≲ 10⁷ per value leaves 10¹¹ headroom
      // even at 10⁹ rows per cluster
      val sums = (0 until dim).map(i =>
        sum(expr(s"cast(round(cast(embedding[$i] as double) * 1e6) as bigint)"))
          .as(s"s$i"))
      val next = assigned
        .groupBy(col("cent_id"))
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .select(col("cent_id"),
          array((0 until dim).map(i =>
            (col(s"s$i") / 1e6 / col("cnt")).cast("float")): _*).as("ce"))
        .as[(Int, Array[Float])].collect().toMap
      cents = cents.map { case (k, prev) => (k, next.getOrElse(k, prev)) }
    }
    cents
  }

  /** IVF ANN: ⌈√n⌉ Lloyd-refined centroids ([[ivfStride]]),
    * nearest-centroid assignment for the corpus, queries probe the
    * [[ivfProbes]] nearest centroids and rerank exactly. Corpus
    * assignment is the map-side argmax (no shuffle); the 10 probe
    * queries still rank via the k-row window (trivial). No distinct on
    * the candidate pairs: each vector has exactly one centroid, so a
    * (query, vector) pair joins at most once. Rows-only +
    * DedupSimilaritySpec recall floor at the fixture, ScaledAnnSpec at
    * the ×10 corpus. */
  def topKIvf(spark: SparkSession, dir: String): DataFrame =
    topKIvfIters(spark, dir, LloydIters)

  /** `probes = 0` (the default) derives the probe count from the
    * derived cell count; an explicit value is the regime knob
    * (ClusteredAnnSpec probes 3). */
  private[graft] def topKIvfIters(spark: SparkSession, dir: String,
      iters: Int, probes: Int = 0): DataFrame = {
    import spark.implicits._
    val c = corpus(spark, dir)
    val n = c.count()
    val cents = lloydCentroidsFor(spark, dir, c, iters, ivfStride(n), "raw")
    val nProbes = if (probes > 0) probes
      else ivfProbesRegime(cents.size, isClusteredAt(spark, dir))
    val assigned = c.withColumn("cent_id",
      assignedCentId(cents, "embedding", "nrm"))
    val centsDf = cents.toDF("cent_id", "ce")
      .select(col("cent_id"), col("ce"), VectorOps.norm("ce").as("cn"))
    val q = nearest(
      c.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn")),
      centsDf, nProbes, "query_id", "qe", "qn")
      .select(col("query_id"), col("qe"), col("qn"), col("cent_id"))
    val pairs = assigned.join(broadcast(q), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (VectorOps.dot("qe", "embedding") / (col("qn") * col("nrm"))).as("cosine"))
    rankedTopK(pairs)
  }

  /** Candidate (query_id, vec_id) pairs the IVF probe list admits — the
    * exact-rerank workload. Only the ids are computed (no cosine, no
    * rerank); ClusteredAnnSpec measures the pair count / corpus ratio
    * per embedding regime. */
  private[graft] def ivfCandidateIds(spark: SparkSession, dir: String,
      iters: Int, probes: Int = 0): DataFrame = {
    import spark.implicits._
    val c = corpus(spark, dir)
    val n = c.count()
    val cents = lloydCentroidsFor(spark, dir, c, iters, ivfStride(n), "raw")
    val nProbes = if (probes > 0) probes
      else ivfProbesRegime(cents.size, isClusteredAt(spark, dir))
    val assigned = c.select(col("vec_id"),
      assignedCentId(cents, "embedding", "nrm").as("cent_id"))
    val centsDf = cents.toDF("cent_id", "ce")
      .select(col("cent_id"), col("ce"), VectorOps.norm("ce").as("cn"))
    val q = nearest(
      c.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("nrm").as("qn")),
      centsDf, nProbes, "query_id", "qe", "qn")
      .select(col("query_id"), col("cent_id"))
    assigned.join(broadcast(q), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
  }

  /** Brute-force top-k on the codegen'd [[graft.functions.DotProductFloat]]
    * native expression — same results as [[topKBruteForce]] (shared
    * oracle), one fused loop instead of the HOF's intermediate array. */
  def topKCodegen(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProductFloat.register(spark)
    val c = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        sqrt(expr("graft_dot(embedding, embedding)")).as("nrm"))
    val q = c.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val pairs = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr("graft_dot(qe, embedding)") / (col("qn") * col("nrm")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
    rankedTopK(pairs)
  }

  // ---- Product quantization (PQ) --------------------------------------

  private val PqM = 8               // subspaces
  private val PqSubDim = Dim / PqM  // 8 dims each
  private val PqK = 16              // centroids per subspace → 4-bit codes
  private val PqSeedStride = 20
  private val PqIters = 2
  // ADC shortlist = this fraction of the corpus, reranked exactly. 0.3
  // (150 rows on the 500-vector fixture) is the measured recall@5 ≥ 0.9
  // point in the random-vector regime (0.1 → 0.64): 64-bit codes on
  // direction-uniform vectors leave genuine neighbors mid-shortlist,
  // the same adversarial effect the LSH scan-fraction note above
  // documents (~0.6 there). The FRACTION, not the count, is the recall
  // determinant — a fixed 150 at a ×10 corpus would be a 0.015 fraction
  // and silently tank recall (ScaledAnnSpec pins this). On clustered
  // production embeddings the codes separate far better: the params
  // variants run constant small shortlists there (ClusteredAnnSpec).
  // PqM/PqK are NOT corpus-sized knobs — they are the code width (the
  // storage format: 8×4-bit codes per vector), fixed by design.
  private val PqShortFrac = 0.3

  private[graft] def pqShortlist(n: Long): Int =
    math.max(1, math.ceil(n * PqShortFrac).toInt)

  /** The 8×16 codebooks as ONE literal node: array (per subspace) of
    * array (per centroid) of (cid, subvector) — same typedlit rationale
    * as [[centArray]]. */
  private def pqBooksLit(books: Seq[Seq[(Int, Array[Double])]]): Column =
    typedlit(books.map(_.map { case (cid, v) => (cid, v.toSeq) }))

  /** Corpus with unit-normalized double vectors (`ne`): PQ codebooks are
    * trained on directions so that summed sub-space inner products
    * approximate cosine. Zero-norm vectors are excluded for the same
    * undefined-direction reason [[assignedCentId]] documents. */
  private[graft] def pqCorpus(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir).filter(col("nrm") > 0)
      .withColumn("ne", expr("transform(embedding, x -> cast(x as double) / nrm)"))

  /** Per-subspace k-means codebooks, trained exactly like
    * [[lloydCentroids]] (deterministic every-20th-vector seeds, long
    * fixed-point sums, empty clusters keep their previous centroid) but
    * over all 8 subspaces in ONE pass per round: each row's 8
    * assignments come from one [[graft.functions.PqEncode]] codegen
    * call (the interpreted HOF argmin this replaces was ~half the whole
    * query), the (s, cid, subvec) explode is ×8 rows of 8 doubles each,
    * and the (s, cid) aggregate collapses them map-side to 128 skinny
    * rows. Codebooks live on the driver between rounds — 8×16×8 doubles
    * of bookkeeping, not data. */
  private[graft] def pqCodebooks(spark: SparkSession, c: DataFrame,
      iters: Int): Seq[Seq[(Int, Array[Double])]] = {
    import spark.implicits._
    var books: Seq[Seq[(Int, Array[Double])]] = {
      val seeds = c.filter(col("vec_id") % PqSeedStride === 0 &&
          col("vec_id") < PqSeedStride.toLong * PqK)
        .select((col("vec_id") / PqSeedStride).cast("int").as("cid"), col("ne"))
        .as[(Int, Array[Double])].collect().sortBy(_._1).toSeq
      (0 until PqM).map(s => seeds.map { case (cid, v) =>
        (cid, v.slice(s * PqSubDim, (s + 1) * PqSubDim)) })
    }
    for (_ <- 1 to iters) {
      val sub = c
        .withColumn("codes", graft.functions.PqEncode.codes(col("embedding"), books))
        .select(posexplode(expr(
          s"""transform(sequence(0, ${PqM - 1}), s -> struct(
             |  element_at(codes, s + 1) as cid,
             |  slice(ne, s * $PqSubDim + 1, $PqSubDim) as sv))""".stripMargin)))
        .select(col("pos").as("s"), col("col.cid").as("cid"), col("col.sv").as("subvec"))
      val sums = (0 until PqSubDim).map(i =>
        sum(expr(s"cast(round(subvec[$i] * 1e6) as bigint)")).as(s"s$i"))
      val next = sub.groupBy(col("s"), col("cid"))
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .select(col("s"), col("cid"),
          array((0 until PqSubDim).map(i => col(s"s$i") / 1e6 / col("cnt")): _*).as("ce"))
        .as[(Int, Int, Array[Double])].collect()
        .map { case (s, cid, ce) => (s, cid) -> ce }.toMap
      books = books.zipWithIndex.map { case (book, s) =>
        book.map { case (cid, prev) => (cid, next.getOrElse((s, cid), prev)) } }
    }
    books
  }

  /** Cached [[pqCodebooks]] per corpus ([[statCache]]): the direction
    * codebooks are a corpus statistic shared by the pq / ivfpq /
    * serving-index paths, each of which re-derived the identical
    * deterministic training per key. */
  private def pqCodebooksFor(spark: SparkSession, dir: String,
      c: DataFrame): Seq[Seq[(Int, Array[Double])]] =
    statCached(spark, dir, s"pqbooks:$PqIters") { pqCodebooks(spark, c, PqIters) }

  /** Per-query 128-entry ADC table (subspace × centroid inner products
    * against the query's unit vector `ne`), flattened to one
    * `array<double>` so scoring is pure array lookups. */
  private def pqQueryTab(lit3: Column): Column = pqQueryTabOver(lit3, col("ne"))

  /** [[pqQueryTab]] with the query vector as a column — the OPQ tier
    * scores against the ROTATED query (q·r = (Rq)·(Rr) for orthogonal
    * R), so its table slices Rq where the plain tiers slice `ne`. */
  private def pqQueryTabOver(lit3: Column, qv: Column): Column =
    transform(sequence(lit(0), lit(PqM * PqK - 1)), i => {
      val s = floor(i / lit(PqK)).cast("int")
      val cent = element_at(element_at(lit3, s + 1),
        pmod(i, lit(PqK)).cast("int") + 1).getField("_2")
      aggregate(zip_with(cent,
        slice(qv, s * lit(PqSubDim) + lit(1), lit(PqSubDim)),
        (a, b) => a * b), lit(0.0), (x, y) => x + y)
    })

  /** Product-quantization ANN — the 100 TB shape: after training, every
    * corpus vector is represented by an 8-int code (conceptually 8
    * BYTES — 4 bits/subspace; int array here for expression simplicity)
    * instead of 256 bytes of floats, computed map-side with no shuffle.
    * Queries precompute a 128-entry inner-product table (subspace ×
    * centroid, broadcast with the 10-row query set), so asymmetric-
    * distance scoring is 8 array lookups + adds per (query, vector) —
    * no float vector ever moves after encoding. The ADC shortlist
    * ([[pqShortlist]] rows per query — the derived corpus fraction,
    * chosen by approximate score) is then reranked with exact cosine,
    * the standard shortlist-then-refine production topology. Rows-only;
    * DedupSimilaritySpec pins recall@5 ≥ 0.9 vs [[topKBruteForce]] and
    * run-to-run determinism; ScaledAnnSpec re-pins at ×10. */
  def topKPq(spark: SparkSession, dir: String): DataFrame = {
    val c = pqCorpus(spark, dir)
    val n = c.count()
    val shortlist = pqShortlistRegime(n, isClusteredAt(spark, dir))
    val books = pqCodebooksFor(spark, dir, c)
    val lit3 = pqBooksLit(books)
    val codes = c.select(col("vec_id"),
      graft.functions.PqEncode.codes(col("embedding"), books).as("codes"))
    val q = c.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), pqQueryTab(lit3).as("qtab"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    val short = codes.join(broadcast(q), col("vec_id") =!= col("query_id"))
      // native codegen ADC (graft_pq_adc) — the HOF fold this replaces
      // ran interpreted per (query x vector) pair; same ascending-s
      // accumulation, bit-identical scores (CatalystAggSpec)
      .withColumn("adc",
        graft.functions.PqAdc.adc(col("codes"), col("qtab"), PqK))
      .withColumn("arank", row_number().over(w))
      .filter(col("arank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    val qVecs = corpus(spark, dir).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val pairs = corpus(spark, dir)
      .join(broadcast(short), Seq("vec_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (VectorOps.dot("qe", "embedding") / (col("qn") * col("nrm"))).as("cosine"))
    rankedTopK(pairs)
  }

  // IVF-PQ prunes twice: the cell list is the only UNRECOVERABLE cut
  // (exact rerank repairs ADC rank errors inside probed cells, never a
  // missed cell), so the probe count derives as IVF's fraction of the
  // derived cell count and the shortlist as PQ's corpus fraction —
  // recall its own spec test pinned, and DedupSimilaritySpec holds the
  // composition to the same ≥ 0.9 floor. Random-direction vectors are
  // the adversarial regime, per the class scaladoc.

  /** IVF-PQ ANN — the two quantizers composed, the canonical
    * billion-scale serving layout (FAISS "IVFADC"; here the
    * `by_residual=false` inner-product variant, since [[PqEncode]]
    * codes unit DIRECTIONS and cosine is the metric — residual coding
    * buys little over ⌈√n⌉ wide cells while requiring a second
    * encoder): the IVF coarse quantizer prunes the corpus to the
    * [[ivfProbes]] probed cells per query, PQ codes give 8-lookup
    * asymmetric-distance scores WITHIN those cells, and only the
    * per-query ADC shortlist is reranked with exact cosine.
    *
    * Scale posture — what each stage ships at 100 TB: corpus cell
    * assignment and PQ encoding are both map-side codegen against
    * broadcast-sized tables (⌈√n⌉ centroids / 8×16 codebooks), so after
    * one training read the corpus is represented by (vec_id, cent_id,
    * 8 ints) — the float vectors never shuffle; the probe join is an
    * equi-join on cent_id against a broadcast (query × probed-cell)
    * table, touching ~[[ProbeFrac]] of the codes; the exact rerank
    * reads [[pqShortlist]] full vectors per query. Plain PQ scans
    * ALL codes per query; plain IVF reranks ALL probed vectors exactly
    * — the composition is the only variant where both the scan and the
    * rerank are sub-corpus. Rows-only; DedupSimilaritySpec pins
    * recall@5 ≥ 0.9 vs [[topKBruteForce]] and run-to-run determinism;
    * ScaledAnnSpec re-pins at ×10. */
  def topKIvfPq(spark: SparkSession, dir: String): DataFrame =
    topKIvfPqParams(spark, dir, 0, 0)

  /** [[topKIvfPq]] with the probe count and ADC shortlist as knobs
    * (0 = derive from the corpus) — the clustered-regime spec
    * (ClusteredAnnSpec) runs the same composition at a fraction of the
    * default scan budget. */
  private[graft] def topKIvfPqParams(spark: SparkSession, dir: String,
      nProbes0: Int, shortlist0: Int): DataFrame = {
    import spark.implicits._
    val c = pqCorpus(spark, dir)
    val n = c.count()
    val cents = lloydCentroidsFor(spark, dir, c, LloydIters, ivfStride(n), "pq")
    val clustered = (nProbes0 <= 0 || shortlist0 <= 0) &&
      isClusteredAt(spark, dir)
    val nProbes = if (nProbes0 > 0) nProbes0
      else ivfProbesRegime(cents.size, clustered)
    val shortlist = if (shortlist0 > 0) shortlist0
      else pqShortlistRegime(n, clustered)
    val books = pqCodebooksFor(spark, dir, c)
    val lit3 = pqBooksLit(books)
    val codes = c.select(col("vec_id"),
      assignedCentId(cents, "embedding", "nrm").as("cent_id"),
      graft.functions.PqEncode.codes(col("embedding"), books).as("codes"))
    val centsDf = cents.toDF("cent_id", "ce")
      .select(col("cent_id"), col("ce"), VectorOps.norm("ce").as("cn"))
    val qbase = c.filter(col("vec_id") < NQueries)
    val qtab = qbase.select(col("vec_id").as("query_id"),
      pqQueryTab(lit3).as("qtab"))
    val probes = nearest(
      qbase.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn")),
      centsDf, nProbes, "query_id", "qe", "qn")
      .select(col("query_id"), col("cent_id"))
    // 10 queries × 17 probed cells, each row carrying the 128-double
    // table — broadcast-sized by construction
    val q = probes.join(qtab, Seq("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    val short = codes.join(broadcast(q), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc",
        graft.functions.PqAdc.adc(col("codes"), col("qtab"), PqK))
      .withColumn("arank", row_number().over(w))
      .filter(col("arank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    val qVecs = corpus(spark, dir).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val pairs = corpus(spark, dir)
      .join(broadcast(short), Seq("vec_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (VectorOps.dot("qe", "embedding") / (col("qn") * col("nrm"))).as("cosine"))
    rankedTopK(pairs)
  }

  /** Residual PQ codebooks — [[pqCodebooks]] over per-cell RESIDUALS
    * (`r = x_unit − cell_centroid_unit`, array<double>, encoded by the
    * no-normalization [[graft.functions.PqEncodeRaw]]): same
    * deterministic stride seeds, long fixed-point sums, empty clusters
    * keep their previous centroid. One pooled codebook across cells
    * (the classic IVFADC layout), trained where the data actually
    * lives — near the origin of each cell's frame. */
  private[graft] def pqResidualCodebooks(spark: SparkSession, rdf: DataFrame,
      iters: Int): Seq[Seq[(Int, Array[Double])]] = {
    import spark.implicits._
    var books: Seq[Seq[(Int, Array[Double])]] = {
      val seeds = rdf.filter(col("vec_id") % PqSeedStride === 0 &&
          col("vec_id") < PqSeedStride.toLong * PqK)
        .select((col("vec_id") / PqSeedStride).cast("int").as("cid"), col("r"))
        .as[(Int, Array[Double])].collect().sortBy(_._1).toSeq
      (0 until PqM).map(s => seeds.map { case (cid, v) =>
        (cid, v.slice(s * PqSubDim, (s + 1) * PqSubDim)) })
    }
    for (_ <- 1 to iters) {
      val sub = rdf
        .withColumn("codes", graft.functions.PqEncode.codesRaw(col("r"), books))
        .select(posexplode(expr(
          s"""transform(sequence(0, ${PqM - 1}), s -> struct(
             |  element_at(codes, s + 1) as cid,
             |  slice(r, s * $PqSubDim + 1, $PqSubDim) as sv))""".stripMargin)))
        .select(col("pos").as("s"), col("col.cid").as("cid"), col("col.sv").as("subvec"))
      val sums = (0 until PqSubDim).map(i =>
        sum(expr(s"cast(round(subvec[$i] * 1e6) as bigint)")).as(s"s$i"))
      val next = sub.groupBy(col("s"), col("cid"))
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .select(col("s"), col("cid"),
          array((0 until PqSubDim).map(i => col(s"s$i") / 1e6 / col("cnt")): _*).as("ce"))
        .as[(Int, Int, Array[Double])].collect()
        .map { case (s, cid, ce) => (s, cid) -> ce }.toMap
      books = books.zipWithIndex.map { case (book, s) =>
        book.map { case (cid, prev) => (cid, next.getOrElse((s, cid), prev)) } }
    }
    books
  }

  /** RESIDUAL-coded IVF-PQ — the IVFADC of Jégou et al. ("Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011), closing
    * the intra-cell resolution gap [[topKIvfPq]]'s scaladoc documents:
    * plain direction codes resolve BETWEEN clusters, so inside a
    * cluster ADC scores near-tie and the shortlist must cover the
    * whole cluster (measured: shortlist 75 → recall 0.72 on the
    * clustered fixture). Coding the RESIDUAL r = x_unit − ĉ(cell)
    * instead re-centers every cell at its own origin, and the score
    * decomposes exactly: q·x = q·ĉ + q·r, where q·ĉ is the probe
    * stage's own cosine (exact, per probed cell) and q·r is the ADC
    * approximation over residual codebooks — so the codes spend their
    * 64 bits entirely on WITHIN-cell geometry. Storage per vector is
    * unchanged (cell id + 8 codes); the query table is the same
    * 128-entry inner-product table, built over residual codebooks
    * (cell-independent — all cell dependence lives in the exact q·ĉ
    * term). Rows-only; ClusteredAnnSpec pins the recall-at-equal-
    * budget gain over plain codes.
    *
    * Scale posture: identical to [[topKIvfPq]] — training collects
    * bounded codebooks, encoding is map-side codegen, floats never
    * shuffle after encoding; the one addition is the k×64-double unit
    * centroid broadcast joined to compute residuals. */
  def topKIvfPqResidual(spark: SparkSession, dir: String): DataFrame =
    topKIvfPqResidualParams(spark, dir, 0, 0)

  private[graft] def topKIvfPqResidualParams(spark: SparkSession, dir: String,
      nProbes0: Int, shortlist0: Int): DataFrame = {
    import spark.implicits._
    val c = pqCorpus(spark, dir)
    val n = c.count()
    val cents = lloydCentroidsFor(spark, dir, c, LloydIters, ivfStride(n), "pq")
    val clustered = (nProbes0 <= 0 || shortlist0 <= 0) &&
      isClusteredAt(spark, dir)
    val nProbes = if (nProbes0 > 0) nProbes0
      else ivfProbesRegime(cents.size, clustered)
    val shortlist = if (shortlist0 > 0) shortlist0
      else pqShortlistRegime(n, clustered)
    // unit centroids: the scoring frame of both the residual and the
    // exact q·ĉ term
    val centsU: Seq[(Int, Array[Double])] = cents.map { case (cid, ce) =>
      val nr = math.sqrt(ce.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      (cid, ce.map(x => if (nr > 0) x.toDouble / nr else 0.0))
    }
    val cuDf = centsU.toDF("cent_id", "cu")
    val assigned = c
      .withColumn("cent_id", assignedCentId(cents, "embedding", "nrm"))
      .join(broadcast(cuDf), Seq("cent_id"))
      .withColumn("r", zip_with(col("ne"), col("cu"), (a, b) => a - b))
    // residual codebooks are a corpus statistic (deterministic stride
    // seeds over a deterministic residual frame) — cached per corpus
    // like the centroids they are trained against
    val books = statCached(spark, dir, s"resbooks:$PqIters") {
      pqResidualCodebooks(spark, assigned.select(col("vec_id"), col("r")), PqIters)
    }
    val lit3 = pqBooksLit(books)
    val codes = assigned.select(col("vec_id"), col("cent_id"),
      graft.functions.PqEncode.codesRaw(col("r"), books).as("codes"))
    val centsDf = cents.toDF("cent_id", "ce")
      .select(col("cent_id"), col("ce"), VectorOps.norm("ce").as("cn"))
    val qbase = c.filter(col("vec_id") < NQueries)
    val qtab = qbase.select(col("vec_id").as("query_id"),
      pqQueryTab(lit3).as("qtab"))
    // probes carry the EXACT q·ĉ cosine forward as qc — the coarse
    // half of the decomposed score
    val probes = nearest(
      qbase.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn")),
      centsDf, nProbes, "query_id", "qe", "qn")
      .select(col("query_id"), col("cent_id"), col("cdist").as("qc"))
    val q = probes.join(qtab, Seq("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val short = codes.join(broadcast(q), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", col("qc") +
        graft.functions.PqAdc.adc(col("codes"), col("qtab"), PqK))
      .withColumn("arank", row_number().over(w))
      .filter(col("arank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    val qVecs = corpus(spark, dir).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val pairs = corpus(spark, dir)
      .join(broadcast(short), Seq("vec_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (VectorOps.dot("qe", "embedding") / (col("qn") * col("nrm"))).as("cosine"))
    rankedTopK(pairs)
  }

  /** Deterministic second-moment matrix of a (vec_id, r: array<double>)
    * residual frame, as driver doubles: Σ r·rᵀ with every elementwise
    * product quantized to ×10⁸ fixed point BEFORE the distributed sum —
    * long addition commutes, so the matrix is bit-identical across
    * partitionings/runs (the [[pqResidualCodebooks]] fixed-point-sum
    * device). Bound: |r_i·r_j| ≤ 4 (unit-vector differences) → ≤ 4·10⁸
    * per term; ~2·10⁹ rows before BIGINT pressure — far beyond any
    * single training sample. One posexplode pass, (dim × dim) partial
    * aggregate, 64×64 doubles collected — the [[pcaGramOf]] shape. */
  private[graft] def residualCovOf(rdf: DataFrame): Array[Array[Double]] = {
    val e = rdf.select(posexplode(col("r")).as(Seq("i", "ri")), col("r"))
    val sums = (0 until Dim).map(j =>
      sum(expr(s"cast(round(ri * r[$j] * 1e8) as bigint)")).as(s"c$j"))
    val rows = e.groupBy(col("i")).agg(sums.head, sums.tail: _*).collect()
    val m = Array.ofDim[Double](Dim, Dim)
    rows.foreach { row =>
      val i = row.getInt(0)
      (0 until Dim).foreach(j => m(i)(j) = row.getLong(j + 1) / 1e8)
    }
    m
  }

  /** Cyclic Jacobi eigensolver for a symmetric d×d driver matrix —
    * bounded bookkeeping (d = 64 here; 12 full sweeps ≈ machine
    * precision for well-separated spectra). Returns (eigenvalues,
    * eigenvectors as COLUMNS). Deterministic per environment: fixed
    * (p, q) sweep order, plain IEEE driver arithmetic — the
    * [[pcaProject]] portability caveat applies and is acceptable for
    * the rows-only OPQ tier it serves. */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to 12; p <- 0 until n - 1; q <- p + 1 until n) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-14) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
            case 0.0 => 1.0 // theta == 0 → 45° rotation
            case x => x
          }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        var k = 0
        while (k < n) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
          k += 1
        }
        k = 0
        while (k < n) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
          k += 1
        }
      }
    }
    ((0 until n).map(i => a(i)(i)).toArray, v)
  }

  /** OPQ's parametric dimension allocation (Ge et al., "Optimized
    * Product Quantization", CVPR 2013, the OPQ-P "eigenvalue
    * allocation"): eigen-directions sorted by descending variance are
    * dealt greedily to the subspace with the smallest current
    * LOG-variance product (among those not yet full) — balancing the
    * per-subspace variance products that bound PQ distortion. Returns
    * m groups of subDim eigen-indices, deterministic (index
    * tie-breaks). */
  private[graft] def opqAllocate(eig: Array[Double], m: Int,
      subDim: Int): Seq[Seq[Int]] = {
    val order = eig.indices.sortBy(i => (-eig(i), i))
    val bins = Array.fill(m)(List.empty[Int])
    val logs = Array.fill(m)(0.0)
    order.foreach { idx =>
      val b = (0 until m).filter(bins(_).size < subDim)
        .minBy(b => (logs(b), b))
      bins(b) = idx :: bins(b)
      logs(b) += math.log(math.max(eig(idx), 1e-12))
    }
    bins.map(_.reverse).toSeq
  }

  /** The learned OPQ rotation for a residual frame: rows of R are the
    * second-moment eigenvectors, permuted so subspace s owns rows
    * s·subDim .. (s+1)·subDim−1 per [[opqAllocate]]'s balanced
    * grouping, each row sign-fixed (largest-|component| coordinate
    * positive — the [[pcaProject]] convention) so the rotation is a
    * deterministic function of the spectrum. R is orthogonal (rows are
    * orthonormal eigenvectors), so (Rq)·(Rr) = q·r exactly and the
    * residual-IVFADC score decomposition is unchanged. */
  private[graft] def opqRotationOf(rdf: DataFrame): Array[Array[Double]] = {
    val (eig, vecs) = jacobiEigen(residualCovOf(rdf))
    val groups = opqAllocate(eig, PqM, PqSubDim)
    groups.flatten.map { idx =>
      val row = (0 until Dim).map(r => vecs(r)(idx)).toArray
      val top = row.indices.maxBy(i => (math.abs(row(i)), -i))
      if (row(top) < 0) row.map(x => -x) else row
    }.toArray
  }

  /** OPQ-rotated residual IVF-PQ — [[topKIvfPqResidual]] with Ge et
    * al.'s optimized product quantization (CVPR 2013) between the
    * residual and the codebooks: residuals rotate by the learned
    * orthogonal R ([[opqRotationOf]] — eigenbasis + balanced-variance
    * dimension allocation) before training and encoding, and the query
    * side builds its ADC table over Rq, so q·r = (Rq)·(Rr) holds
    * exactly and the probe stage's exact q·ĉ term is untouched. Plain
    * PQ slices the vector into FIXED 8-dim blocks — when variance
    * concentrates in a few directions (every real embedding corpus),
    * some subspaces carry most of the signal while their 4-bit budget
    * stays flat; rotating into the eigenbasis and dealing directions
    * to balance per-subspace variance products spends the 64 bits
    * where the geometry is. OpqSpec pins: distortion (mean ‖r − r̂‖²)
    * ≤ the unrotated tier's on an anisotropic corpus, recall ≥ 0.9 on
    * the fixture, and bit-determinism.
    *
    * Scale posture: identical to [[topKIvfPqResidual]] plus one d×d
    * driver eigen-solve (bounded) and a codegen'd [[graft.functions
    * .MatVec]] multiply per row at encode time — floats still never
    * shuffle after encoding. */
  /** Rotation-training sample floor: the second moment has 64×64 = 4096
    * free parameters; ~8k vectors estimate it to a few percent, and the
    * eigenvalue ALLOCATION (what the rotation is for) is insensitive to
    * that noise. */
  private val OpqCovSampleTarget = 8192L

  def topKOpq(spark: SparkSession, dir: String): DataFrame =
    topKOpqParams(spark, dir, 0, 0)

  private[graft] def topKOpqParams(spark: SparkSession, dir: String,
      nProbes0: Int, shortlist0: Int): DataFrame = {
    import spark.implicits._
    val c = pqCorpus(spark, dir)
    val n = c.count()
    val cents = lloydCentroidsFor(spark, dir, c, LloydIters, ivfStride(n), "pq")
    val clustered = (nProbes0 <= 0 || shortlist0 <= 0) &&
      isClusteredAt(spark, dir)
    val nProbes = if (nProbes0 > 0) nProbes0
      else ivfProbesRegime(cents.size, clustered)
    val shortlist = if (shortlist0 > 0) shortlist0
      else pqShortlistRegime(n, clustered)
    val centsU: Seq[(Int, Array[Double])] = cents.map { case (cid, ce) =>
      val nr = math.sqrt(ce.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      (cid, ce.map(x => if (nr > 0) x.toDouble / nr else 0.0))
    }
    val cuDf = centsU.toDF("cent_id", "cu")
    val assigned = c
      .withColumn("cent_id", assignedCentId(cents, "embedding", "nrm"))
      .join(broadcast(cuDf), Seq("cent_id"))
      .withColumn("r", zip_with(col("ne"), col("cu"), (a, b) => a - b))
    // TRAINING runs multiple full passes (the covariance collect + one
    // collect per codebook round); each pass would otherwise recompute
    // read → normalize → cell-argmax → residual from scratch. The
    // training frame is therefore materialized ONCE (localCheckpoint)
    // and released as soon as the driver holds R and the codebooks —
    // every training action is eager, so release is safe, and the
    // values are unchanged (fixed-point sums commute over any
    // partitioning). Measured: 10.8 → ~5 s at sf0.1. At 100 TB the
    // training frame is a bounded deterministic SAMPLE (vec_id stride,
    // the FAISS convention) — rotation and codebooks are statistics,
    // not per-row artifacts; only the single encode pass below touches
    // the full corpus.
    // R and the rotated-residual codebooks are corpus statistics like
    // the centroids — cached per corpus ([[statCache]]); retraining
    // them per invocation was the whole key's cost (measured 5.5 s/key
    // in the r16 sweep, the slowest non-graph key)
    val (rot, books) = statCached(spark, dir,
        s"opq:$PqIters:$OpqCovSampleTarget") {
      val resid = assigned.select(col("vec_id"), col("r")).localCheckpoint()
      // The rotation is a 64×64 STATISTIC, not a per-row artifact: learn
      // it from a bounded deterministic sample (every covStride-th
      // vec_id, targeting ~8k vectors — far beyond what a 4096-entry
      // second-moment estimate needs). The covariance pass replicates
      // each 64-d array 64× through its aggregate (posexplode carrying
      // the full array per element), so running it corpus-wide is ~2 GB
      // of aggregate input at sf0.1 and corpus-linear at 100 TB for no
      // statistical gain — measured 15.4 → ~6 s warm at sf0.1.
      val covStride = math.max(1L, n / OpqCovSampleTarget)
      val r = opqRotationOf(resid.filter(col("vec_id") % covStride === 0))
      val b = pqResidualCodebooks(spark,
        resid.select(col("vec_id"),
          graft.functions.MatVec.mul(col("r"), r).as("r")), PqIters)
      org.apache.spark.sql.GraftBridge.releaseLocalCheckpoint(resid)
      (r, b)
    }
    val lit3 = pqBooksLit(books)
    val codes = assigned.select(col("vec_id"), col("cent_id"),
      graft.functions.PqEncode.codesRaw(
        graft.functions.MatVec.mul(col("r"), rot), books).as("codes"))
    val centsDf = cents.toDF("cent_id", "ce")
      .select(col("cent_id"), col("ce"), VectorOps.norm("ce").as("cn"))
    val qbase = c.filter(col("vec_id") < NQueries)
    val qtab = qbase.select(col("vec_id").as("query_id"),
      pqQueryTabOver(lit3, graft.functions.MatVec.mul(col("ne"), rot))
        .as("qtab"))
    val probes = nearest(
      qbase.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn")),
      centsDf, nProbes, "query_id", "qe", "qn")
      .select(col("query_id"), col("cent_id"), col("cdist").as("qc"))
    val q = probes.join(qtab, Seq("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val short = codes.join(broadcast(q), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", col("qc") +
        graft.functions.PqAdc.adc(col("codes"), col("qtab"), PqK))
      .withColumn("arank", row_number().over(w))
      .filter(col("arank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    val qVecs = corpus(spark, dir).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val pairs = corpus(spark, dir)
      .join(broadcast(short), Seq("vec_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (VectorOps.dot("qe", "embedding") / (col("qn") * col("nrm"))).as("cosine"))
    rankedTopK(pairs)
  }

  /** Per-label embedding centroids at (label, dimension) grain — the
    * class-mean table nearest-class-mean audits and cluster-quality
    * reports start from. Each mean is an exact DECIMAL(38,6) sum over
    * the dimension divided once in IEEE (float→double→decimal is
    * tie-free, so both engines truncate identically).
    *
    * Scale posture: posexplode multiplies rows ×dim but the (label,
    * dim) aggregate collapses them with map-side partials before the
    * exchange, and the output is |labels|·dim rows — bounded metadata,
    * never corpus-sized. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        (sum(col("x").cast("double").cast("decimal(38,6)"))
          .cast("double") / count(lit(1))).as("mean_x"))
      .orderBy(col("label"), col("dim"))

  private[graft] val SemTau = 0.45
  private[graft] val SemSeedStride = SeedStride

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus by embedding, then within each
    * cluster drop every document that has a cosine-≥-τ neighbor of higher
    * keep-priority, where priority = LOWEST similarity to the cluster
    * centroid first (the paper's keeper choice: the example farthest from
    * the centroid is the "hardest", most diverse one). Output is the KEPT
    * corpus — the first dedup key whose result is the deduplicated
    * dataset itself rather than a pair list.
    *
    * Drop rule, stated relationally (one pass, no iteration): x is
    * dropped iff ∃ y in the same cluster with cos(x,y) ≥ τ and
    * (ccos_y, vec_id_y) < (ccos_x, vec_id_x) lexicographically. This is
    * the order-free superset of sequential greedy pruning (a dropped
    * witness still disqualifies its neighbors); kept∪dropped partitions
    * the corpus, and no two kept members of a cluster are within τ — both
    * invariants recomputed brute-force in DedupSimilaritySpec.
    *
    * ORACLE-PAIRED, which no float-k-means semantic dedup can be: the
    * public key clusters by the deterministic exemplar seeds
    * ([[semCentroids]] at 0 iterations — every [[SeedStride]]-th vector,
    * i.e. rows DuckDB can select), and every cosine follows the
    * [[VectorOps]] bit-exact fold contract, so the entire decision —
    * assignment, priority, drops — hash-matches an independent SQL
    * replay. Lloyd-refined clustering is the same operator one parameter
    * away ([[semanticDedupIters]]); the spec pins the refined variant's
    * invariants too, since its centroids (driver floats) are not
    * SQL-expressible.
    *
    * Scale posture: assignment is the map-side argmax fold (no join, no
    * shuffle); the only exchange is ONE embedding shuffle keyed by
    * cluster_id, then pair evaluation stays inside cluster partitions
    * with the priority predicate halving the pairs. The cluster count
    * DERIVES from the corpus ([[semCentroids]]: k = ⌈n/[[SemSeedStride]]⌉,
    * the paper's k ∝ n posture), so mean cluster size — and the
    * within-cluster O(Σ c²) pair work — stays constant per partition as
    * the corpus grows: O(n·stride) total. Skew is bounded separately:
    * a cluster larger than [[SemClusterCap]] is REFUSED from the pair
    * stage (its members are all kept) and surfaced via
    * [[semanticHotClusters]] — the same refuse-and-telemeter stance as
    * [[graft.operators.Dedup.HotBucketCap]], because a >1024-member
    * τ-cluster is a corpus pathology to triage, not c²/2 cosines to
    * evaluate in one task. The size count rides the pair stage's own
    * cluster_id shuffle as a window, so the guard adds no exchange.
    * Assignment honesty: the argmax fold is O(k·dim) per row, so with
    * k ∝ n the assignment pass is the quadratic term at extreme scale —
    * the production lever is IVF-assigning rows through a coarse
    * quantizer over the centroid table (exactly [[topKIvf]]'s
    * machinery, √k supers ⇒ O(√k·dim) per row); the relational drop
    * rule downstream is unchanged by how cluster ids are produced.
    * Balance measured on the fixture: cluster sizes 10–31 (median 21)
    * at sf0.01 (k=25 derived from n=500), 7–34 at sf0.1 (k=100 from
    * n=2000). τ = 0.45 = the family's [[CosineT]] bar (4/500 dropped at
    * sf0.01 — the fixture's near-uniform vectors are the
    * sparse-duplicate regime; production corpora run τ ≥ 0.9 with far
    * denser drop sets). */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    semanticDedupIters(spark, dir, 0)

  /** Clusters larger than this are refused from the pair stage (kept
    * whole, reported via [[semanticHotClusters]]) — 50× the target
    * cluster size, same cap value as the MinHash guard. */
  private[graft] val SemClusterCap = 1024

  /** [[semanticDedup]] with `iters` Lloyd refinement rounds (0 = the
    * oracle-pairable exemplar clustering). */
  private[graft] def semanticDedupIters(spark: SparkSession, dir: String,
      iters: Int): DataFrame = {
    val c = corpus(spark, dir)
    val cents = semCentroidsFor(spark, dir, c, iters)
    val asn = c
      .withColumn("a", assignedCentBest(cents, "embedding", "nrm"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("a.cid").cast("long").as("cluster_id"), col("a.best").as("ccos"))
    semPrune(asn)
  }

  /** The SemDeDup drop stage over ANY (vec_id, embedding, nrm,
    * cluster_id, ccos) assignment — shared by the flat and coarse
    * clusterings; the drop rule never cares how cluster ids were
    * produced. Hot-cluster guard: membership count as a window over the
    * SAME cluster_id partitioning the pair join needs — no extra
    * exchange. Over-cap clusters contribute no pairs (every member
    * kept). */
  private def semPrune(asn: DataFrame): DataFrame = {
    // cluster -1 (zero-norm/NaN rows — no direction) never enters the
    // pair stage: its members have no meaningful cosine to anything
    // (and an unguarded 0·0 denominator would THROW under ANSI); they
    // are all kept, exactly like an over-cap refused cluster
    val safe = asn
      .filter(col("cluster_id") >= 0)
      .withColumn("cn", count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .filter(col("cn") <= SemClusterCap)
    val hi = safe.select(col("cluster_id"), col("vec_id").as("id_a"),
      col("embedding").as("ea"), col("nrm").as("na"), col("ccos").as("ca"))
    val lo = safe.select(col("cluster_id"), col("vec_id").as("id_b"),
      col("embedding").as("eb"), col("nrm").as("nb"), col("ccos").as("cb"))
    val dropped = hi.join(lo, Seq("cluster_id"))
      .filter(col("cb") < col("ca") ||
        (col("cb") === col("ca") && col("id_b") < col("id_a")))
      .filter(VectorOps.dot("ea", "eb") / (col("na") * col("nb")) >= SemTau)
      .select(col("id_a").as("vec_id")).distinct()
    asn.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster_id"), col("ccos").as("centroid_cosine"))
      .orderBy(col("vec_id"))
  }

  /** Sequential left-to-right double fold — the [[VectorOps]] contract,
    * driver-side (used for the bounded centroid→super bookkeeping). */
  private def fdot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** [[semanticDedup]] with a TWO-LEVEL (coarse-quantizer) assignment —
    * the scale path for the one quadratic term the flat key keeps:
    * with k ∝ n derived centroids, the flat argmax is O(k·d) per row,
    * quadratic in corpus size overall. Here ⌈√k⌉ SUPER-centroids (every
    * ⌈k/⌈√k⌉⌉-th centroid — exemplar determinism again) partition the
    * centroid table on the driver (k×√k bounded bookkeeping; each super
    * seed is pinned to its own group, so no group is empty), and a row
    * assigns in two map-side folds: nearest super over ⌈√k⌉, then
    * nearest centroid within that super's slice of ONE nested literal —
    * O(√k·d) expected per row, the faiss IVF-assignment shape. The
    * clustering is a different (coarser-boundary) partition than the
    * flat key's, so this is its own key, not a drop-in: everything
    * downstream ([[semPrune]] — priority, τ, cap, output) is shared.
    * Worst-case honesty: a super owning most centroids degrades its
    * rows toward O(k·d) — skew in the CENTROID table, bounded by the
    * spec's per-super fanout telemetry, and at production scale the
    * standard fix is one more level (a tree), same machinery.
    * ORACLE-PAIRED like the flat key: every stage — super seeding
    * (index-stride over the exemplar centroids), centroid→super argmax,
    * row→super argmax, row→centroid argmax within the super's slice,
    * and the drop rule — is deterministic double arithmetic on
    * SQL-selectable rows, replayed in DuckDB with the same
    * (cosine DESC, id) tie order the strict-> folds produce; the
    * driver-side fdot bookkeeping follows the same sequential fold
    * contract list_dot_product matches. DedupSimilaritySpec
    * additionally replays the whole decision brute-force on the
    * fixture AND the clustered corpus. */
  def semanticDedupCoarse(spark: SparkSession, dir: String): DataFrame =
    semPrune(coarseAssign(corpus(spark, dir),
      semCentroidsFor(spark, dir, corpus(spark, dir), 0)))

  /** The two-level (super → centroid) assignment itself, shared by the
    * coarse dedup key and its hot-cluster telemetry so the cap's triage
    * view reports the SAME partition the pair stage refuses over.
    * Output grain: (vec_id, embedding, nrm, cluster_id, ccos). */
  private[graft] def coarseAssign(c: DataFrame,
      cents: Seq[(Int, Array[Float])]): DataFrame = {
    val k = cents.size
    val nSup = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val sstride = math.max(1, (k + nSup - 1) / nSup)
    val supers: Seq[(Int, Array[Float])] = cents.zipWithIndex.collect {
      case ((_, v), i) if i % sstride == 0 => (i / sstride, v)
    }
    val supNorm = supers.map { case (sid, v) => sid -> math.sqrt(fdot(v, v)) }.toMap
    // centroid → super: argmax by cosine, ties to the lowest sid; a
    // super SEED belongs to its own group by definition (an identical
    // earlier vector would otherwise tie-steal it and leave the group
    // empty while rows still route to it)
    val bySup: Seq[Seq[(Int, Array[Float])]] = {
      val assigned = cents.zipWithIndex.map { case ((cid, v), i) =>
        val sid =
          if (i % sstride == 0) i / sstride
          else {
            val n = math.sqrt(fdot(v, v))
            var best = Double.MinValue
            var b = -1
            supers.foreach { case (s, sv) =>
              val cos = fdot(sv, v) / (n * supNorm(s))
              if (cos > best) { best = cos; b = s }
            }
            b
          }
        (sid, cid, v)
      }
      supers.map { case (sid, _) =>
        assigned.filter(_._1 == sid).map(t => (t._2, t._3)) }
    }
    // zero-norm/NaN guard: such a row's super argmax stays -1 (NaN > x
    // is never true), and an out-of-range slice index is a runtime
    // error in the nested expression (as element_at was in the fold
    // form) — degrade exactly as the flat assignment does (cluster_id
    // -1, ccos Double.MinValue) instead of crashing
    c.withColumn("sid",
        assignedCentBest(supers, "embedding", "nrm").getField("cid"))
      .withColumn("a", when(col("sid") >= 0,
          graft.functions.CellArgmax.bestNested(
            col("embedding"), col("nrm"), col("sid"), bySup))
        .otherwise(struct(lit(Double.MinValue).as("best"), lit(-1).as("cid"))))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("a.cid").cast("long").as("cluster_id"), col("a.best").as("ccos"))
  }

  /** The overflow side of [[SemClusterCap]] over ANY assignment frame
    * (cluster_id column) — every cluster [[semPrune]]'s cap refused to
    * expand, with its membership. */
  private def hotClustersOf(asn: DataFrame, cap: Int): DataFrame =
    asn.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > cap)
      .orderBy(col("cluster_id"))

  /** Hot-cluster triage view under the FLAT exemplar assignment (the
    * [[semanticDedup]] partition): every cluster the pair stage refused
    * to expand, with its membership — the triage view on a
    * pathologically concentrated corpus. Empty on healthy corpora
    * (fixture max membership 34), so not a driver key;
    * DedupSimilaritySpec plants a 2k-member cluster against it. */
  private[graft] def semanticHotClusters(spark: SparkSession, c: DataFrame,
      cap: Int = SemClusterCap): DataFrame = {
    val cents = semCentroids(spark, c, 0)
    hotClustersOf(
      c.withColumn("a", assignedCentBest(cents, "embedding", "nrm"))
        .select(col("a.cid").cast("long").as("cluster_id")), cap)
  }

  /** Hot-cluster triage view under the COARSE two-level assignment —
    * the partition [[semanticDedupCoarse]]'s cap actually refuses over
    * is a different (coarser-boundary) one than the flat key's, so it
    * gets its own telemetry counterpart rather than borrowing the
    * flat view. */
  private[graft] def semanticHotClustersCoarse(spark: SparkSession,
      c: DataFrame, cap: Int = SemClusterCap): DataFrame =
    hotClustersOf(
      coarseAssign(c, semCentroids(spark, c, 0)).select(col("cluster_id")),
      cap)

  /** The int8 quantization every PCA input rides: the per-vector
    * max-abs scale and round-half-up of [[Pipeline.quantizeInt8Of]]
    * (already oracle-paired under `sim_quantize_int8`), emitted as a
    * BIGINT array. Zero-norm vectors have no direction — they are
    * filtered, matching the semantic-dedup cid = −1 stance. */
  private def quantArr: String =
    """transform(embedding, x -> cast(floor(cast(x as double) / sc * 127 + 0.5)
      |  as bigint))""".stripMargin

  private def withScale(emb: DataFrame): DataFrame =
    emb.withColumn("sc", expr(
      "nullif(array_max(transform(embedding, y -> abs(cast(y as double)))), cast(0 as double))"))
      .filter(col("sc").isNotNull)

  /** Upper-triangular Gram matrix of the int8-quantized embeddings —
    * the exact-integer core of embedding PCA/whitening (G = QᵀQ over
    * the quantized matrix; the covariance eigenproblem [[pcaProject]]
    * solves is d×d, computed here distributed and exactly). Integer
    * entries make this ORACLE-PAIRED: q ∈ [−127, 127]⁶⁴ ⇒ |g| ≤
    * n·127², inside BIGINT to n ≈ 5·10¹⁴ rows.
    *
    * Plan shape: one posexplode to (dim i, qᵢ, q) — 64 rows per vector
    * that NEVER leave their partition uncombined, because the
    * groupBy(i) partial aggregate collapses each task to ≤ 64 rows of
    * 64 sums before the shuffle (the flat-agg-columns device the IVF
    * k-means step documents at `Similarity.scala:308`); the shuffle
    * moves 64 rows × tasks, not n×d² anything. */
  def pcaGram(spark: SparkSession, dir: String): DataFrame =
    pcaGramOf(Tables.embeddings(spark, dir))

  private[graft] def pcaGramOf(emb: DataFrame): DataFrame = {
    val q = withScale(emb).selectExpr(s"$quantArr as q")
    val e = q.select(posexplode(col("q")).as(Seq("i", "qi")), col("q"))
    val sums = (0 until Dim).map(j =>
      sum(col("qi") * col("q").getItem(j)).as(s"g$j"))
    e.groupBy(col("i"))
      .agg(sums.head, sums.tail: _*)
      .select(col("i").cast("long").as("i"),
        posexplode(array((0 until Dim).map(j => col(s"g$j")): _*))
          .as(Seq("j", "g")))
      .filter(col("i") <= col("j"))
      .select(col("i"), col("j").cast("long").as("j"), col("g"))
      .orderBy(col("i"), col("j"))
  }

  /** Principal-axis projection: power iteration on the exact integer
    * Gram matrix (d×d = 64×64 — driver-side bounded bookkeeping, like
    * the IVF centroid table) from the fixed all-ones start, 40
    * multiply-normalize rounds, sign fixed so the largest-|component|
    * coordinate is positive; each vector's projection is then the
    * integer dot of its quantized array with the ×2²⁰-quantized axis —
    * exact long arithmetic again, so the OUTPUT is bit-deterministic
    * even though the axis itself was computed in driver doubles.
    * Rows-only: the oracle cannot replay driver float iteration;
    * DedupSimilaritySpec pins a planted-anisotropy corpus (axis finds
    * the stretched direction) and the Rayleigh-dominance invariant.
    *
    * Determinism caveat (ADVICE r15): "bit-deterministic" holds PER
    * ENVIRONMENT. When the top two eigenvalues of the quantized Gram
    * are near-degenerate, power iteration's recovered axis (and every
    * projection's sign with it) is decided by last-ulp driver double
    * arithmetic and may differ across JVMs/platforms — fine for a
    * rows-only key and for any single deployment, but bench/regression
    * hashes captured on one machine are not portable to another for a
    * corpus whose λ₁ ≈ λ₂. Real embedding corpora have a dominant
    * direction (the planted-anisotropy spec is the realistic shape);
    * a consumer needing cross-platform hashes on a degenerate corpus
    * should deflate, compare Rayleigh quotients, and pin a documented
    * fallback axis when they tie — not needed for any gate here.
    *
    * Scale posture: one distributed gram pass (above) + a 64×64 driver
    * solve + one map-only projection pass — the PCA recipe that never
    * shuffles the embedding matrix. */
  def pcaProject(spark: SparkSession, dir: String): DataFrame =
    pcaProjectOf(Tables.embeddings(spark, dir))

  private[graft] def pcaProjectOf(emb: DataFrame): DataFrame = {
    val gRows = pcaGramOf(emb).collect().map(r =>
      (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2)))
    val g = Array.ofDim[Double](Dim, Dim)
    gRows.foreach { case (i, j, v) => g(i)(j) = v.toDouble; g(j)(i) = v.toDouble }
    var v = Array.fill(Dim)(1.0 / math.sqrt(Dim.toDouble))
    for (_ <- 1 to 40) {
      val nv = Array.tabulate(Dim) { i =>
        var s = 0.0; var j = 0
        while (j < Dim) { s += g(i)(j) * v(j); j += 1 }; s
      }
      val n = math.sqrt(nv.map(x => x * x).sum)
      v = if (n > 0) nv.map(_ / n) else v
    }
    val top = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(top) < 0) v = v.map(x => -x)
    val vq = v.map(x => math.floor(x * (1L << 20) + 0.5).toLong)
    val vqCol = s"array(${vq.mkString(", ")})"
    withScale(emb).selectExpr("vec_id", s"$quantArr as q")
      .selectExpr("vec_id",
        s"""aggregate(zip_with(q, $vqCol, (a, b) -> a * b),
           |  cast(0 as bigint), (acc, x) -> acc + x) as proj_fix""".stripMargin)
      .orderBy(col("vec_id"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_pca_gram"        -> pcaGram,
    "sim_pca_project"     -> pcaProject,
    "dedup_semantic"      -> semanticDedup,
    "dedup_semantic_coarse" -> semanticDedupCoarse,
    "sim_topk_bruteforce" -> topKBruteForce,
    "sim_range_search"    -> rangeSearch,
    "sim_topk_codegen"    -> topKCodegen,
    "sim_topk_lsh"        -> topKLsh,
    "sim_topk_ivf"        -> topKIvf,
    "sim_topk_pq"         -> topKPq,
    "sim_topk_ivfpq"      -> topKIvfPq,
    "sim_topk_ivfpq_res"  -> topKIvfPqResidual,
    "sim_topk_opq"        -> topKOpq,
    "sim_label_centroids" -> labelCentroids)

  private val bruteForceOracle: String =
      s"""WITH c AS (SELECT vec_id, embedding,
         |             ${VectorOps.duckNorm("embedding")} AS nrm
         |           FROM embeddings),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |             ${VectorOps.duckDot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
         |      FROM c q JOIN c ON q.vec_id < $NQueries AND c.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, rank, cosine FROM (
         |  SELECT query_id, neighbor_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM p) t
         |WHERE rank <= $K""".stripMargin

  override val oracles: Map[String, String] = Map(
    "sim_pca_gram" ->
      """WITH s AS (SELECT vec_id, embedding,
        |             nullif(list_max(list_transform(embedding,
        |               y -> abs(CAST(y AS DOUBLE)))), 0) AS sc
        |           FROM embeddings),
        |q AS (SELECT list_transform(embedding,
        |        x -> CAST(floor(CAST(x AS DOUBLE) / sc * 127 + 0.5) AS BIGINT)) AS q
        |      FROM s WHERE sc IS NOT NULL),
        |e AS (SELECT q, i - 1 AS i, q[i] AS qi
        |      FROM q, unnest(generate_series(1, len(q))) AS u(i)),
        |p AS (SELECT e.i, j - 1 AS j, e.qi * e.q[j] AS v
        |      FROM e, unnest(generate_series(1, len(e.q))) AS w(j)
        |      WHERE j - 1 >= e.i)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |       CAST(SUM(v) AS BIGINT) AS g
        |FROM p GROUP BY i, j ORDER BY i, j""".stripMargin,
    "dedup_semantic" ->
      s"""WITH c AS (SELECT vec_id, embedding,
         |             ${VectorOps.duckNorm("embedding")} AS nrm
         |           FROM embeddings),
         |seeds AS (SELECT vec_id // $SeedStride AS cid, embedding AS se, nrm AS sn
         |          FROM c
         |          WHERE vec_id % $SeedStride = 0),
         |asn AS (SELECT vec_id, cid, ccos FROM (
         |  SELECT c.vec_id, s.cid,
         |         ${VectorOps.duckDot("c.embedding", "s.se")} / (c.nrm * s.sn) AS ccos,
         |         ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |           ORDER BY ${VectorOps.duckDot("c.embedding", "s.se")} / (c.nrm * s.sn) DESC,
         |                    s.cid) AS rn
         |  FROM c CROSS JOIN seeds s) t WHERE rn = 1),
         |csz AS (SELECT cid, COUNT(*) AS cn FROM asn GROUP BY cid),
         |dropped AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM asn a JOIN asn b ON a.cid = b.cid
         |   AND (b.ccos < a.ccos OR (b.ccos = a.ccos AND b.vec_id < a.vec_id))
         |  JOIN csz z ON z.cid = a.cid AND z.cn <= $SemClusterCap
         |  JOIN c ca ON ca.vec_id = a.vec_id
         |  JOIN c cb ON cb.vec_id = b.vec_id
         |  WHERE ${VectorOps.duckDot("ca.embedding", "cb.embedding")}
         |          / (ca.nrm * cb.nrm) >= $SemTau)
         |SELECT vec_id, cid AS cluster_id, ccos AS centroid_cosine
         |FROM asn WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
         |ORDER BY vec_id""".stripMargin,
    "dedup_semantic_coarse" ->
      s"""WITH c AS (SELECT vec_id, embedding,
         |             ${VectorOps.duckNorm("embedding")} AS nrm
         |           FROM embeddings),
         |cents AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS i,
         |                 vec_id // $SemSeedStride AS cid,
         |                 embedding AS ce, nrm AS cn
         |          FROM c WHERE vec_id % $SemSeedStride = 0),
         |p AS (SELECT k, nsup, (k + nsup - 1) // nsup AS sstride FROM (
         |        SELECT COUNT(*) AS k,
         |               CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS nsup
         |        FROM cents) t),
         |supers AS (SELECT c.i // p.sstride AS sid, c.ce AS se, c.cn AS sn
         |           FROM cents c, p WHERE c.i % p.sstride = 0),
         |c2s AS (
         |  SELECT i, sid FROM (
         |    SELECT c.i, s.sid,
         |           ROW_NUMBER() OVER (PARTITION BY c.i
         |             ORDER BY ${VectorOps.duckDot("c.ce", "s.se")} / (c.cn * s.sn) DESC,
         |                      s.sid) AS rn
         |    FROM cents c CROSS JOIN supers s, p WHERE c.i % p.sstride <> 0) t
         |  WHERE rn = 1
         |  UNION ALL
         |  SELECT c.i, c.i // p.sstride AS sid FROM cents c, p
         |  WHERE c.i % p.sstride = 0),
         |r2s AS (SELECT vec_id, sid FROM (
         |    SELECT c.vec_id, s.sid,
         |           ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |             ORDER BY ${VectorOps.duckDot("c.embedding", "s.se")} / (c.nrm * s.sn) DESC,
         |                      s.sid) AS rn
         |    FROM c CROSS JOIN supers s) t WHERE rn = 1),
         |asn AS (SELECT vec_id, cid, ccos FROM (
         |    SELECT c.vec_id, ct.cid,
         |           ${VectorOps.duckDot("c.embedding", "ct.ce")} / (c.nrm * ct.cn) AS ccos,
         |           ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |             ORDER BY ${VectorOps.duckDot("c.embedding", "ct.ce")} / (c.nrm * ct.cn) DESC,
         |                      ct.cid) AS rn
         |    FROM c JOIN r2s r ON r.vec_id = c.vec_id
         |    JOIN c2s m ON m.sid = r.sid
         |    JOIN cents ct ON ct.i = m.i) t WHERE rn = 1),
         |csz AS (SELECT cid, COUNT(*) AS cn FROM asn GROUP BY cid),
         |dropped AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM asn a JOIN asn b ON a.cid = b.cid
         |   AND (b.ccos < a.ccos OR (b.ccos = a.ccos AND b.vec_id < a.vec_id))
         |  JOIN csz z ON z.cid = a.cid AND z.cn <= $SemClusterCap
         |  JOIN c ca ON ca.vec_id = a.vec_id
         |  JOIN c cb ON cb.vec_id = b.vec_id
         |  WHERE ${VectorOps.duckDot("ca.embedding", "cb.embedding")}
         |          / (ca.nrm * cb.nrm) >= $SemTau)
         |SELECT vec_id, cid AS cluster_id, ccos AS centroid_cosine
         |FROM asn WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
         |ORDER BY vec_id""".stripMargin,
    "sim_topk_bruteforce" -> bruteForceOracle,
    "sim_range_search" ->
      s"""WITH c AS (SELECT vec_id, embedding,
         |             ${VectorOps.duckNorm("embedding")} AS nrm
         |           FROM embeddings)
         |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |       ${VectorOps.duckDot("q.embedding", "c.embedding")}
         |         / (q.nrm * c.nrm) AS cosine
         |FROM c q JOIN c ON q.vec_id < $NQueries AND c.vec_id <> q.vec_id
         |WHERE ${VectorOps.duckDot("q.embedding", "c.embedding")}
         |        / (q.nrm * c.nrm) >= $RangeTau
         |ORDER BY query_id, cosine DESC, neighbor_id""".stripMargin,
    "sim_topk_codegen"    -> bruteForceOracle,
    "sim_label_centroids" ->
      """SELECT label, CAST(i - 1 AS BIGINT) AS dim, COUNT(*) AS n,
        |       CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,6)))
        |            AS DOUBLE) / COUNT(*) AS mean_x
        |FROM embeddings,
        |     unnest(generate_series(1, len(embedding))) AS s(i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
