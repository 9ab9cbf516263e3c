package graft.operators

import graft.QueryPack
import graft.functions.VectorOps
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` fixture
  * (north-star surface; SURVEY.md §2.3 X3): brute-force cosine top-k as
  * the exact baseline, then two sub-linear scale paths — random-
  * hyperplane LSH and IVF (inverted-file) probing.
  *
  * Scale posture: the query set is small and broadcast; the corpus scan
  * is the only large side, so brute force is one pass, no shuffle on the
  * corpus — at 100 TB the LSH/IVF variants cut the *rerank* set, and the
  * bucket/centroid assignment is a map-side computation against
  * broadcast literals (hyperplanes) or a broadcast centroid table.
  *
  * Determinism: hyperplanes come from a fixed LCG seed (no RNG calls);
  * every ranking is (cosine desc, vec_id) so ties are stable; cosine
  * math follows the [[VectorOps]] bit-exact fold contract.
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

  /** Deterministic pseudo-random hyperplanes in [-1, 1] from a fixed LCG
    * (Numerical Recipes constants) — reproducible across runs/JVMs. */
  private[operators] def hyperplanes(n: Int, dim: Int, seed: Long = 0xC0FFEEL): Seq[Seq[Double]] = {
    var x = seed
    def next(): Double = {
      x = x * 1664525L + 1013904223L
      ((x >>> 16) & 0xFFFFFFL).toDouble / 0xFFFFFFL.toDouble * 2.0 - 1.0
    }
    Seq.fill(n)(Seq.fill(dim)(next()))
  }

  private val NTables = 4
  private val BitsPerTable = 8
  private val Dim = 64

  /** Bit-signature expr for table `t`: sign bits of the dot products with
    * that table's hyperplanes, packed into an int. */
  private def sigExpr(vecCol: String, t: Int): String = {
    val all = hyperplanes(NTables * BitsPerTable, Dim)
    val bits = (0 until BitsPerTable).map { p =>
      val plane = all(t * BitsPerTable + p)
      val arr = plane.map(v => f"cast($v%.17g as double)").mkString("array(", ", ", ")")
      val dot = s"aggregate(zip_with($vecCol, $arr, (x, y) -> cast(x as double) * y), " +
        "cast(0 as double), (acc, v) -> acc + v)"
      s"(case when $dot > 0 then ${1 << p} else 0 end)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** LSH ANN: 4 independent 8-bit random-hyperplane tables, multiprobe at
    * Hamming ≤ 1 within each table (9 probes × 4 tables per query), exact
    * rerank of union-of-buckets candidates. Rows-only; recall vs
    * [[topKBruteForce]] is pinned by ScalaTest. */
  def topKLsh(spark: SparkSession, dir: String): DataFrame = {
    // corpus keyed by (table, sig): one row per table per vector
    val sigs = (0 until NTables).map(t =>
      expr(s"struct(cast($t as int) as tbl, ${sigExpr("embedding", t)} as sig)"))
    val c = corpus(spark, dir)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(array(sigs: _*)).as("ts"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("ts.tbl").as("tbl"), col("ts.sig").as("sig"))
    // queries probe their bucket and every Hamming-1 neighbor per table
    val probes = (0 until BitsPerTable).map(p => col("sig").bitwiseXOR(lit(1 << p)))
    val q = c.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("tbl"),
        explode(array(col("sig") +: probes: _*)).as("sig"))
    // dedup candidates on ids only (never on the embedding arrays), then
    // re-attach the 10 query vectors via a broadcast join
    val candIds = c.join(broadcast(q.select(col("query_id"), col("tbl"), col("sig"))),
        Seq("tbl", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")).distinct()
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

  private val NCentroids = 10
  private val NProbes = 3

  /** IVF ANN: deterministic "sampled" centroids (every 50th vector),
    * nearest-centroid assignment for the corpus, queries probe the 3
    * nearest centroids and rerank exactly. Rows-only + ScalaTest recall. */
  def topKIvf(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val cents = c.filter(col("vec_id") % 50 === 0 && col("vec_id") < 50 * NCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"), col("nrm").as("cn"))
    def nearest(df: DataFrame, keep: Int, idCol: String, eCol: String, nCol: String): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("cdist").desc, col("cent_id")) // cosine desc = nearest
      df.join(broadcast(cents))
        .withColumn("cdist", VectorOps.dot(eCol, "ce") / (col(nCol) * col("cn")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
    }
    val assigned = nearest(c, 1, "vec_id", "embedding", "nrm")
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"))
    val q = nearest(
      c.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn")),
      NProbes, "query_id", "qe", "qn")
      .select(col("query_id"), col("qe"), col("qn"), col("cent_id"))
    val pairs = assigned.join(broadcast(q), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (VectorOps.dot("qe", "embedding") / (col("qn") * col("nrm"))).as("cosine"))
      .distinct()
    rankedTopK(pairs)
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

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> topKBruteForce,
    "sim_topk_codegen"    -> topKCodegen,
    "sim_topk_lsh"        -> topKLsh,
    "sim_topk_ivf"        -> topKIvf)

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
    "sim_topk_bruteforce" -> bruteForceOracle,
    "sim_topk_codegen"    -> bruteForceOracle)
}
