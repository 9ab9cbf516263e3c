package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed LLM-data pipeline the
  * individual operators exist for: quality gating + near-dup clustering
  * + representative selection, as one declarative flow.
  *
  * Near-dup pairs (from [[Dedup.ngramJaccard]]) are only *edges*; proper
  * dedup needs the connected components (a∼b, b∼c ⇒ keep one of
  * {a,b,c}). [[components]] computes them with iterative min-label
  * propagation — each round is one join + aggregate, labels only
  * decrease, and the iteration count is bounded by the component
  * diameter (near-dup clusters are tiny, so 2–3 rounds). The driver-side
  * loop is algorithm control flow (a fixpoint test per round), not data
  * collection; every data-sized structure stays distributed.
  */
object Curation extends QueryPack {

  /** Connected components over near-dup edges: (doc_id, component) where
    * component = min doc_id reachable. Docs with no edges map to
    * themselves. */
  def components(spark: SparkSession, dir: String): DataFrame = {
    val edges = Dedup.ngramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b")).cache()
    // symmetric adjacency incl. self-loops keeps isolated nodes stable
    val adj = edges
      .union(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .cache()
    var labels = Tables.documents(spark, dir)
      .select(col("doc_id"), col("doc_id").as("component"))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      // each node adopts the min label among itself and its neighbors
      val viaNeighbors = adj
        .join(labels.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
        .groupBy(col("doc_a").as("doc_id"))
        .agg(min(col("component")).as("ncomp"))
      val next = labels.join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("ncomp"), col("component")))
            .as("component"))
        .cache()
      next.count() // materialize before comparing against the old labels
      changed = next.join(labels.withColumnRenamed("component", "old"), "doc_id")
        .filter(col("component") =!= col("old")).count()
      labels = next
      rounds += 1
    }
    edges.unpersist()
    adj.unpersist()
    labels
  }

  /** The curated corpus: quality-gated docs, one representative (min
    * doc_id) per near-dup component, with audit columns. */
  def curatedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.quality(spark, dir)
      .select(col("doc_id"), col("keep"), col("n_tokens"))
    val comp = components(spark, dir)
    val clusterSize = comp.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    comp.join(quality, "doc_id")
      .join(clusterSize, "component")
      .withColumn("is_representative", col("doc_id") === col("component"))
      .filter(col("keep") && col("is_representative"))
      .select(col("doc_id"), col("component"), col("cluster_size"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cur_components" -> components,
    "cur_corpus"     -> curatedCorpus)

  /** Components oracle: DuckDB recursive CTE computing min reachable id
    * over the same near-dup edges (same jaccard threshold/shingles). */
  private val dShingles =
    """list_distinct(list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
      |  i -> concat_ws(' ', string_split(text, ' ')[i], string_split(text, ' ')[i + 1],
      |                 string_split(text, ' ')[i + 2])))""".stripMargin

  private val edgesSql =
    s"""WITH RECURSIVE sh AS (SELECT doc_id, $dShingles AS s FROM documents),
       |e AS (SELECT doc_id, unnest(s) AS shingle, len(s) AS n FROM sh),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common,
       |             any_value(a.n) AS na, any_value(b.n) AS nb
       |      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |edges AS (SELECT doc_a, doc_b FROM p
       |          WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.8),
       |sym AS (SELECT doc_a, doc_b FROM edges
       |        UNION ALL SELECT doc_b, doc_a FROM edges)""".stripMargin

  override val oracles: Map[String, String] = Map(
    "cur_components" ->
      s"""$edgesSql,
         |walk(doc_id, target) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT w.doc_id, s.doc_b FROM walk w JOIN sym s ON w.target = s.doc_a)
         |SELECT doc_id, MIN(target) AS component FROM walk GROUP BY 1""".stripMargin,
    "cur_corpus" ->
      s"""$edgesSql,
         |walk(doc_id, target) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT w.doc_id, s.doc_b FROM walk w JOIN sym s ON w.target = s.doc_a),
         |comp AS (SELECT doc_id, MIN(target) AS component FROM walk GROUP BY 1),
         |csize AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY 1),
         |toks AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         |                CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |                  / len(string_split(text, ' ')) AS dr
         |         FROM documents)
         |SELECT c.doc_id, c.component, s.cluster_size, t.n_tokens
         |FROM comp c JOIN csize s USING (component) JOIN toks t ON c.doc_id = t.doc_id
         |WHERE c.doc_id = c.component
         |  AND t.n_tokens BETWEEN 20 AND 500 AND t.dr > 0.3
         |ORDER BY c.doc_id""".stripMargin)
}
