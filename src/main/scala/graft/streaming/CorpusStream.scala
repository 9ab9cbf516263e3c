package graft.streaming

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming consumers of the CORPUS ingest path — the text half of
  * what [[MediaStream]] is for media: new documents land continuously
  * (a crawl, an upload queue) and each batch must be curated against
  * the STANDING corpus before admission.
  *
  * The substring-dedup ingest shape ([[Dedup.substringIncremental]]'s
  * scaladoc: batch cost ∝ batch size × match density, never corpus ×
  * corpus) maps onto Structured Streaming as a `foreachBatch` over the
  * landing stream: per micro-batch, the NEW docs span-match the static
  * corpus with the exact batch operator — no operator reimplementation,
  * no state store (the corpus side IS the state, and it lives in the
  * lake, not in Spark state: at 100 TB the standing gram index is a
  * maintained table, not executor memory). Stream == batch is therefore
  * BY CONSTRUCTION for the span logic; the only statistics computed
  * per-batch are the gram-df cap and the derived span length, over
  * corpus ∪ batch (what a live ingest can know — the spec pins
  * bit-equality on the fixture, where neither stat is near a
  * boundary). */
object CorpusStream {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Start the ingest: every micro-batch of documents landing under
    * `newDocsDir` (parquet: doc_id, text) is span-matched against
    * `corpus`, and the resulting spans frame (new_doc, corpus_doc,
    * start_new, start_corpus, span_tokens) is handed to `sink` with
    * the micro-batch id. The caller owns checkpointing via `options`. */
  def substringIncrementalStream(spark: SparkSession, corpus: DataFrame,
      newDocsDir: String, options: Map[String, String] = Map.empty)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val landing = spark.readStream.schema(docSchema).parquet(newDocsDir)
    landing.writeStream
      .options(options)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(Dedup.substringIncrementalAgainst(corpus, batch.toDF()), batchId)
      }
      .start()
  }

  /** Incrementally-maintained canonical map — the streaming twin of
    * [[Dedup.canonicalMap]] (r15 verdict "Next" list: "incremental
    * component maintenance ... over arriving edges").
    *
    * Why NOT `mapGroupsWithState` union-find: connected components is
    * the one aggregation whose merges CROSS grouping keys — an arriving
    * edge can fuse two components held under different state keys, so
    * no per-key state layout can apply it locally. The honest Spark
    * shape is `foreachBatch` + an explicitly-maintained component map,
    * which is also the production shape: at 100 TB the map is a lake
    * table (written idempotently per batch id), not executor state.
    *
    * Per micro-batch of NEW docs against the standing corpus:
    *  1. near-dup edges touching ≥ 1 new doc (the only edges that can
    *     change anything: an S×S edge was already applied in the batch
    *     where its later endpoint arrived);
    *  2. endpoints PROJECT through the standing map (old doc → its
    *     component root, new doc → itself) — so the component step
    *     runs on batch-bounded input (new ids + touched roots), never
    *     the corpus;
    *  3. [[Curation.componentsOf]] over the projected graph yields the
    *     merged roots; old components relabel through a broadcast
    *     (old_root → new_root) table, new docs append with their root.
    * Roots stay the MIN doc id of their component by induction (an old
    * root is already the min of its members; componentsOf picks the min
    * of the projected node set), so after any batch sequence the map is
    * BIT-EQUAL to the batch operator over the docs seen so far — the
    * spec pins it, including across a simulated crash (state rebuilt
    * from the last persisted snapshot, the lake-table restart path).
    *
    * Scale posture: the standing side's shingle PREFIXES are a
    * maintained index ([[Dedup.prefixRowsOf]] segments, one per applied
    * batch — at production a persisted lake table), so per-batch pair
    * work is [[Dedup.ngramJaccardTouching]]: shingle the BATCH only,
    * probe the standing index — never re-shingle the corpus (the r16
    * form re-ran the full corpus∪batch PPJoin per micro-batch,
    * O(corpus × batches) over a stream's life; the spec now times two
    * standing-corpus sizes to pin sub-linearity). The relabel table and
    * projected graph are batch-bounded broadcasts; the full-map rewrite
    * per batch is one narrow (long, long) column swap, the lake-table
    * upsert's local twin.
    *
    * Replay idempotency (r16 ADVICE): foreachBatch delivers
    * at-least-once, so a post-failure replay re-offers an
    * already-applied batch id. `ingestBatch` consults the id and
    * no-ops (returning the standing map) when it has already applied
    * it — without the guard the replay re-unioned the same docs,
    * duplicating doc_id rows and inflating n_members. Direct callers
    * that pass no id (-1) always apply. */
  final class CanonicalIngest(spark: SparkSession,
      corpus0: DataFrame, comp0: DataFrame) {
    import org.apache.spark.sql.GraftBridge

    def this(spark: SparkSession) = this(spark, {
      import spark.implicits._
      Seq.empty[(Long, String)].toDF("doc_id", "text")
    }, {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("doc_id", "component")
    })

    // Standing state as CHECKPOINTED SEGMENTS (one per applied batch):
    // appending a batch checkpoints ONLY that batch's docs/shingles/
    // prefix rows — batch-bounded, where a monolithic frame would
    // re-materialize the whole corpus per batch. Readers see the union
    // (production: partition appends to lake tables; a long-lived local
    // stream would compact periodically). The seed segment is built
    // once per (re)start — the snapshot-rebuild path re-shingles the
    // restored corpus a single time, never per batch.
    @volatile private var corpusSegs: Vector[DataFrame] =
      Vector(corpus0.localCheckpoint())
    @volatile private var shSegs: Vector[DataFrame] =
      Vector(Dedup.hashedShinglesOf(corpusSegs.head).localCheckpoint())
    @volatile private var prefSegs: Vector[DataFrame] =
      Vector(Dedup.prefixRowsOf(shSegs.head).localCheckpoint())
    @volatile private var comp: DataFrame = comp0.localCheckpoint()
    @volatile private var lastApplied: Long = -1L

    /** The standing (doc_id, component) map — read for snapshots. */
    def componentMap: DataFrame = comp

    /** The standing corpus docs — read for snapshots. */
    def corpusDocs: DataFrame = corpusSegs.reduce(_ unionByName _)

    /** Apply one batch of new docs; returns the updated DECORATED map
      * (doc_id, canon_id, n_members, is_canonical — the
      * [[Dedup.canonicalMap]] output shape) over all docs seen.
      * `batchId` ≥ 0 is consulted for replay idempotency (class doc);
      * an already-applied id returns the standing map unchanged. */
    def ingestBatch(batch: DataFrame, batchId: Long = -1L): DataFrame =
        synchronized {
      if (batchId >= 0 && batchId <= lastApplied) return decorated
      val newIds = batch.select(col("doc_id"))
      val shB = Dedup.hashedShinglesOf(batch.select(col("doc_id"), col("text")))
        .localCheckpoint()
      val prefB = Dedup.prefixRowsOf(shB).localCheckpoint()
      val prefAll = (prefSegs :+ prefB).reduce(_ unionByName _)
      val shAll = (shSegs :+ shB).reduce(_ unionByName _)
      val touching = Dedup.ngramJaccardTouching(prefB, prefAll, shAll)
        .select(col("doc_a"), col("doc_b"))
      val ca = comp.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("component", "comp_a")
      val cb = comp.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("component", "comp_b")
      val projected = touching
        .join(ca, Seq("doc_a"), "left")
        .join(cb, Seq("doc_b"), "left")
        .select(coalesce(col("comp_a"), col("doc_a")).as("doc_a"),
          coalesce(col("comp_b"), col("doc_b")).as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
      val nodes = projected.select(col("doc_a").as("doc_id"))
        .unionByName(projected.select(col("doc_b").as("doc_id")))
        .unionByName(newIds)
        .distinct()
      val m = Curation.componentsOf(nodes, projected,
        edgesSubsetOfNodes = true)
      val relabel = m.join(broadcast(newIds), Seq("doc_id"), "left_anti")
        .filter(col("doc_id") =!= col("component"))
        .select(col("doc_id").as("component"), col("component").as("newc"))
      val newComp = m.join(broadcast(newIds), Seq("doc_id"), "left_semi")
      val compNext = comp
        .join(broadcast(relabel), Seq("component"), "left")
        .select(col("doc_id"),
          coalesce(col("newc"), col("component")).as("component"))
        .unionByName(newComp)
        .localCheckpoint()
      GraftBridge.releaseLocalCheckpoint(comp)
      comp = compNext
      corpusSegs :+= batch.select(col("doc_id"), col("text")).localCheckpoint()
      shSegs :+= shB
      prefSegs :+= prefB
      if (batchId >= 0) lastApplied = batchId
      decorated
    }

    /** The [[Dedup.canonicalMap]]-shaped view of the standing map.
      * n_members attaches via groupBy-join (the [[Dedup.canonicalMap]]
      * shape) rather than a count-over-window, and the map is NOT
      * sorted — the r16 form paid a global orderBy per snapshot read
      * for presentation no consumer needed. */
    def decorated: DataFrame = {
      val sizes = comp.groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"))
      comp.join(sizes, Seq("component"))
        .select(col("doc_id"), col("component").as("canon_id"),
          col("n_members"),
          (col("doc_id") === col("component")).cast("long").as("is_canonical"))
    }

    /** Release held checkpoints (end of stream / test teardown). */
    def close(): Unit = synchronized {
      GraftBridge.releaseLocalCheckpoint(comp)
      corpusSegs.foreach(GraftBridge.releaseLocalCheckpoint)
      shSegs.foreach(GraftBridge.releaseLocalCheckpoint)
      prefSegs.foreach(GraftBridge.releaseLocalCheckpoint)
    }
  }

  /** Start the canonical-map ingest over documents landing under
    * `newDocsDir`, resuming from `ingest`'s standing state (a fresh
    * `new CanonicalIngest(spark)` for an empty corpus; one constructed
    * from persisted (corpus, map) snapshots for a restart). Each batch
    * hands the updated decorated map and the batch id to `sink`. */
  def canonicalIngestStream(spark: SparkSession, ingest: CanonicalIngest,
      newDocsDir: String, options: Map[String, String] = Map.empty)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val landing = spark.readStream.schema(docSchema).parquet(newDocsDir)
    landing.writeStream
      .options(options)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(ingest.ingestBatch(batch.toDF(), batchId), batchId)
      }
      .start()
  }
}
