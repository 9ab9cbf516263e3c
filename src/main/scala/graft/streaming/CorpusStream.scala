package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
