package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

/** Streaming consumer of the VECTOR ingest path — the embeddings half
  * of what [[CorpusStream]] is for text and [[MediaStream]] for media:
  * new vectors land continuously (fresh embeddings from an encoder
  * fleet) and each must be admitted to the SERVING ANN index.
  *
  * The production contract this models is FAISS-style add-with-frozen-
  * stats: the standing corpus's IVF centroids and PQ codebooks are
  * trained ONCE ([[Similarity.servingIndex]]) and every arriving
  * vector is encoded under them — assignment and codes are pure
  * map-side codegen against broadcast-sized statistics, so ingest
  * throughput is scan-bound and the index entry (vec_id, cent_id,
  * 8 codes) is the ONLY thing that lands in the index; retraining is
  * an offline rebuild, never a per-batch side effect (per-batch
  * retraining would silently re-key every previously served posting).
  * Stream == batch is BY CONSTRUCTION for the encode itself (same
  * expressions, same frozen stats); the spec pins that the streaming
  * machinery — batching, restarts of the landing scan, broadcast reuse
  * across batches — introduces no divergence, the same claim the other
  * ingest twins make. No state store: the frozen stats are the state,
  * and they live with the index, not in Spark state. */
object VectorStream {

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Start the ingest: every micro-batch of vectors landing under
    * `newVecsDir` (parquet: vec_id, embedding) is encoded under the
    * standing corpus `dir`'s frozen serving index, and the resulting
    * (vec_id, cent_id, codes) postings frame is handed to `sink` with
    * the micro-batch id. The caller owns checkpointing via `options`. */
  def ivfIngestStream(spark: SparkSession, dir: String, newVecsDir: String,
      options: Map[String, String] = Map.empty)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val (cents, books) = Similarity.servingIndex(spark, dir)
    val landing = spark.readStream.schema(vecSchema).parquet(newVecsDir)
    landing.writeStream
      .options(options)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(Similarity.encodeForIndex(batch.toDF(), cents, books), batchId)
      }
      .start()
  }
}
