package graft.streaming

import graft.operators.Multimodal
import graft.operators.Multimodal.{AudioBandWindow, MediaRow}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming consumers of the multimodal codec seam
  * (ref: clickhouse_vs_dbt has no media path; this is the engine's
  * LLM-pipeline extension surface, streaming half).
  *
  * The batch side ([[graft.operators.Multimodal]]) decodes whole
  * payloads per row. A production ingest never sees whole payloads —
  * media arrives as ordered CHUNKS of an encoded stream (multipart
  * uploads, RTP-ish segments), and the feature extractor must fold them
  * incrementally with bounded per-media state. This file implements that
  * half for the audio window features, bit-equal to the batch
  * [[Multimodal.audioBandWindows]] by construction: windows are
  * INDEPENDENT (energy and turning-point counts never reference samples
  * outside the window — `k >= 2` is window-local in both
  * implementations), so the only state a correct incremental fold needs
  * is (a) the residual < `win` samples of the currently-open window,
  * (b) the next-expected chunk cursor, and (c) a bounded reorder buffer
  * for early chunks. Nothing in the state grows with media length — the
  * 100 TB property. */
object MediaStream {

  /** One landed segment of an encoded media stream. `n_chunks` is the
    * manifest total — how the handler knows the final (possibly
    * partial) window can be sealed. */
  case class AudioChunk(media_id: Long, chunk_idx: Int, n_chunks: Int,
      payload: Array[Byte])

  /** Bounded per-media fold state: residual ≤ win-1 decoded samples,
    * the in-order cursor, and the reorder buffer (chunk_idx → bytes,
    * ≤ [[PendingCap]] entries — the hot-bucket-style refusal bound). */
  case class AudioChunkState(residual: Seq[Short], winIdx: Long,
      nextChunk: Int, pending: Map[Int, Array[Byte]])

  /** Reorder-buffer refusal bound: a source more than this many chunks
    * out of order per media is a broken feed, not a workload — fail
    * loud rather than buffer unboundedly (the MinHash `HotBucketCap`
    * stance applied to ingest). The cap is checked AFTER the drain
    * loop, on the residual pending map only: a healthy in-order feed
    * that lands a whole media (any number of chunks) in one micro-batch
    * drains to an empty buffer and never trips it — only genuinely
    * out-of-order residue counts against the bound. */
  val PendingCap = 64

  /** Stalled-media grace period: a media whose manifest never completes
    * (partial upload, dead producer) would otherwise hold its residual
    * samples, cursor, and reorder buffer in the state store forever.
    * After this much processing time with no progress the key times
    * out and its state is DROPPED — the open window/segment is
    * discarded, not emitted, because a partial media is not a valid
    * media (emitting would also break stream == batch parity, since
    * the batch side only ever sees complete payloads). Pass 0 to
    * disable expiry (tests that drive batches slowly).
    *
    * Operational note: ProcessingTimeTimeout makes Spark run micro-
    * batches CONTINUOUSLY (`shouldRunAnotherBatch` is always true so
    * pending timeouts can fire) — deploy with an explicit trigger
    * interval. In tests either pass 0 here or set a trigger: with the
    * default 0-interval trigger the back-to-back empty batches flip
    * `noNewData` fast enough that `processAllAvailable` can starve
    * (measured: a spec hung ~40 minutes across ~10k empty batches). */
  val StallTimeoutMs: Long = 30L * 60 * 1000

  /** Batch helper: explode a media table's audio payloads into
    * `chunkBytes`-sized ordered chunks — what a landing zone of
    * segmented uploads looks like, and the producer the spec uses to
    * stage one. `chunkBytes` must be even so sample framing (2-byte
    * little-endian) never straddles a chunk boundary except at the
    * payload's own odd tail, exactly where the batch decoder drops it. */
  def audioChunksOf(media: Dataset[MediaRow], chunkBytes: Int = 100): DataFrame = {
    require(chunkBytes > 0 && chunkBytes % 2 == 0, "chunkBytes must be positive and even")
    media.toDF().filter(col("media_type") === "audio")
      .select(col("media_id").as("media_id"), col("payload"))
      .withColumn("n_chunks",
        ceil(octet_length(col("payload")) / lit(chunkBytes.toDouble)).cast("int"))
      .filter(col("n_chunks") > 0)
      .select(col("media_id"), col("n_chunks"),
        posexplode(expr(
          s"transform(sequence(0, n_chunks - 1), i -> substring(payload, i * $chunkBytes + 1, $chunkBytes))")))
      .select(col("media_id"), col("pos").cast("int").as("chunk_idx"),
        col("n_chunks"), col("col").as("payload"))
  }

  private val chunkSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("chunk_idx", IntegerType),
    StructField("n_chunks", IntegerType),
    StructField("payload", BinaryType)))

  /** One landed video frame, decoded to its integer features AT THE
    * EDGE (map-side, where the codec runs): 24 bytes per frame cross
    * the wire and sit in state — never pixel bytes. `n_frames` is the
    * manifest total of frames the feed will deliver. */
  case class FrameFeature(media_id: Long, frame_idx: Long, n_frames: Long,
      fsum: Long, flen: Long)

  /** Batch helper: the frame feed a landing zone would carry —
    * [[Multimodal.frameSumsOf]]'s integer features plus the per-media
    * manifest count. */
  def videoFrameFeedOf(media: Dataset[MediaRow]): DataFrame = {
    val fs = Multimodal.frameSumsOf(media).toDF()
    val n = fs.groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"))
    fs.join(n, Seq("media_id"))
      .select(col("media_id"), col("frame_idx"), col("n_frames"),
        col("fsum"), col("flen"))
  }

  /** Bounded per-media segmentation state: the OPEN segment's
    * accumulators, the in-order cursor + previous quantized mean, and
    * the ≤ [[PendingCap]] reorder buffer of (fsum, flen) pairs. */
  case class SceneState(nextFrame: Long, prevQ: Long, sceneId: Long,
      startFrame: Long, nFrames: Long, sumBytes: Long, minQ: Long,
      maxQ: Long, pending: Map[Long, (Long, Long)])

  case class SceneSegmentOut(media_id: Long, scene_id: Long,
      start_frame: Long, n_frames: Long, sum_bytes: Long,
      min_mean_q: Long, max_mean_q: Long)

  /** Streaming twin of [[Multimodal.sceneSegmentsOf]]: fold a video
    * frame feed into scene segments with `flatMapGroupsWithState`. A
    * segment row is emitted exactly once — when the cut that CLOSES it
    * arrives (or when the manifest completes, for the final open
    * segment, after which the media's state retires). The cut rule is
    * the batch key's integer arithmetic verbatim (mean_q = 256·fsum
    * div flen, |Δ| > 4096), so stream == batch bit-for-bit; frames may
    * arrive out of order and across micro-batch boundaries within the
    * same [[PendingCap]] reorder bound the audio twin enforces. */
  def sceneSegmentStream(spark: SparkSession, feedDir: String,
      stallTimeoutMs: Long = StallTimeoutMs): Dataset[SceneSegmentOut] = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("frame_idx", LongType),
      StructField("n_frames", LongType), StructField("fsum", LongType),
      StructField("flen", LongType)))
    val frames = spark.readStream.schema(schema).parquet(feedDir)
      .as[FrameFeature]
    val timeoutConf = if (stallTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    frames.groupByKey(_.media_id)
      .flatMapGroupsWithState[SceneState, SceneSegmentOut](
        OutputMode.Update(), timeoutConf) {
        case (mediaId, it, state) =>
          if (state.hasTimedOut) {
            // stalled media: drop the open segment and retire the key
            // (documented policy — see [[StallTimeoutMs]])
            state.remove()
            Iterator.empty
          } else {
          val st = state.getOption.getOrElse(
            SceneState(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, Map.empty))
          var pending = st.pending
          var manifest = -1L
          it.foreach { f =>
            manifest = f.n_frames
            if (f.frame_idx >= st.nextFrame && !pending.contains(f.frame_idx))
              pending = pending.updated(f.frame_idx, (f.fsum, f.flen))
          }
          var (next, prevQ, sceneId, start, n, sum, minQ, maxQ) =
            (st.nextFrame, st.prevQ, st.sceneId, st.startFrame, st.nFrames,
              st.sumBytes, st.minQ, st.maxQ)
          val out = scala.collection.mutable.ArrayBuffer.empty[SceneSegmentOut]
          while (pending.contains(next)) {
            val (fsum, flen) = pending(next)
            pending = pending.removed(next)
            val q = fsum * 256 / flen
            if (n == 0L) {
              start = next; n = 1L; sum = fsum; minQ = q; maxQ = q
            } else if (math.abs(q - prevQ) > 4096L) {
              out += SceneSegmentOut(mediaId, sceneId, start, n, sum, minQ, maxQ)
              sceneId += 1; start = next; n = 1L; sum = fsum; minQ = q; maxQ = q
            } else {
              n += 1; sum += fsum
              if (q < minQ) minQ = q
              if (q > maxQ) maxQ = q
            }
            prevQ = q
            next += 1
          }
          // cap the RESIDUAL buffer only — what the drain could not
          // consume is the true out-of-order debt (ADVICE r15: checking
          // before the drain killed healthy whole-media micro-batches)
          require(pending.size <= PendingCap,
            s"media $mediaId frame reorder buffer ${pending.size} exceeds $PendingCap — broken feed")
          if (manifest >= 0 && next >= manifest) {
            if (n > 0L) out += SceneSegmentOut(mediaId, sceneId, start, n, sum, minQ, maxQ)
            state.remove()
          } else {
            state.update(SceneState(next, prevQ, sceneId, start, n, sum,
              minQ, maxQ, pending))
            if (stallTimeoutMs > 0) state.setTimeoutDuration(stallTimeoutMs)
          }
          out.iterator
          }
      }
  }

  /** Streaming twin of [[Multimodal.audioBandWindows]]: fold an audio
    * chunk stream into per-window integer features with
    * `flatMapGroupsWithState`, emitting each completed window exactly
    * once (windows are sealed in order; the final partial window seals
    * when the manifest count is reached, after which the key's state is
    * REMOVED — a finished media costs nothing forever). Chunks may
    * arrive out of order and across micro-batch boundaries; duplicates
    * (at-least-once sources) are dropped idempotently by the cursor and
    * the reorder buffer's keyed insert. */
  def audioBandWindowStream(spark: SparkSession, chunkDir: String,
      win: Int = 256,
      stallTimeoutMs: Long = StallTimeoutMs): Dataset[AudioBandWindow] = {
    import spark.implicits._
    val chunks = spark.readStream.schema(chunkSchema).parquet(chunkDir)
      .as[AudioChunk]
    val timeoutConf = if (stallTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    chunks.groupByKey(_.media_id)
      .flatMapGroupsWithState[AudioChunkState, AudioBandWindow](
        OutputMode.Update(), timeoutConf) {
        case (mediaId, it, state) =>
          if (state.hasTimedOut) {
            // stalled media: drop the open window and retire the key
            // (documented policy — see [[StallTimeoutMs]])
            state.remove()
            Iterator.empty
          } else {
          val st = state.getOption.getOrElse(
            AudioChunkState(Seq.empty, 0L, 0, Map.empty))
          var pending = st.pending
          var nChunks = -1
          it.foreach { c =>
            nChunks = c.n_chunks
            // idempotent insert: already-consumed or already-buffered
            // replays are no-ops
            if (c.chunk_idx >= st.nextChunk && !pending.contains(c.chunk_idx))
              pending = pending.updated(c.chunk_idx, c.payload)
          }
          val buf = scala.collection.mutable.ArrayBuffer.empty[Short]
          buf ++= st.residual
          var next = st.nextChunk
          var winIdx = st.winIdx
          val out = scala.collection.mutable.ArrayBuffer.empty[AudioBandWindow]
          def seal(w: Array[Short]): Unit = {
            var e = 0L; var tp = 0L; var k = 0
            while (k < w.length) {
              val v = w(k).toLong
              e += v * v
              if (k >= 2) {
                val d1 = w(k - 1) - w(k - 2)
                val d2 = w(k) - w(k - 1)
                if (d1.toLong * d2.toLong < 0) tp += 1
              }
              k += 1
            }
            out += AudioBandWindow(mediaId, winIdx, e, tp)
            winIdx += 1
          }
          while (pending.contains(next)) {
            val bytes = pending(next)
            pending = pending.removed(next)
            require(next == nChunks - 1 || bytes.length % 2 == 0,
              s"media $mediaId chunk $next: only the final chunk may have an odd byte length")
            buf ++= Multimodal.FakeCodec.pcm(bytes)
            next += 1
            while (buf.length >= win) {
              seal(buf.take(win).toArray)
              buf.remove(0, win)
            }
          }
          // cap the RESIDUAL buffer only — what the drain could not
          // consume is the true out-of-order debt (ADVICE r15: checking
          // before the drain killed healthy whole-media micro-batches)
          require(pending.size <= PendingCap,
            s"media $mediaId reorder buffer ${pending.size} exceeds $PendingCap — broken feed")
          if (nChunks >= 0 && next >= nChunks) {
            // manifest complete: seal the final partial window and
            // retire the key's state entirely
            if (buf.nonEmpty) seal(buf.toArray)
            state.remove()
          } else {
            state.update(AudioChunkState(buf.toSeq, winIdx, next, pending))
            if (stallTimeoutMs > 0) state.setTimeoutDuration(stallTimeoutMs)
          }
          out.iterator
          }
      }
  }
}
