package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star surface): media as opaque
  * `binary` payloads with a typed metadata struct, and the
  * decode → feature-extract → resize → frame-sample pipeline shapes a
  * training-data system needs over them.
  *
  * No image/audio codecs exist in this environment, so the decode step
  * is a clearly-marked DETERMINISTIC FAKE (`FakeCodec`): it derives
  * "pixels" from payload bytes. Everything around it — the schema
  * contract, the `mapPartitions` batch shape (one iterator per
  * partition, no per-row JVM↔native churn), partition preservation, and
  * the typed `Dataset` plumbing — is real and tested, so swapping a
  * true codec in changes one function.
  *
  * Scale posture: media pipelines are pure map-side (no shuffle); the
  * binary column never routes through an aggregate or join key, metadata
  * predicates prune at the scan, and per-partition decode amortizes any
  * codec init cost across the partition.
  */
object Multimodal extends QueryPack {

  /** Typed media row: opaque payload + structured metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte], media_type: String,
      width: Int, height: Int, n_frames: Int)

  case class MediaFeatures(media_id: Long, n_bytes: Long, mean_byte: Double,
      byte_entropy: Double, features: Array[Float])

  case class FrameSample(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** The codec seam: decode is the ONE pluggable step in every media
    * pipeline below. A real deployment implements this trait over its
    * native decoder (libjpeg/ffmpeg/...) and passes it to the ops; the
    * `mapPartitions` call sites initialize per partition, so a heavy
    * codec pays its setup once per partition, not per row. Must be
    * Serializable (ships inside the task closure) and deterministic
    * (the correctness gates hash results). */
  trait MediaCodec extends Serializable {
    /** Feature extraction over an encoded payload. */
    def features(payload: Array[Byte], dim: Int = 8): MediaFeaturesBody
    /** Audio decode to 16-bit PCM samples. */
    def pcm(payload: Array[Byte]): Array[Short]
    /** Image decode to width×height grayscale pixels (row-major). */
    def pixels(payload: Array[Byte], width: Int, height: Int): Array[Byte]
  }

  /** DETERMINISTIC FAKE decode: stands in for an image/audio codec.
    * Derives a byte histogram and fixed-width feature vector from the
    * payload — reproducible, codec-free, same output shape a real
    * embedding extractor would produce. `pcm` reads the payload as
    * little-endian 16-bit samples. */
  private[graft] object FakeCodec extends MediaCodec {
    override def pixels(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, width * height) // truncate/zero-pad
    override def pcm(payload: Array[Byte]): Array[Short] = {
      val n = payload.length / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        out(i) = ((payload(2 * i) & 0xFF) | (payload(2 * i + 1) << 8)).toShort
        i += 1
      }
      out
    }
    override def features(payload: Array[Byte], dim: Int = 8): MediaFeaturesBody = {
      val hist = new Array[Long](256)
      var i = 0
      var sum = 0L
      while (i < payload.length) { // hot loop: per-partition, no boxing
        hist(payload(i) & 0xFF) += 1
        sum += (payload(i) & 0xFF)
        i += 1
      }
      val n = math.max(payload.length, 1)
      val mean = sum.toDouble / n
      var ent = 0.0
      var j = 0
      while (j < 256) {
        if (hist(j) > 0) {
          val p = hist(j).toDouble / n
          ent -= p * math.log(p) / math.log(2)
        }
        j += 1
      }
      val feats = Array.tabulate(dim) { d =>
        var acc = 0.0
        var k = d
        while (k < 256) { acc += hist(k); k += dim }
        (acc / n).toFloat
      }
      MediaFeaturesBody(payload.length.toLong, mean, ent, feats)
    }
  }
  case class MediaFeaturesBody(nBytes: Long, mean: Double, entropy: Double,
      features: Array[Float])

  /** Synthesize a media table from the documents fixture: utf-8 payload
    * bytes standing in for encoded media, plus typed metadata. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .selectExpr(
        "doc_id as media_id",
        "encode(text, 'utf-8') as payload",
        "case when doc_id % 3 = 0 then 'image' when doc_id % 3 = 1 then 'audio' else 'video' end as media_type",
        "cast(16 + doc_id % 16 as int) as width",
        "cast(16 + doc_id % 8 as int) as height",
        "cast(1 + doc_id % 30 as int) as n_frames")
      .as[MediaRow]
  }

  /** Metadata/bookkeeping scan: oracle-checkable without the codec. */
  def meta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF().select(
      col("media_id"), col("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      (col("width") * col("height")).cast("long").as("n_pixels"),
      col("n_frames").cast("long").as("n_frames"))

  /** Decode + feature extraction via mapPartitions — the partition-at-a-
    * time batch shape that amortizes codec initialization. Swap `codec`
    * for a real [[MediaCodec]] and nothing else changes. */
  def decodeFeatures(spark: SparkSession, dir: String,
      codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      // real pipeline: init native codec state once per partition here
      rows.map { r =>
        val f = codec.features(r.payload)
        MediaFeatures(r.media_id, f.nBytes, f.mean, f.entropy, f.features)
      }
    }
  }

  case class AudioWindow(media_id: Long, window_idx: Long, n_samples: Long,
      rms: Double, peak: Long)

  /** Audio-shaped op: decode the audio rows to 16-bit PCM and compute
    * windowed loudness stats (RMS + peak per fixed window of `win`
    * samples) — the VAD/silence-trim access pattern over a binary
    * column, same `mapPartitions` plumbing as [[decodeFeatures]].
    * Deterministic: per-window accumulation is in sample order. */
  def audioWindows(spark: SparkSession, dir: String, win: Int = 256,
      codec: MediaCodec = FakeCodec): Dataset[AudioWindow] = {
    import spark.implicits._
    mediaTable(spark, dir).filter(col("media_type") === "audio")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val samples = codec.pcm(r.payload)
          samples.grouped(win).zipWithIndex.map { case (w, i) =>
            var sq = 0.0
            var peak = 0L
            var k = 0
            while (k < w.length) {
              val s = w(k).toLong
              sq += s.toDouble * s.toDouble
              if (math.abs(s) > peak) peak = math.abs(s)
              k += 1
            }
            AudioWindow(r.media_id, i.toLong, w.length.toLong,
              math.sqrt(sq / w.length), peak)
          }
        }
      }
  }

  case class AudioBandWindow(media_id: Long, window_idx: Long,
      energy: Long, tp: Long)

  /** Per-window INTEGER audio features off the PCM seam — the exact
    * currency the log-band histogram below needs: energy = Σ v² (a
    * 256-sample window of int16 peaks at ~2.7·10¹¹, inside the
    * [[graft.functions.FixedLog2]] domain) and tp = turning-point count
    * (sign alternations of the first difference — the integer
    * extrema-rate proxy for spectral content that needs no FFT). Both
    * accumulate in sample order; the last partial window keeps its
    * rows. */
  private[graft] def audioBandWindows(spark: SparkSession, dir: String,
      win: Int = 256, codec: MediaCodec = FakeCodec): Dataset[AudioBandWindow] = {
    import spark.implicits._
    mediaTable(spark, dir).filter(col("media_type") === "audio")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val samples = codec.pcm(r.payload)
          samples.grouped(win).zipWithIndex.map { case (w, i) =>
            var e = 0L
            var tp = 0L
            var k = 0
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
            AudioBandWindow(r.media_id, i.toLong, e, tp)
          }
        }
      }
  }

  /** Log-band audio histogram — the log-mel access pattern on the codec
    * seam, FFT-free and hash-exact: every audio window lands in a
    * (turning-point band × log-energy bucket) cell, quarter-octave on
    * the extrema-rate axis and eighth-octave on energy (the
    * `ev_log_histogram` grain), both via the codegen'd `graft_log2fix`
    * integer log2 so the DuckDB oracle replays the identical 20-round
    * HUGEINT chain and the decision hash-matches. The mel analogy is
    * structural, not spectral: log-compressed energy × log-spaced
    * coarse-frequency bands, which is what the downstream curation
    * consumer (silence/noise/music triage) actually keys on.
    *
    * Oracle trick: the oracle rebuilds the PCM stream in SQL —
    * little-endian int16 pairs over the utf-8 payload, character ⇔ byte
    * on the ASCII fixture (the same equivalence `mm_meta`'s
    * strlen-as-n_bytes oracle already gates) — and takes ONE
    * [[graft.functions.FixedLog2.duckLog2]] pass over the DISTINCT
    * union of clamped energies and tp counts, joining back per axis
    * (the chain-budget shape from the Spearman/MI keys).
    *
    * Scale: the grid is hard-bounded (tp < 256 ⇒ ≤ 32 bands; energy <
    * 2⁶¹ ⇒ ≤ 488 buckets) and the aggregate is one partial-agg pass
    * over window rows. Σenergy per cell has ~3·10⁷-window headroom in
    * BIGINT (≈ 4 TB of 16-bit audio per cell); past that the sum moves
    * to DECIMAL(38,0) like the SSB money sums. */
  def audioLogBands(spark: SparkSession, dir: String): DataFrame =
    logBandsFromWindows(audioBandWindows(spark, dir).toDF())

  /** The histogram stage alone, over an [[AudioBandWindow]]-shaped frame
    * — split out so the streaming ingest twin
    * ([[graft.streaming.MediaStream.audioBandWindowStream]]) feeds the
    * byte-identical aggregation the batch key runs. */
  private[graft] def logBandsFromWindows(w0: DataFrame): DataFrame = {
    import graft.functions.FixedLog2
    val w = w0
      .select(col("media_id"), col("energy"), col("tp"),
        greatest(col("energy"), lit(1L)).as("e1"),
        greatest(col("tp"), lit(1L)).as("t1"))
    val l = FixedLog2.withLog2(FixedLog2.withLog2(w, "e1", "l2e"), "t1", "l2t")
    l.select(col("media_id"), col("energy"), col("tp"),
        expr(s"l2t div ${FixedLog2.Unit / 4}").as("tp_band"),
        expr(s"l2e div ${FixedLog2.Unit / 8}").as("energy_bucket"))
      .groupBy(col("tp_band"), col("energy_bucket"))
      .agg(count(lit(1)).as("n_windows"),
        count_distinct(col("media_id")).as("n_media"),
        sum(col("energy")).as("sum_energy"),
        max(col("tp")).as("max_tp"))
      .withColumn("tp_band_log2_lo", col("tp_band").cast("double") / lit(4.0))
      .withColumn("energy_log2_lo", col("energy_bucket").cast("double") / lit(8.0))
      .select(col("tp_band"), col("energy_bucket"), col("tp_band_log2_lo"),
        col("energy_log2_lo"), col("n_windows"), col("n_media"),
        col("sum_energy"), col("max_tp"))
      .orderBy(col("tp_band"), col("energy_bucket"))
  }

  case class ImageTile(media_id: Long, tile_row: Int, tile_col: Int,
      mean_pixel: Double)

  /** Image-shaped op: decode the image rows to grayscale pixels and
    * compute a `grid×grid` tile-mean map — the thumbnail/saliency
    * access pattern (same per-partition codec seam). Tiles partition
    * the pixel rectangle exactly; means accumulate in row-major order
    * (deterministic). */
  def imageTiles(spark: SparkSession, dir: String, grid: Int = 4,
      codec: MediaCodec = FakeCodec): Dataset[ImageTile] =
    imageTilesOf(
      mediaTable(spark, dir).filter(col("media_type") === "image"),
      grid, codec)

  /** Tile means over an arbitrary media dataset — the seam
    * MultimodalCatalystSpec uses to pin tile values on a synthetic
    * image with hand-computable means. */
  private[graft] def imageTilesOf(media: Dataset[MediaRow], grid: Int,
      codec: MediaCodec): Dataset[ImageTile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .flatMap { r =>
        val px = codec.pixels(r.payload, r.width, r.height)
        for {
          tr <- 0 until grid
          tc <- 0 until grid
          y0 = r.height * tr / grid; y1 = r.height * (tr + 1) / grid
          x0 = r.width * tc / grid; x1 = r.width * (tc + 1) / grid
          if y1 > y0 && x1 > x0
        } yield {
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += px(y * r.width + x) & 0xFF; x += 1 }
            y += 1
          }
          ImageTile(r.media_id, tr, tc,
            sum.toDouble / ((y1 - y0) * (x1 - x0)))
        }
      }
  }

  /** Fake "resize": truncate/pad payload to the target pixel budget and
    * rewrite metadata — exercises payload transformation plumbing. */
  def resize(spark: SparkSession, dir: String, w: Int = 8, h: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      rows.map { r =>
        val target = w * h
        val out = java.util.Arrays.copyOf(r.payload, target)
        r.copy(payload = out, width = w, height = h)
      }
    }
  }

  /** Frame sampling: payload split into n_frames equal frames, keep
    * every `stride`-th — the video-curation access pattern. */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 5): Dataset[FrameSample] = {
    import spark.implicits._
    mediaTable(spark, dir).flatMap { r =>
      val frameLen = math.max(r.payload.length / math.max(r.n_frames, 1), 1)
      (0 until r.n_frames by stride).iterator
        .filter(i => i * frameLen < r.payload.length)
        .map { i =>
          val from = i * frameLen
          val until = math.min(from + frameLen, r.payload.length)
          FrameSample(r.media_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
    }
  }

  /** 64-bit dHash perceptual hash per image: decode via the codec seam,
    * average brightness over an 8×9 tile grid, one bit per horizontal
    * gradient (`mean(r, c+1) > mean(r, c)`) — the standard
    * difference-hash. Robust to re-encoding and brightness scaling,
    * which byte digests ([[dedupPayload]]) are blind to. Pure
    * per-partition map over the decoded pixels; integer tile sums, so
    * the hash is deterministic for the correctness gates. */
  private[graft] def phashOf(media: Dataset[MediaRow],
      codec: MediaCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      val px = codec.pixels(r.payload, r.width, r.height)
      // 8 rows x 9 cols of integer-summed tile brightness
      val m = Array.ofDim[Double](8, 9)
      var tr = 0
      while (tr < 8) {
        var tc = 0
        while (tc < 9) {
          val y0 = r.height * tr / 8; val y1 = r.height * (tr + 1) / 8
          val x0 = r.width * tc / 9; val x1 = r.width * (tc + 1) / 9
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += px(y * r.width + x) & 0xFF; x += 1 }
            y += 1
          }
          val area = (y1 - y0).toLong * (x1 - x0)
          m(tr)(tc) = if (area > 0) sum.toDouble / area else 0.0
          tc += 1
        }
        tr += 1
      }
      var hash = 0L
      var b = 0
      while (b < 64) {
        val row = b / 8; val c = b % 8
        if (m(row)(c + 1) > m(row)(c)) hash |= 1L << b
        b += 1
      }
      (r.media_id, hash)
    }.toDF("media_id", "phash")
  }

  /** Perceptual near-dup image pairs at Hamming ≤ 3 via the same 4×16
    * pigeonhole banding as `Dedup.simhashPairs` — lossless at that
    * radius, no all-pairs join; the signature (8 bytes/image) is the
    * only thing that shuffles, never pixels or payloads. The standard
    * second tier after [[dedupPayload]]'s byte-exact pass: catches
    * re-encoded/brightness-shifted copies. Rows-only (codec in the
    * loop); MultimodalCatalystSpec pins hash invariance, perturbation
    * tolerance, and the banded pair set == brute-force Hamming ≤ 3. */
  def phashPairs(spark: SparkSession, dir: String,
      codec: MediaCodec = FakeCodec): DataFrame =
    phashPairsOf(mediaTable(spark, dir).filter(col("media_type") === "image"), codec)

  private[graft] def phashPairsOf(media: Dataset[MediaRow],
      codec: MediaCodec): DataFrame = {
    val banded = phashOf(media, codec)
      .select(col("media_id"), col("phash"), explode(expr(
        (0 until 4).map(b =>
          s"struct($b as band, shiftright(phash, ${b * 16}) & 65535 as bsig)")
          .mkString("array(", ", ", ")"))).as("bb"))
      .select(col("media_id"), col("phash"),
        col("bb.band").as("band"), col("bb.bsig").as("bsig"))
    val a = banded.select(col("media_id").as("media_a"), col("phash").as("ha"),
      col("band"), col("bsig"))
    val b = banded.select(col("media_id").as("media_b"), col("phash").as("hb"),
      col("band"), col("bsig"))
    a.join(b, Seq("band", "bsig"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("media_a"), col("media_b"))
  }

  case class FrameMean(media_id: Long, frame_idx: Int, mean_byte: Double)

  /** Scene-cut detection over the video assets: every frame's mean
    * byte (per-partition typed map over the frame split — decode-side
    * work behind the same seam as [[frameSample]]), then a per-media
    * lag window flags frames whose mean jumps more than `threshold`
    * from the previous frame — the shot-boundary heuristic frame-level
    * curation samples keyframes from. Only (media, frame_idx, mean)
    * triples reach the window: 16 bytes per frame, never frame bytes.
    * Rows-only (codec-side arithmetic); MultimodalCatalystSpec pins a
    * synthetic two-scene video to exactly one cut at the boundary. */
  def sceneCuts(spark: SparkSession, dir: String,
      threshold: Double = 16.0): DataFrame =
    sceneCutsOf(mediaTable(spark, dir).filter(col("media_type") === "video"),
      threshold)

  private[graft] def sceneCutsOf(media: Dataset[MediaRow],
      threshold: Double): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val means = media.flatMap { r =>
      val frameLen = math.max(r.payload.length / math.max(r.n_frames, 1), 1)
      (0 until r.n_frames).iterator
        .filter(i => i * frameLen < r.payload.length)
        .map { i =>
          val from = i * frameLen
          val until = math.min(from + frameLen, r.payload.length)
          var s = 0L
          var j = from
          while (j < until) { s += r.payload(j) & 0xFF; j += 1 }
          FrameMean(r.media_id, i,
            if (until > from) s.toDouble / (until - from) else 0.0)
        }
    }
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    means.toDF()
      .withColumn("prev", lag(col("mean_byte"), 1).over(w))
      .withColumn("is_cut",
        col("prev").isNotNull && abs(col("mean_byte") - col("prev")) > threshold)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames_scanned"),
        sum(when(col("is_cut"), 1L).otherwise(0L)).as("n_cuts"),
        min(when(col("is_cut"), col("frame_idx"))).cast("long").as("first_cut_idx"))
      .orderBy(col("media_id"))
  }

  case class FrameSum(media_id: Long, frame_idx: Long, fsum: Long, flen: Long)

  /** Per-frame integer byte sums over the same frame split as
    * [[frameSample]]/[[sceneCutsOf]] — the 24-byte-per-frame currency
    * the integer scene segmentation below consumes; frame bytes never
    * leave the decode partition. */
  private[graft] def frameSumsOf(media: Dataset[MediaRow]): Dataset[FrameSum] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val frameLen = math.max(r.payload.length / math.max(r.n_frames, 1), 1)
      (0 until r.n_frames).iterator
        .filter(i => i * frameLen < r.payload.length)
        .map { i =>
          val from = i * frameLen
          val until = math.min(from + frameLen, r.payload.length)
          var s = 0L
          var j = from
          while (j < until) { s += r.payload(j) & 0xFF; j += 1 }
          FrameSum(r.media_id, i.toLong, s, (until - from).toLong)
        }
    }
  }

  /** Quantized cut threshold: mean-byte jumps are compared at ×256
    * fixed point, so 4096 ≡ the 16.0 mean-byte jump [[sceneCuts]] uses
    * — but in pure integer arithmetic, which is what lets this key be
    * ORACLE-PAIRED where the double-typed cut report stays rows-only. */
  private val SceneCutQ = 4096L

  /** Scene SEGMENTATION over the video assets — the keyframe-extraction
    * grain: frames between consecutive cuts collapse to one segment row
    * (start frame, length, integer byte mass, quantized-mean range).
    * Cut rule: |mean_q(i) − mean_q(i−1)| > [[SceneCutQ]] with
    * mean_q = (256·Σbytes) div frame_len — integer end to end, so the
    * DuckDB oracle replays the identical frame split (`len div
    * n_frames` floor, short tail dropped like the codec seam does) and
    * byte arithmetic over the ASCII payload and hash-matches. Segment
    * ids are the running cut count — a per-media ordered prefix sum,
    * partitioned by media_id so the window never sees more rows than
    * one asset's frame count. */
  def sceneSegments(spark: SparkSession, dir: String): DataFrame =
    sceneSegmentsOf(mediaTable(spark, dir).filter(col("media_type") === "video"))

  private[graft] def sceneSegmentsOf(media: Dataset[MediaRow]): DataFrame = {
    val fs = frameSumsOf(media).toDF()
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    fs.withColumn("mean_q", expr("fsum * 256 div flen"))
      .withColumn("prev_q", lag(col("mean_q"), 1).over(w))
      .withColumn("is_cut",
        (col("prev_q").isNotNull &&
          abs(col("mean_q") - col("prev_q")) > lit(SceneCutQ)).cast("long"))
      .withColumn("scene_id", sum(col("is_cut")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("media_id"), col("scene_id"))
      .agg(min(col("frame_idx")).as("start_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("fsum")).as("sum_bytes"),
        min(col("mean_q")).as("min_mean_q"),
        max(col("mean_q")).as("max_mean_q"))
      .orderBy(col("media_id"), col("scene_id"))
  }

  /** Exact multimodal dedup, blocking tier + digest tier in one report —
    * the media twin of `dedup_exact`: assets first BLOCK on the cheap
    * (media_type, n_bytes) metadata key (two assets can only be
    * byte-identical if type and size agree — computed from metadata/
    * footers, no payload read), then each candidate block is verified
    * by content digest. Output: one row per multi-asset block with its
    * candidate count, distinct-digest count, and confirmed duplicate
    * count (candidates − distinct digests). The shuffle key is 16 bytes
    * of digest + a few metadata bytes per asset — the payload itself
    * never moves. At 100 TB of media the blocking tier prunes the
    * digest work to size-colliding assets; this is the standard first
    * pass ahead of any perceptual hashing. */
  def dedupPayload(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .select(col("media_id"), col("media_type"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"))
      .groupBy(col("media_type"), col("n_bytes"))
      .agg(count(lit(1)).as("n_candidates"),
        count_distinct(col("digest")).as("n_distinct"),
        min(col("media_id")).as("first_media_id"))
      .filter(col("n_candidates") > 1)
      .select(col("media_type"), col("n_bytes"), col("n_candidates"),
        col("n_distinct"),
        (col("n_candidates") - col("n_distinct")).as("n_dup_assets"),
        col("first_media_id"))
      .orderBy(col("media_type"), col("n_bytes"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_audio_log_bands" -> audioLogBands,
    "mm_dedup_payload" -> dedupPayload,
    "mm_phash_pairs" -> ((s: SparkSession, d: String) => phashPairs(s, d)),
    "mm_scene_cuts" -> ((s: SparkSession, d: String) => sceneCuts(s, d)),
    "mm_scene_segments" -> sceneSegments,
    "mm_meta" -> meta,
    "mm_features" -> ((s: SparkSession, d: String) =>
      decodeFeatures(s, d).toDF()
        .select(col("media_id"), col("n_bytes"), col("mean_byte"), col("byte_entropy"))),
    "mm_frame_stats" -> ((s: SparkSession, d: String) =>
      frameSample(s, d).groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(octet_length(col("frame")).cast("long")).as("sampled_bytes"))),
    "mm_audio_windows" -> ((s: SparkSession, d: String) =>
      audioWindows(s, d).groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_windows"),
          max(col("peak")).as("max_peak"),
          sum(col("n_samples")).as("n_samples"))),
    "mm_image_tiles" -> ((s: SparkSession, d: String) =>
      imageTiles(s, d).groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_tiles"),
          min(col("mean_pixel")).as("darkest_tile"),
          max(col("mean_pixel")).as("brightest_tile"))))

  /** Tile CTE shared by the image oracles: integer tile sums over the
    * zero-padded pixel plane (FakeCodec truncate/zero-pad replayed as a
    * bounds CASE), means as ONE double division — the same single
    * IEEE rounding the engine applies, so double compares downstream
    * are bit-faithful. Parameterized on the grid so the 4×4 tile key
    * and the 8×9 dHash share it. */
  private def dTileMeans(rows: Int, cols: Int): String =
    s"""img AS (SELECT doc_id AS media_id, text,
       |               CAST(strlen(text) AS BIGINT) AS len,
       |               CAST(16 + doc_id % 16 AS BIGINT) AS w,
       |               CAST(16 + doc_id % 8 AS BIGINT) AS h
       |        FROM documents WHERE doc_id % 3 = 0),
       |tiles AS (
       |  SELECT media_id, text, len, w, tr.i AS r2, tc.i AS c2,
       |         h * tr.i // $rows AS y0, h * (tr.i + 1) // $rows AS y1,
       |         w * tc.i // $cols AS x0, w * (tc.i + 1) // $cols AS x1
       |  FROM img, range($rows) tr(i), range($cols) tc(i))""".stripMargin

  override val oracles: Map[String, String] = Map(
    // audioWindows' key aggregate is all-integer (window count, max
    // |sample|, total samples), and the PCM decode is the byte-pair
    // device the log-bands oracle already uses (r17 — was rows-only).
    "mm_audio_windows" ->
      """WITH a AS (SELECT doc_id AS media_id, text, strlen(text) // 2 AS ns
        |           FROM documents WHERE doc_id % 3 = 1),
        |s AS (SELECT media_id, (i - 1) // 256 AS widx,
        |             ord(text[(2*i-1)::BIGINT]) + 256 * ord(text[(2*i)::BIGINT]) AS v
        |      FROM a, LATERAL (SELECT unnest(range(1, ns + 1)) AS i) t),
        |w AS (SELECT media_id, widx, count(*)::BIGINT AS nsamp,
        |             max(abs(v))::BIGINT AS peak
        |      FROM s GROUP BY 1, 2)
        |SELECT media_id, count(*)::BIGINT AS n_windows,
        |       CAST(max(peak) AS BIGINT) AS max_peak,
        |       CAST(SUM(nsamp) AS BIGINT) AS n_samples
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    // imageTiles' means are one integer-sum division each, so min/max
    // tile brightness replays exactly (r17 — was rows-only).
    "mm_image_tiles" ->
      s"""WITH ${dTileMeans(4, 4)},
         |px AS (
         |  SELECT media_id, r2, c2, (y1 - y0) * (x1 - x0) AS area,
         |         CAST(SUM(CASE WHEN y.i * w + x.i + 1 <= len
         |                       THEN ord(text[(y.i * w + x.i + 1)::BIGINT])
         |                       ELSE 0 END) AS BIGINT) AS s
         |  FROM tiles, LATERAL (SELECT unnest(range(y0, y1)) AS i) y,
         |       LATERAL (SELECT unnest(range(x0, x1)) AS i) x
         |  WHERE y1 > y0 AND x1 > x0
         |  GROUP BY media_id, r2, c2, area)
         |SELECT media_id, count(*)::BIGINT AS n_tiles,
         |       min(s::DOUBLE / area) AS darkest_tile,
         |       max(s::DOUBLE / area) AS brightest_tile
         |FROM px GROUP BY 1 ORDER BY 1""".stripMargin,
    // sceneCuts shares the scene-segments frame machinery but compares
    // DOUBLE frame means at the 16.0 threshold — single-division means
    // make the compare bit-faithful (r17 — was rows-only).
    "mm_scene_cuts" ->
      """WITH v AS (SELECT doc_id AS media_id, text,
        |                  CAST(strlen(text) AS BIGINT) AS len,
        |                  CAST(1 + doc_id % 30 AS BIGINT) AS nf
        |           FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT media_id, text, len, GREATEST(len // nf, 1) AS fl, i AS fi
        |      FROM v, unnest(generate_series(0, nf - 1)) AS u(i)
        |      WHERE i * GREATEST(len // nf, 1) < len),
        |b AS (SELECT media_id, fi, CAST(SUM(ord(text[j])) AS BIGINT) AS fsum,
        |             CAST(COUNT(*) AS BIGINT) AS flen
        |      FROM f, unnest(generate_series(fl * fi + 1,
        |                                     LEAST(fl * (fi + 1), len))) AS w(j)
        |      GROUP BY media_id, fi),
        |m AS (SELECT media_id, fi, fsum::DOUBLE / flen AS mb,
        |             LAG(fsum::DOUBLE / flen) OVER
        |               (PARTITION BY media_id ORDER BY fi) AS prev
        |      FROM b)
        |SELECT media_id, count(*)::BIGINT AS n_frames_scanned,
        |       CAST(SUM(CASE WHEN prev IS NOT NULL AND abs(mb - prev) > 16.0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
        |       CAST(MIN(CASE WHEN prev IS NOT NULL AND abs(mb - prev) > 16.0
        |                     THEN fi END) AS BIGINT) AS first_cut_idx
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    // dHash: 8×9 tile means (same single-division fidelity), one bit
    // per horizontal gradient, banding + Hamming in plain SQL — the
    // dedup_simhash_pairs device without the hash CTE (r17).
    "mm_phash_pairs" ->
      s"""WITH ${dTileMeans(8, 9)},
         |px AS (
         |  SELECT t.media_id, t.r2, t.c2,
         |         CASE WHEN (y1 - y0) * (x1 - x0) > 0
         |              THEN (SELECT CAST(SUM(CASE WHEN y.i * w + x.i + 1 <= len
         |                          THEN ord(text[(y.i * w + x.i + 1)::BIGINT])
         |                          ELSE 0 END) AS BIGINT)
         |                    FROM (SELECT unnest(range(t.y0, t.y1)) AS i) y,
         |                         (SELECT unnest(range(t.x0, t.x1)) AS i) x)::DOUBLE
         |                   / ((y1 - y0) * (x1 - x0))
         |              ELSE 0.0 END AS mean
         |  FROM tiles t),
         |ph AS (
         |  SELECT cur.media_id,
         |         CAST(SUM(CASE WHEN nxt.mean > cur.mean
         |                       THEN (1::UBIGINT << (cur.r2 * 8 + cur.c2)::INTEGER)::HUGEINT
         |                       ELSE 0::HUGEINT END) AS HUGEINT) AS s
         |  FROM px cur JOIN px nxt ON nxt.media_id = cur.media_id
         |                         AND nxt.r2 = cur.r2 AND nxt.c2 = cur.c2 + 1
         |  WHERE cur.c2 <= 7
         |  GROUP BY 1),
         |banded AS (
         |  SELECT media_id, s::UBIGINT AS hu, b.band,
         |         ((s::UBIGINT >> (b.band * 16)::INTEGER) & 65535) AS bsig
         |  FROM ph CROSS JOIN (SELECT unnest(range(4)) AS band) b),
         |pairs AS (
         |  SELECT DISTINCT a.media_id AS media_a, b2.media_id AS media_b,
         |         a.hu AS ha, b2.hu AS hb
         |  FROM banded a JOIN banded b2
         |    ON a.band = b2.band AND a.bsig = b2.bsig AND a.media_id < b2.media_id)
         |SELECT media_a, media_b, bit_count(xor(ha, hb))::BIGINT AS hamming
         |FROM pairs WHERE bit_count(xor(ha, hb)) <= 3
         |ORDER BY media_a, media_b""".stripMargin,
    // frameSample's arithmetic (frame length, stride-5 sampling, tail
    // truncation) replayed in closed-form integer SQL over the same
    // synthesized media table (r17 — was rows-only): every quantity is
    // a pure function of (byte length, n_frames), so the flatMap needs
    // no fold to replay, just the lateral stride range.
    "mm_frame_stats" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id,
        |         CAST(strlen(text) AS BIGINT) AS len,
        |         CAST(1 + doc_id % 30 AS BIGINT) AS nf
        |  FROM documents),
        |fl AS (SELECT media_id, len, nf,
        |              GREATEST(len // GREATEST(nf, 1), 1) AS flen
        |       FROM media),
        |frames AS (
        |  SELECT media_id, flen, len, i
        |  FROM fl, LATERAL (SELECT unnest(range(0, nf, 5)) AS i) r
        |  WHERE i * flen < len)
        |SELECT media_id, count(*)::BIGINT AS n_sampled,
        |       CAST(SUM(LEAST(flen, len - i * flen)) AS BIGINT) AS sampled_bytes
        |FROM frames GROUP BY 1 ORDER BY 1""".stripMargin,
    "mm_scene_segments" ->
      s"""WITH v AS (SELECT doc_id AS media_id, text,
         |                  CAST(strlen(text) AS BIGINT) AS len,
         |                  CAST(1 + doc_id % 30 AS BIGINT) AS nf
         |           FROM documents WHERE doc_id % 3 = 2),
         |f AS (SELECT media_id, text, len, GREATEST(len // nf, 1) AS fl, i AS fi
         |      FROM v, unnest(generate_series(0, nf - 1)) AS u(i)
         |      WHERE i * GREATEST(len // nf, 1) < len),
         |b AS (SELECT media_id, fi,
         |             CAST(SUM(ord(text[j])) AS BIGINT) AS fsum,
         |             CAST(COUNT(*) AS BIGINT) AS flen
         |      FROM f, unnest(generate_series(fl * fi + 1, LEAST(fl * (fi + 1), len))) AS w(j)
         |      GROUP BY media_id, fi),
         |q AS (SELECT media_id, fi, fsum, (fsum * 256) // flen AS mean_q,
         |             LAG((fsum * 256) // flen) OVER
         |               (PARTITION BY media_id ORDER BY fi) AS prev_q
         |      FROM b),
         |c AS (SELECT media_id, fi, fsum, mean_q,
         |             CASE WHEN prev_q IS NOT NULL
         |                   AND ABS(mean_q - prev_q) > 4096 THEN 1 ELSE 0 END AS is_cut
         |      FROM q),
         |s AS (SELECT media_id, fi, fsum, mean_q,
         |             SUM(is_cut) OVER (PARTITION BY media_id ORDER BY fi) AS scene_id
         |      FROM c)
         |SELECT media_id, CAST(scene_id AS BIGINT) AS scene_id,
         |       CAST(MIN(fi) AS BIGINT) AS start_frame,
         |       CAST(COUNT(*) AS BIGINT) AS n_frames,
         |       CAST(SUM(fsum) AS BIGINT) AS sum_bytes,
         |       CAST(MIN(mean_q) AS BIGINT) AS min_mean_q,
         |       CAST(MAX(mean_q) AS BIGINT) AS max_mean_q
         |FROM s GROUP BY media_id, scene_id
         |ORDER BY media_id, scene_id""".stripMargin,
    "mm_audio_log_bands" -> {
      import graft.functions.FixedLog2.duckLog2
      s"""WITH a AS (SELECT doc_id AS media_id, text FROM documents
         |           WHERE doc_id % 3 = 1),
         |s AS (SELECT media_id, i - 1 AS si,
         |        ord(text[2*i-1]) + 256 * ord(text[2*i]) AS raw
         |      FROM a, unnest(generate_series(1, strlen(text) // 2)) AS t(i)),
         |vv AS (SELECT media_id, si,
         |        CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
         |       FROM s),
         |t AS (SELECT media_id, si // 256 AS w, si % 256 AS p, v,
         |        LAG(v, 1) OVER (PARTITION BY media_id, si // 256
         |                        ORDER BY si) AS v1,
         |        LAG(v, 2) OVER (PARTITION BY media_id, si // 256
         |                        ORDER BY si) AS v2
         |      FROM vv),
         |ws AS (SELECT media_id, w,
         |        CAST(SUM(v::BIGINT * v::BIGINT) AS BIGINT) AS energy,
         |        CAST(SUM(CASE WHEN p >= 2
         |                       AND (v1 - v2)::BIGINT * (v - v1)::BIGINT < 0
         |                      THEN 1 ELSE 0 END) AS BIGINT) AS tp
         |       FROM t GROUP BY 1, 2),
         |u AS (SELECT DISTINCT GREATEST(energy, 1) AS x FROM ws
         |      UNION SELECT DISTINCT GREATEST(tp, 1) FROM ws),
         |l AS (${duckLog2("SELECT x FROM u", "x", "l2x")}),
         |b AS (SELECT ws.media_id, ws.energy, ws.tp,
         |        lt.l2x // ${graft.functions.FixedLog2.Unit / 4} AS tp_band,
         |        le.l2x // ${graft.functions.FixedLog2.Unit / 8} AS energy_bucket
         |      FROM ws JOIN l le ON le.x = GREATEST(ws.energy, 1)
         |              JOIN l lt ON lt.x = GREATEST(ws.tp, 1))
         |SELECT tp_band, energy_bucket,
         |  CAST(tp_band AS DOUBLE) / 4.0 AS tp_band_log2_lo,
         |  CAST(energy_bucket AS DOUBLE) / 8.0 AS energy_log2_lo,
         |  CAST(COUNT(*) AS BIGINT) AS n_windows,
         |  CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
         |  CAST(SUM(energy) AS BIGINT) AS sum_energy,
         |  MAX(tp) AS max_tp
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "mm_dedup_payload" ->
      """WITH a AS (
        |  SELECT doc_id AS media_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
        |           AS media_type,
        |         CAST(strlen(text) AS BIGINT) AS n_bytes,
        |         md5(text) AS digest
        |  FROM documents)
        |SELECT media_type, n_bytes, COUNT(*) AS n_candidates,
        |       COUNT(DISTINCT digest) AS n_distinct,
        |       COUNT(*) - COUNT(DISTINCT digest) AS n_dup_assets,
        |       MIN(media_id) AS first_media_id
        |FROM a GROUP BY 1, 2 HAVING COUNT(*) > 1
        |ORDER BY media_type, n_bytes""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  (16 + doc_id % 16) * (16 + doc_id % 8) AS n_pixels,
        |  1 + doc_id % 30 AS n_frames
        |FROM documents""".stripMargin)
}
