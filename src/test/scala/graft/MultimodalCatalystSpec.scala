package graft

import graft.functions.DotProductFloat
import graft.operators.{Multimodal, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalCatalystSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media pipeline: decode features are deterministic and shaped right") {
    val f1 = Multimodal.decodeFeatures(spark, TestSpark.Sf).collect()
      .map(f => f.media_id -> (f.n_bytes, f.mean_byte, f.byte_entropy, f.features.toSeq)).toMap
    val f2 = Multimodal.decodeFeatures(spark, TestSpark.Sf).collect()
      .map(f => f.media_id -> (f.n_bytes, f.mean_byte, f.byte_entropy, f.features.toSeq)).toMap
    assert(f1 == f2, "fake decode must be deterministic")
    assert(f1.nonEmpty)
    f1.values.foreach { case (n, mean, ent, feats) =>
      assert(feats.length == 8)
      assert(n > 0 && mean > 0 && ent > 0)
      // histogram buckets are a partition of bytes: fractions sum to 1
      assert(math.abs(feats.map(_.toDouble).sum - 1.0) < 1e-5)
    }
  }

  test("resize rewrites payload to the pixel budget, preserving ids") {
    val r = Multimodal.resize(spark, TestSpark.Sf, 8, 8).collect()
    assert(r.nonEmpty)
    r.foreach { m =>
      assert(m.payload.length == 64 && m.width == 8 && m.height == 8)
    }
    val orig = Multimodal.mediaTable(spark, TestSpark.Sf).select("media_id")
      .as[Long].collect().toSet
    assert(r.map(_.media_id).toSet == orig)
  }

  test("image tiles: means pinned on a synthetic gradient image") {
    import Multimodal.MediaRow
    // 8×8 image, pixel value = row-major index (0..63). Under grid=4
    // each tile is a 2×2 block at (y0=2·tr, x0=2·tc); its mean is
    // (p + p+1 + p+8 + p+9)/4 = p + 4.5 with p = 8·y0 + x0, i.e.
    // 16·tr + 2·tc + 4.5 — hand-computable closed form.
    val gradient = Array.tabulate[Byte](64)(_.toByte)
    // constant 0xFF image: every tile mean must be 255.0 exactly —
    // catches a signed-byte slip (byte -1 must read as 255).
    val white = Array.fill[Byte](64)(-1)
    val media = spark.createDataset(Seq(
      MediaRow(1L, gradient, "image", 8, 8, 1),
      MediaRow(2L, white, "image", 8, 8, 1)))
    val tiles = Multimodal.imageTilesOf(media, 4, Multimodal.FakeCodec)
      .collect().map(t => (t.media_id, t.tile_row, t.tile_col) -> t.mean_pixel)
      .toMap
    assert(tiles.size == 32, "two 8×8 images × 16 tiles each")
    for (tr <- 0 until 4; tc <- 0 until 4) {
      assert(tiles((1L, tr, tc)) == 16.0 * tr + 2.0 * tc + 4.5, s"gradient ($tr,$tc)")
      assert(tiles((2L, tr, tc)) == 255.0, s"white ($tr,$tc)")
    }
  }

  test("image tiles: fixture run matches a driver-side replication exactly") {
    // replicates imageTiles' arithmetic in plain Scala over the same
    // fixture rows — pins the distributed path (mm_image_tiles' source)
    // value-exact, including the ragged tile-drop rule.
    val rows = Multimodal.mediaTable(spark, TestSpark.Sf)
      .filter($"media_type" === "image").collect()
    assert(rows.nonEmpty)
    val grid = 4
    val expected = rows.flatMap { r =>
      val px = Multimodal.FakeCodec.pixels(r.payload, r.width, r.height)
      for {
        tr <- 0 until grid; tc <- 0 until grid
        y0 = r.height * tr / grid; y1 = r.height * (tr + 1) / grid
        x0 = r.width * tc / grid; x1 = r.width * (tc + 1) / grid
        if y1 > y0 && x1 > x0
      } yield {
        val sum = (y0 until y1).flatMap(y => (x0 until x1)
          .map(x => (px(y * r.width + x) & 0xFF).toLong)).sum
        (r.media_id, tr, tc) -> sum.toDouble / ((y1 - y0) * (x1 - x0))
      }
    }.toMap
    val got = Multimodal.imageTiles(spark, TestSpark.Sf).collect()
      .map(t => (t.media_id, t.tile_row, t.tile_col) -> t.mean_pixel).toMap
    assert(got == expected)
  }

  test("phash: invariant to exact copies, tolerant to a local edit, banded == brute") {
    import Multimodal.MediaRow
    // 18×16 images (tiles all non-empty): a base pattern, an exact copy,
    // a copy with ONE pixel nudged (flips at most a couple of gradient
    // bits around one tile), and an unrelated pattern
    val w = 18; val h = 16
    val base = Array.tabulate[Byte](w * h)(i => ((i * 7) % 251).toByte)
    val copy = base.clone()
    val nudged = base.clone(); nudged(5 * w + 5) = (nudged(5 * w + 5) + 120).toByte
    val other = Array.tabulate[Byte](w * h)(i => (((i % w) * 200 / w) ^ (i / w * 13)).toByte)
    val media = spark.createDataset(Seq(
      MediaRow(1L, base, "image", w, h, 1),
      MediaRow(2L, copy, "image", w, h, 1),
      MediaRow(3L, nudged, "image", w, h, 1),
      MediaRow(4L, other, "image", w, h, 1)))
    val hashes = Multimodal.phashOf(media, Multimodal.FakeCodec)
      .as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(2L), "exact copy must hash identically")
    val dNudge = java.lang.Long.bitCount(hashes(1L) ^ hashes(3L))
    val dOther = java.lang.Long.bitCount(hashes(1L) ^ hashes(4L))
    assert(dNudge <= 3, s"single-pixel edit moved $dNudge bits")
    assert(dOther > 3, s"unrelated image within radius ($dOther bits)")
    // banded pair set equals the brute-force Hamming <= 3 set
    val got = Multimodal.phashPairsOf(media, Multimodal.FakeCodec)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    val ids = hashes.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 3
    } yield (a, b)).toSet
    assert(want.contains((1L, 2L)) && want.contains((1L, 3L)))
    assert(got == want, s"missed=${want -- got} extra=${got -- want}")
  }

  test("scene cuts: two-scene synthetic video yields exactly one boundary cut") {
    import Multimodal.MediaRow
    // 8 frames of 16 bytes: frames 0-3 constant 0x10, frames 4-7
    // constant 0xF0 → one jump of 224 at frame 4; and a flat video
    val twoScene = (Array.fill(64)(0x10.toByte) ++ Array.fill(64)(0xF0.toByte))
    val flat = Array.fill(128)(0x40.toByte)
    val media = spark.createDataset(Seq(
      MediaRow(1L, twoScene, "video", 0, 0, 8),
      MediaRow(2L, flat, "video", 0, 0, 8)))
    val got = Multimodal.sceneCutsOf(media, threshold = 16.0)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((8L, 1L, Some(4L))), got.toString)
    assert(got(2L) == ((8L, 0L, None)), got.toString)
  }

  test("scene segments: planted cuts yield exact integer segment rows") {
    import Multimodal.MediaRow
    // three scenes of 3/2/3 frames (16 bytes each): 0x10, 0xF0, 0x10 —
    // two cuts (frames 3 and 5) → segments [0,3), [3,5), [5,8); plus a
    // flat video (one segment) and a 17-frame manifest over 32 bytes
    // (frameLen = max(32/17, 1) = 1 → 17 one-byte frames, the tail 15
    // bytes dropped exactly as the codec-seam frame split drops them)
    val threeScene = Array.fill(48)(0x10.toByte) ++
      Array.fill(32)(0xF0.toByte) ++ Array.fill(48)(0x10.toByte)
    val flat = Array.fill(128)(0x40.toByte)
    val tiny = Array.fill(32)(0x20.toByte)
    val media = spark.createDataset(Seq(
      MediaRow(1L, threeScene, "video", 0, 0, 8),
      MediaRow(2L, flat, "video", 0, 0, 8),
      MediaRow(3L, tiny, "video", 0, 0, 17)))
    val got = Multimodal.sceneSegmentsOf(media)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // mean_q: 0x10*256 = 4096, 0xF0*256 = 61440; sum per 16-byte frame
    val q1 = 0x10L * 256; val q2 = 0xF0L * 256
    val f1 = 0x10L * 16; val f2 = 0xF0L * 16
    assert(got.filter(_._1 == 1L) == Set(
      (1L, 0L, 0L, 3L, 3 * f1, q1, q1),
      (1L, 1L, 3L, 2L, 2 * f2, q2, q2),
      (1L, 2L, 5L, 3L, 3 * f1, q1, q1)), got.toString)
    assert(got.filter(_._1 == 2L) ==
      Set((2L, 0L, 0L, 8L, 8 * 0x40L * 16, 0x40L * 256, 0x40L * 256)))
    // 17 one-byte frames, all same byte → one segment spanning all 17
    assert(got.filter(_._1 == 3L) ==
      Set((3L, 0L, 0L, 17L, 17L * 0x20L, 0x20L * 256, 0x20L * 256)))
  }

  test("frame sampling: indices follow the stride, bytes within frame bounds") {
    val fs = Multimodal.frameSample(spark, TestSpark.Sf, 5).collect()
    assert(fs.nonEmpty)
    fs.foreach { f =>
      assert(f.frame_idx % 5 == 0)
      assert(f.frame.nonEmpty)
    }
  }

  test("audio windows: PCM round-trip, window accounting, loudness bounds") {
    import graft.operators.Multimodal
    val rows = Multimodal.audioWindows(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    // deterministic across runs
    assert(Multimodal.audioWindows(spark, TestSpark.Sf).collect().toSet == rows.toSet)
    val byMedia = rows.groupBy(_.media_id)
    val nSamples = Multimodal.mediaTable(spark, TestSpark.Sf)
      .filter($"media_type" === "audio").collect()
      .map(r => r.media_id -> r.payload.length / 2).toMap
    byMedia.foreach { case (id, ws) =>
      // windows tile the sample stream: indices 0..k-1, sizes sum to total
      assert(ws.map(_.window_idx).sorted.toSeq == (0L until ws.length).toSeq)
      assert(ws.map(_.n_samples).sum == nSamples(id))
      ws.foreach { w =>
        assert(w.rms >= 0.0 && w.rms <= 32768.0)
        assert(w.peak >= w.rms.floor.toLong, "peak bounds rms from above")
      }
    }
    // fake codec PCM: little-endian 16-bit invertibility on a known case
    val pcm = Multimodal.FakeCodec.pcm(Array[Byte](0x01, 0x02, -1, 0x7F))
    assert(pcm.toSeq == Seq[Short](0x0201, 0x7FFF))
  }

  test("audio log bands: hand-built waveform pins energy/turning points; fixture reconciles") {
    import graft.operators.Multimodal
    // triangle wave period 4: samples 0, 100, 25600, 100, ... — the
    // first difference alternates sign every second position, so every
    // other interior sample is a turning point. Sample values are
    // chosen so BOTH little-endian bytes stay < 0x80: the media table
    // synthesizes payloads via encode(text, 'utf-8'), which is the
    // identity only on ASCII bytes. Hand replay below is an independent
    // reimplementation (no window grouping shortcuts).
    val wave = Array.tabulate(600)(i => (i % 4 match {
      case 0 => 0; case 1 => 100; case 2 => 25600; case 3 => 100
    }).toShort)
    val payload = new Array[Byte](wave.length * 2)
    wave.zipWithIndex.foreach { case (s, i) =>
      payload(2 * i) = (s & 0xFF).toByte
      payload(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    assert(payload.forall(b => b >= 0), "crafted bytes must be ASCII")
    assert(Multimodal.FakeCodec.pcm(payload).toSeq == wave.toSeq)
    // expected per 256-window: hand union-free replay
    val expect = wave.grouped(256).zipWithIndex.map { case (w, i) =>
      val e = w.map(v => v.toLong * v.toLong).sum
      val tp = (2 until w.length).count { k =>
        (w(k - 1) - w(k - 2)).toLong * (w(k) - w(k - 1)).toLong < 0
      }.toLong
      (i.toLong, e, tp)
    }.toSeq
    // pin the operator end to end (documents → mediaTable → pcm →
    // windows) by writing the wave as a 1-doc fixture; doc_id 1 lands
    // on the audio branch of the media-type assignment
    val dir = java.nio.file.Files.createTempDirectory("graft-audio").toString
    Seq((1L, new String(payload, java.nio.charset.StandardCharsets.US_ASCII)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.audioBandWindows(spark, dir).collect()
      .map(r => (r.window_idx, r.energy, r.tp)).sortBy(_._1).toSeq
    assert(got == expect, s"got $got expect $expect")
    // fixture-level reconciliation: the histogram's window count equals
    // the window table's row count, per-cell maxima within bounds
    val hist = Multimodal.audioLogBands(spark, TestSpark.Sf).collect()
    val windows = Multimodal.audioBandWindows(spark, TestSpark.Sf).collect()
    assert(hist.map(_.getAs[Long]("n_windows")).sum == windows.length)
    assert(hist.forall(r => r.getAs[Long]("max_tp") < 256))
    assert(hist.forall(r => r.getAs[Long]("n_media") <= r.getAs[Long]("n_windows")))
  }

  test("graft_dot codegen expression equals the HOF fold bit-for-bit") {
    DotProductFloat.register(spark)
    val e = graft.sources.Tables.embeddings(spark, TestSpark.Sf).limit(100)
    val both = e.select(
      expr("graft_dot(embedding, embedding)").as("native"),
      graft.functions.VectorOps.dotHof("embedding", "embedding").as("hof"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
  }

  test("graft_dot interpreted (non-codegen) path equals codegen path") {
    DotProductFloat.register(spark)
    val e = graft.sources.Tables.embeddings(spark, TestSpark.Sf).limit(20)
    val cg = e.select(expr("graft_dot(embedding, embedding)")).as[Double].collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = e.select(expr("graft_dot(embedding, embedding)")).as[Double].collect()
      assert(cg.toSeq == interp.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("graft_dot rejects wrong input types at analysis") {
    DotProductFloat.register(spark)
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(expr("graft_dot(a, b)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_dot"))
  }

  test("codegen top-k equals HOF top-k end to end") {
    val a = Similarity.topKBruteForce(spark, TestSpark.Sf)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    val b = Similarity.topKCodegen(spark, TestSpark.Sf)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("payload dedup blocking: counts consistent, dups confirmed by digest") {
    val rows = graft.operators.Multimodal.dedupPayload(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty, "the fixture has size-colliding assets")
    rows.foreach { r =>
      val cand = r.getAs[Long]("n_candidates")
      val dist = r.getAs[Long]("n_distinct")
      assert(cand > 1 && dist >= 1 && dist <= cand)
      assert(r.getAs[Long]("n_dup_assets") == cand - dist)
    }
    // confirmed duplicate total must equal the corpus-wide exact-dup count
    // (blocking is lossless for byte-identical payloads: equal bytes =>
    // equal (type-independent) size => same block when type also matches)
    val media = graft.operators.Multimodal.mediaTable(spark, TestSpark.Sf).toDF()
    val totalDups = media.count() -
      media.selectExpr("media_type", "md5(payload) as d").distinct().count()
    assert(rows.map(_.getAs[Long]("n_dup_assets")).sum == totalDups)
  }
}
