package graft

import graft.operators.{Curation, Dedup, Events, Pipeline, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness: every DF-parameterized operator must
  * return an empty/singleton result on empty and single-doc corpora —
  * never throw. At 100 TB empty partitions and single-row groups are
  * routine (a filter that matches nothing, a day with no events), and
  * an operator that divides by a zero count or windows over an empty
  * frame fails exactly there. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")

  private def oneDoc: DataFrame =
    Seq((1L, "solo document with just enough tokens to shingle")).toDF("doc_id", "text")

  private def shortDocs: DataFrame =
    // 1- and 2-token docs, including an identical duplicate pair: below
    // the 3-token shingle width, so shingle arrays must be EMPTY (not a
    // slice() crash from Spark's descending sequence(1, 0))
    Seq((1L, "lone"), (2L, "two tokens"), (3L, "two tokens"), (4L, ""))
      .toDF("doc_id", "text")

  test("dedup operators: empty and single-doc corpora yield no pairs, no errors") {
    for (docs <- Seq(emptyDocs, oneDoc)) {
      assert(Dedup.ngramJaccardOf(Dedup.hashedShinglesOf(docs)).count() == 0)
      assert(Dedup.containmentOf(Dedup.hashedShinglesOf(docs)).count() == 0)
      assert(Dedup.simhashOf(docs).count() == docs.count())
      assert(Pipeline.ngramNoveltyOf(docs).count() == docs.count())
    }
  }

  test("containment and novelty on sub-shingle-width docs: empty, no errors") {
    assert(Dedup.containmentOf(Dedup.hashedShinglesOf(shortDocs)).count() == 0)
    // < 5 tokens ⇒ no 5-grams ⇒ excluded rather than divide-by-zero
    assert(Pipeline.ngramNoveltyOf(shortDocs).count() == 0)
  }

  test("containment df cap: boilerplate-degenerate corpus bounded, healthy corpus no-op") {
    import spark.implicits._
    // 2000 docs sharing one boilerplate sentence (every shingle df=2000)
    // plus a genuine sub-document pair with rare shingles: under the cap
    // the quadratic boilerplate join never materializes but the real
    // containment survives via its rare prefix shingles
    val boiler = "the quick brown fox jumps over the lazy dog again"
    val rare = (1 to 12).map(i => s"rare$i").mkString(" ")
    val docs = ((1L to 2000L).map(i => (i, boiler)) ++
      Seq((3001L, rare), (3002L, rare + " trailing tail tokens here")))
      .toDF("doc_id", "text")
    val got = Dedup.containmentOf(Dedup.hashedShinglesOf(docs), dfCap = 100)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((3001L, 3002L)), s"rare containment lost: $got")
    assert(got.forall { case (a, b) => a >= 3001L && b >= 3001L },
      "boilerplate-only pairs must be dropped by the cap")
    // healthy fixture: the production cap changes nothing
    val sh = Dedup.hashedShinglesOf(
      graft.sources.Tables.documents(spark, TestSpark.Sf))
    val capped = Dedup.containmentOf(sh, Dedup.ContainDfCap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.containmentOf(sh)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == uncapped, "cap must be a no-op on the healthy corpus")
  }

  test("minhash LSH hot-bucket guard: 10k identical docs complete, buckets reported") {
    // every doc has the same signature, so all 10k land in ONE bucket
    // per band — unguarded, the in-bucket expansion would build 8
    // arrays of ~50M pair structs (~1.2 GB each) as single task values.
    // With the cap the query completes, refuses those buckets, and the
    // telemetry names them.
    val docs = spark.range(10000)
      .selectExpr("id as doc_id", "'alpha beta gamma delta' as text")
    assert(Dedup.minhashLshOf(docs, Dedup.HotBucketCap).count() == 0,
      "all candidates live in refused buckets")
    val hot = Dedup.minhashHotBuckets(docs).collect()
      .map(r => r.getAs[Int]("band") -> r.getAs[Long]("n_members"))
    assert(hot.map(_._1).toSeq.sorted == (0 until 8),
      "one hot bucket per band")
    assert(hot.forall(_._2 == 10000L))
  }

  test("minhash LSH hot-bucket guard: cap is a no-op on healthy corpora") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
    def pairs(cap: Int) = Dedup.minhashLshOf(docs, cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val guarded = pairs(Dedup.HotBucketCap)
    assert(guarded.nonEmpty, "fixture should contain planted near-dups")
    assert(guarded == pairs(Int.MaxValue),
      "no fixture bucket reaches the cap, so the pair set must be identical")
    assert(Dedup.minhashHotBuckets(docs).count() == 0)
  }

  test("sub-shingle-width docs: empty shingle sets, no pairs, no slice errors") {
    val sh = Dedup.hashedShinglesOf(shortDocs).collect()
    assert(sh.length == 4)
    assert(sh.forall(r => r.getSeq[Long](1).isEmpty),
      "docs under 3 tokens have no 3-shingles")
    // identical 2-token duplicates are exact-dups (md5 path) but NOT
    // shingle-connected — near-dup semantics start at shingle width
    assert(Dedup.ngramJaccardOf(Dedup.hashedShinglesOf(shortDocs)).count() == 0)
    // split('', ' ') yields [""] — one empty token — so even the empty
    // doc gets a (degenerate) simhash signature
    assert(Dedup.simhashOf(shortDocs).count() == 4)
    assert(Pipeline.decontaminateOf(shortDocs).count() == 0)
  }

  test("decontamination: empty and single-doc corpora yield no flags") {
    for (docs <- Seq(emptyDocs, oneDoc)) {
      assert(Pipeline.decontaminateOf(docs).count() == 0)
      assert(Pipeline.decontaminateHashedOf(docs, dfCap = 1000).count() == 0)
    }
  }

  test("stratified sampling on empty input is empty, not an error") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(Pipeline.stratifiedSampleOf(docs).count() == 0)
  }

  test("int8 quantization handles empty input and empty vectors") {
    val none = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Pipeline.quantizeInt8Of(none).count() == 0)
    // a zero-length embedding: scale is NULL (array_max of empty), errors NULL
    val hollow = Seq((1L, Array.empty[Float])).toDF("vec_id", "embedding")
    val r = Pipeline.quantizeInt8Of(hollow).collect()(0)
    assert(r.isNullAt(1), "empty vector must have NULL scale")
  }

  test("connected components: no edges, self-edges-only, and empty graphs") {
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    val noEdges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val own = Curation.componentsOf(nodes, noEdges).as[(Long, Long)].collect().toMap
    assert(own == Map(1L -> 1L, 2L -> 2L, 3L -> 3L),
      "isolated nodes label themselves")
    val emptyNodes = Seq.empty[Long].toDF("doc_id")
    assert(Curation.componentsOf(emptyNodes, noEdges).count() == 0)
  }

  test("LPA communities: empty graph, single edge, self-loop-free ring") {
    val none = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(Curation.communitiesOf(none).count() == 0)
    val one = Curation.communitiesOf(Seq((1L, 2L)).toDF("u", "v"))
      .as[(Long, Long)].collect().toSeq
    // one edge: the classic synchronous-LPA oscillation (labels swap
    // every round, never converge) — the even round budget lands each
    // node back on its own label, two singleton communities. The cap
    // makes this BOUNDED, and determinism holds throughout.
    assert(one == Seq((1L, 1L), (2L, 1L)), s"got $one")
  }

  test("kcore: empty graph and single edge complete without error") {
    val none = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(Curation.kcoreOf(none).count() == 0)
    // k = floor(median(1) * 3/5) = 0: the whole (trivial) graph survives
    val two = Curation.kcoreOf(Seq((1L, 2L)).toDF("u", "v")).count()
    assert(two == 2)
  }

  test("KMV overlap: empty input and single-type input yield no pairs") {
    val none = Seq.empty[(String, Long)].toDF("event_type", "user_id")
    assert(Events.kmvOverlapOf(none, 64).count() == 0)
    val solo = Seq.tabulate(50)(i => ("only", i.toLong))
      .toDF("event_type", "user_id")
    assert(Events.kmvOverlapOf(solo, 64).count() == 0, "no unordered pairs")
  }

  test("BPE trainer: empty corpus and single-char vocab stop cleanly") {
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.bpeMergesOf(spark, none, 5).count() == 0)
    // only 1-char words: no adjacent pairs anywhere -> zero merges
    val chars = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeMergesOf(spark, chars, 5).count() == 0)
  }

  /** (event_id, epoch-second, user_id, type, value) → events frame. */
  private def evFrame(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame =
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_seconds(sec)"))
      .drop("sec")

  private def emptyEv: DataFrame = evFrame(Seq.empty)

  test("interval/series aggregates: empty events yield empty results, no errors") {
    assert(Events.intervalUnionOf(emptyEv).count() == 0)
    assert(Events.deltaSumOf(emptyEv).count() == 0)
    assert(Events.emaOf(emptyEv).count() == 0)
    assert(Events.momentsOf(emptyEv).count() == 0)
    assert(Events.linregOf(emptyEv).count() == 0)
    val noSessions = Seq.empty[(Long, Long, Long)]
      .toDF("user_id", "start_us", "end_us")
    assert(Events.maxConcurrencyOf(noSessions).count() == 0)
  }

  test("momentsOf: constant series guards skew/kurt to NULL (m2 = 0)") {
    val const = evFrame((1L to 10L).map(i => (i, i * 60, 1L, "view", 7.0)))
    val r = Events.momentsOf(const)
      .select("n", "mean_value", "skewness", "kurtosis").collect()
    assert(r.length == 1 && r(0).getLong(0) == 10L)
    assert(r(0).getDouble(1) == 7.0)
    assert(r(0).isNullAt(2) && r(0).isNullAt(3))
  }

  test("linreg/deltaSum: single-day series degrade to NULL slope and zero deltas") {
    val oneDay = evFrame(Seq((1L, 100L, 1L, "view", 5.0), (2L, 200L, 2L, "view", 7.0)))
    val lr = Events.linregOf(oneDay).collect()
    assert(lr.length == 1 && lr(0).getLong(1) == 1L) // n_days
    assert(lr(0).isNullAt(2) && lr(0).isNullAt(3) && lr(0).isNullAt(4))
    val ds = Events.deltaSumOf(oneDay)
      .select("n_days", "delta_sum", "rate_per_day").collect()
    assert(ds(0).getLong(0) == 1L && ds(0).getDouble(1) == 0.0 && ds(0).isNullAt(2))
  }

  test("intervalUnionOf: touching windows merge, gapped windows split") {
    // second event starts exactly at the first window's end (300 s):
    // touching ⇒ one island of 600 s; third starts 301 s later ⇒ split
    val ev = evFrame(Seq(
      (1L, 0L, 1L, "view", 0.0), (2L, 300L, 1L, "view", 0.0),
      (3L, 901L, 1L, "view", 0.0)))
    val r = Events.intervalUnionOf(ev)
      .select("active_us", "n_islands", "n_events").collect()
    assert(r(0).getLong(0) == 900L * 1000000 && r(0).getLong(1) == 2L &&
      r(0).getLong(2) == 3L)
  }

  test("maxConcurrencyOf: half-open intervals — touching is NOT concurrent") {
    val touching = Seq((1L, 0L, 10L), (2L, 10L, 20L))
      .toDF("user_id", "start_us", "end_us")
    val t = Events.maxConcurrencyOf(touching).collect()(0)
    assert(t.getLong(0) == 1L)
    val overlapping = Seq((1L, 0L, 20L), (2L, 10L, 30L), (3L, 15L, 16L))
      .toDF("user_id", "start_us", "end_us")
    val o = Events.maxConcurrencyOf(overlapping).collect()(0)
    assert(o.getLong(0) == 3L && o.getLong(1) == 15L) // earliest peak instant
  }

  test("emaOf: a single observed day is its own EMA") {
    val ev = evFrame(Seq((1L, 100L, 1L, "click", 4.5)))
    val r = Events.emaOf(ev).select("ema", "n_terms").collect()(0)
    assert(r.getDouble(0) == 4500000.0 && r.getLong(1) == 1L)
  }
}
