package graft

import graft.operators.Pipeline
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the Pipeline pack (the checks the DuckDB oracle cannot
  * run): sketch-accuracy bounds for the HLL and quantile queries,
  * permutation/bijection for the global shuffle, keep-rate bounds for
  * stratified sampling, a planted-contamination property plus
  * hashed-vs-raw parity for decontamination, and the degenerate-vector
  * guard for int8 quantization. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hll daily: exact column is truly exact; estimates within error bound") {
    val out = Pipeline.hllDaily(spark, TestSpark.Sf).collect()
    val ev = Tables.events(spark, TestSpark.Sf)
    val exactByDay = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(java.sql.Date, Long)].collect().toMap
    val exactTotal = ev.select(countDistinct(col("user_id"))).as[Long].head()
    val (unionRows, dayRows) = out.partition(_.isNullAt(0))
    assert(unionRows.length == 1 && dayRows.length == exactByDay.size)
    // default lgConfigK=12 → rsd ≈ 1.6%; 5% (min 2) is a generous ceiling
    def close(est: Long, exact: Long): Boolean =
      math.abs(est - exact) <= math.max(2.0, 0.05 * exact)
    dayRows.foreach { r =>
      val exact = exactByDay(r.getDate(0))
      assert(r.getLong(2) == exact, s"exact_users must be exact on ${r.getDate(0)}")
      assert(close(r.getLong(1), exact), s"estimate off on ${r.getDate(0)}: $r")
    }
    val u = unionRows.head
    assert(u.getLong(2) == exactTotal, "union row exact_users")
    assert(close(u.getLong(1), exactTotal), s"union estimate off: $u")
  }

  test("approx quantiles sit within ±5% rank of the exact percentiles") {
    val li = Tables.lineitem(spark, TestSpark.Sf)
    val approx = Pipeline.approxQuantiles(spark, TestSpark.Sf)
      .selectExpr("l_returnflag", "cast(p25 as double)", "cast(p50 as double)",
        "cast(p75 as double)")
      .as[(String, Double, Double, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (flag, p25, p50, p75) =>
      assert(p25 <= p50 && p50 <= p75, s"quantiles out of order for $flag")
      // a value within rank error ε of quantile q lies between the exact
      // interpolated percentiles at q−ε and q+ε
      val b = li.filter(col("l_returnflag") === flag)
        .select(expr("percentile(cast(l_extendedprice as double), " +
          "array(0.20, 0.30, 0.45, 0.55, 0.70, 0.80))"))
        .as[Seq[Double]].head()
      assert(p25 >= b(0) && p25 <= b(1), s"p25 outside rank bound for $flag")
      assert(p50 >= b(2) && p50 <= b(3), s"p50 outside rank bound for $flag")
      assert(p75 >= b(4) && p75 <= b(5), s"p75 outside rank bound for $flag")
    }
  }

  test("kll rollup: per-flag and merged-ALL medians inside exact rank bounds") {
    val li = Tables.lineitem(spark, TestSpark.Sf)
    val rows = Pipeline.kllRollup(spark, TestSpark.Sf)
      .as[(String, Long, Double)].collect()
    val flags = rows.filter(_._1 != "ALL")
    assert(flags.nonEmpty && rows.exists(_._1 == "ALL"))
    assert(rows.find(_._1 == "ALL").get._2 == li.count(),
      "ALL n_rows is exact and must equal the table size")
    rows.foreach { case (flag, nRows, p50) =>
      val slice = if (flag == "ALL") li else li.filter(col("l_returnflag") === flag)
      assert(nRows == slice.count())
      // KLL default k=200 → normalized rank error ≈1.65%; ±5% is generous,
      // and crucially also bounds the ALL row computed from MERGED sketches
      val b = slice.select(expr(
        "percentile(cast(l_extendedprice as double), array(0.45, 0.55))"))
        .as[Seq[Double]].head()
      assert(p50 >= b(0) && p50 <= b(1), s"$flag median $p50 outside $b")
    }
  }

  test("global shuffle is a dense permutation 1..N and deterministic") {
    val first = Pipeline.globalShuffle(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toSeq
    val n = Tables.documents(spark, TestSpark.Sf).count()
    assert(first.length == n)
    assert(first.map(_._1).distinct.length == n, "every doc exactly once")
    assert(first.map(_._2).sorted == (1L to n).toSeq, "positions dense 1..N")
    val again = Pipeline.globalShuffle(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toSeq
    assert(first == again, "permutation must be reproducible")
  }

  test("stratified sample keeps ~25% of en / ~75% of the rest, deterministically") {
    val docs = spark.range(1, 10001)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val kept = Pipeline.stratifiedSampleOf(docs).groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    val enRate = kept("en").toDouble / 5000
    val deRate = kept("de").toDouble / 5000
    // md5 membership is a fixed function, so these are exact numbers, not
    // draws — 0.02 (≈3σ of a binomial at n=5000) covers hash dispersion
    assert(math.abs(enRate - 0.25) < 0.02, s"en keep rate $enRate")
    assert(math.abs(deRate - 0.75) < 0.02, s"de keep rate $deRate")
    val a = Pipeline.stratifiedSampleOf(docs).as[(Long, String)].collect().toSet
    val b = Pipeline.stratifiedSampleOf(docs).as[(Long, String)].collect().toSet
    assert(a == b, "membership must be deterministic")
  }

  test("decontaminate flags exactly the planted train→eval leak (raw and hashed)") {
    // md5("6") and md5("19") start with '1' → eval slice; "1"/"2" → train
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo"), // train; copies eval doc 6
      (2L, "one two three four five six"), // train; clean
      (6L, "alpha bravo charlie delta echo"), // eval
      (19L, "zulu yankee xray whiskey victor uniform")) // eval; unshared
      .toDF("doc_id", "text")
    for (df <- Seq(Pipeline.decontaminateOf(docs),
        Pipeline.decontaminateHashedOf(docs, dfCap = 1000))) {
      assert(df.as[(Long, Long, Long)].collect().toSeq == Seq((1L, 1L, 1L)))
    }
    // the planted gram lives in 2 docs; a df cap of 1 calls it boilerplate
    assert(Pipeline.decontaminateHashedOf(docs, dfCap = 1).count() == 0)
  }

  test("ngram novelty: duplicated docs score 0, unique docs score 1, mixtures exact") {
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo"),          // one 5-gram, copied by 2
      (2L, "alpha bravo charlie delta echo"),          // exact copy → df 2
      (3L, "one two three four five six"),             // two 5-grams, both unique
      // shares its first 5-gram with nobody, but tokens overlap doc 3 —
      // novelty is about grams, not vocabulary
      (4L, "six five four three two one"),
      (5L, "short text"))                              // < 5 tokens → excluded
      .toDF("doc_id", "text")
    val got = Pipeline.ngramNoveltyOf(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 0L, 0.0), (2L, 1L, 0L, 0.0),
      (3L, 2L, 2L, 1.0), (4L, 2L, 2L, 1.0)))
  }

  test("hashed+capped decontaminate equals the raw oracle form on the fixture") {
    val raw = Pipeline.decontaminate(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect().toSeq
    val hashed = Pipeline.decontaminateHashed(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(raw == hashed)
  }

  test("line dedup strips injected boilerplate chunks, keeps unique content") {
    // 8-token boilerplate planted chunk-aligned in three docs (df = 3)
    val bp = "subscribe to our newsletter for daily updates now"
    val docs = Seq(
      (1L, s"$bp u1a u1b u1c u1d u1e u1f u1g u1h"),
      (2L, s"$bp u2a u2b u2c u2d u2e u2f u2g u2h"),
      (3L, bp),
      (4L, "only unique tokens here make one single chunk"))
      .toDF("doc_id", "text")
    val out = Pipeline.lineDedupOf(docs, 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("u1a u1b u1c u1d u1e u1f u1g u1h", 1L, 1L)))
    assert(out(2L) == (("u2a u2b u2c u2d u2e u2f u2g u2h", 1L, 1L)))
    assert(out(3L) == (("", 0L, 1L)), "fully-boilerplate doc keeps an empty text")
    assert(out(4L) == (("only unique tokens here make one single chunk", 1L, 0L)))
  }

  test("line dedup: untouched docs reassemble byte-exact; chunk accounting conserves") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val out = Pipeline.lineDedup(spark, TestSpark.Sf)
    assert(out.count() == docs.count(), "every doc stays in the output")
    val mismatched = out.join(docs, "doc_id")
      .filter(col("n_dropped") === 0 && col("clean_text") =!= col("text"))
    assert(mismatched.count() == 0,
      "docs with nothing dropped must reassemble to their original text")
    val totalChunks = docs
      .selectExpr("cast((size(split(text, ' ')) + 7) div 8 as long) as c")
      .agg(sum(col("c"))).as[Long].head()
    val accounted = out.agg(sum(col("n_kept") + col("n_dropped"))).as[Long].head()
    assert(accounted == totalChunks, "kept + dropped must cover every chunk")
  }

  test("int8 quantization: all-zero embedding reports NULLs, never NaN") {
    val emb = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, -2f, 0.5f)))
      .toDF("vec_id", "embedding")
    val rows = Pipeline.quantizeInt8Of(emb).collect()
    val zero = rows.find(_.getLong(0) == 1L).get
    assert(zero.isNullAt(1), "scale must be NULL for an all-zero vector")
    assert(zero.getLong(2) == 0L, "nothing saturates in a degenerate vector")
    assert(zero.isNullAt(3) && zero.isNullAt(4), "errors must be NULL, not NaN")
    val ok = rows.find(_.getLong(0) == 2L).get
    assert(ok.getDouble(1) == 2.0)
    assert(!ok.getDouble(3).isNaN && !ok.getDouble(4).isNaN)
  }

  test("vocab growth: cumulative curve reconciles with corpus totals") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
      .selectExpr("doc_id", "split(text, ' ') as t")
      .as[(Long, Seq[String])].collect()
    val rows = graft.operators.TextAnalysis.vocabGrowth(spark, TestSpark.Sf)
      .select("bucket", "n_docs", "n_tokens", "new_types",
        "docs_cum", "tokens_cum", "vocab_cum")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // per-bucket columns sum to the independent corpus totals
    assert(rows.map(_._2).sum == docs.length)
    assert(rows.map(_._3).sum == docs.map(_._2.size.toLong).sum)
    assert(rows.map(_._4).sum == docs.flatMap(_._2).distinct.size.toLong)
    // cumulative columns are running sums of the per-bucket columns
    var (dc, tc, vc) = (0L, 0L, 0L)
    rows.foreach { r =>
      dc += r._2; tc += r._3; vc += r._4
      assert((r._5, r._6, r._7) == ((dc, tc, vc)), s"bucket ${r._1} cumsum")
    }
    // the final point is the whole corpus
    assert(rows.last._7 == docs.flatMap(_._2).distinct.size.toLong)
  }
}
