package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Pins text_lm_bits (integer-quantized bigram-LM cross-entropy) and
  * text_gopher_rules (word-level quality gates).
  *
  * lm_bits is re-derived end-to-end in plain Scala on the fixture —
  * unigram/bigram counts, the count floor, the exact floor-log2 — and
  * compared row-exactly, then bounded against the TRUE (transcendental)
  * surprisal: true_bits - n < total_bits <= true_bits per doc.
  */
class LmQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bitLen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)

  /** floor(log2(a/b)) for 0 < b <= a, exactly. */
  private def floorLog2Ratio(a: Long, b: Long): Int = {
    val d = bitLen(a) - bitLen(b)
    if ((b << d) <= a) d else d - 1
  }

  test("lm_bits matches an independent Scala re-derivation row-exactly") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val tokens = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val uni = tokens.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val v = uni.size.toLong
    val allBigrams = tokens.flatMap { case (_, ts) => ts.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
    val lm = allBigrams.groupBy(identity).map { case (k, c) => k -> c.size.toLong }
      .filter(_._2 >= 5L)
    val expected = tokens.filter(_._2.size >= 2).map { case (id, ts) =>
      val bgs = ts.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      val rows = bgs.map { bg =>
        val cxy = lm.getOrElse(bg, 0L)
        val a = uni(bg._1) + v
        val b = cxy + 1L
        (cxy == 0L, floorLog2Ratio(a, b).toLong, math.log((a.toDouble / b)) / math.log(2.0))
      }
      (id, (rows.size.toLong, rows.count(_._1).toLong, rows.map(_._2).sum,
        rows.map(_._3).sum))
    }.toMap

    val got = TextAnalysis.lmBits(spark, TestSpark.Sf)
      .select("doc_id", "n_bigrams", "n_oov", "total_bits")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, n, oov, bits) =>
      val (en, eoov, ebits, etrue) = expected(id)
      assert(n == en, s"doc $id n_bigrams")
      assert(oov == eoov, s"doc $id n_oov")
      assert(bits == ebits, s"doc $id total_bits: got $bits want $ebits")
      // quantization bound: each floor term is in (true - 1, true]
      assert(bits <= etrue + 1e-6 && bits > etrue - n - 1e-6,
        s"doc $id bits $bits outside (true-n, true] = (${etrue - n}, $etrue]")
    }
  }

  test("lm_bits: repeated common bigrams cost fewer bits than rare ones") {
    // corpus where 'x y' occurs far above the floor and every other
    // bigram is below it: the doc made of the hot bigram must score
    // fewer bits per bigram than the doc of one-off bigrams
    val hot = (1 to 20).map(i => (i.toLong, "x y x y x y x y x y"))
    val rare = Seq((100L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9"))
    val docs = (hot ++ rare).toDF("doc_id", "text")
    val out = TextAnalysis.lmBitsOf(docs)
      .select("doc_id", "bits_per_bigram").as[(Long, Double)].collect().toMap
    assert(out(1L) < out(100L),
      s"hot ${out(1L)} should be cheaper than rare ${out(100L)}")
  }

  test("gopher rules: each gate trips on a targeted synthetic doc") {
    val pass = "the cats sat of the mats and dogs ran is bigger " * 5 // 55 words, stopwords, alpha, mean len ~3.4
    val docs = Seq(
      (1L, pass.trim),                                   // passes all gates
      (2L, "the of short doc"),                          // < 50 words
      (3L, ("zz " * 60).trim),                           // < 2 distinct stopwords
      (4L, ("the of " + "123 " * 58).trim),              // alpha_frac < 0.8
      (5L, ("the of " + "### " * 58).trim),              // symbol ratio + alpha
      (6L, ("the of " + "pneumonoultramicroscopics " * 58).trim) // mean len > 10
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRulesOf(docs)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out(1L), "clean doc must pass")
    Seq(2L, 3L, 4L, 5L, 6L).foreach(id => assert(!out(id), s"doc $id must fail"))
  }

  test("gopher rules agree with text_quality on the shared length gate") {
    // both operators read the same corpus; a doc failing gopher's
    // 50-word floor must have n_tokens < 50 in text_quality's output
    val g = TextAnalysis.gopherRules(spark, TestSpark.Sf)
      .select("doc_id", "n_words").as[(Long, Long)].collect().toMap
    val q = TextAnalysis.quality(spark, TestSpark.Sf)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(g.keySet == q.keySet)
    g.foreach { case (id, n) => assert(n == q(id), s"doc $id token count") }
  }

  test("pii redaction: counts and redacted text on hand-built docs") {
    val docs = Seq(
      (1L, "write to alice.b1@example.org or bob@test.com for access"),
      (2L, "hosts 10.0.0.1 and 192.168.255.254 are up, 1.2.3.4 is down"),
      (3L, "call 555-0199 then 020-1234 twice"),
      (4L, "no pii here at all"),
      (5L, "mixed: eve9@mail.com from 172.16.0.9 dials 555-7000")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiOf(docs, "text")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 0L, 0L,
      "write to <EMAIL> or <EMAIL> for access")))
    assert(out(2L) == ((2L, 0L, 3L, 0L,
      "hosts <IP> and <IP> are up, <IP> is down")))
    assert(out(3L) == ((3L, 0L, 0L, 2L,
      "call <PHONE> then <PHONE> twice")))
    assert(out(4L) == ((4L, 0L, 0L, 0L, "no pii here at all")))
    assert(out(5L) == ((5L, 1L, 1L, 1L,
      "mixed: <EMAIL> from <IP> dials <PHONE>")))
  }

  test("pii redaction query: planted PII type follows doc_id % 4, fixture clean") {
    val out = TextAnalysis.piiRedact(spark, TestSpark.Sf)
      .select("doc_id", "n_emails", "n_ips", "n_phones")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, e, ip, ph) =>
      val expect = (id % 4) match {
        case 0 => (1L, 0L, 0L)
        case 1 => (0L, 1L, 0L)
        case 2 => (0L, 0L, 1L)
        case _ => (0L, 0L, 0L)
      }
      assert((e, ip, ph) == expect, s"doc $id planted-PII counts")
    }
  }
}
