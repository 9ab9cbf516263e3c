package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** `text_bpe_merges` is iterative (greedy argmax + rewrite per round)
  * and therefore rows-only at the oracle gate; this suite is its
  * correctness pin. The reference is an INDEPENDENT sequential BPE
  * trainer written directly from the algorithm (plain Scala maps, no
  * Spark), with the same counting convention: every adjacent position
  * counts (overlaps included), weighted by word frequency, ties broken
  * (count desc, left asc, right asc). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential reference: full merge table over a word-frequency map. */
  private def referenceBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupMapReduce(_._1.split("").toVector.filter(_.nonEmpty))(_._2)(_ + _)
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rr), cnt) =
          counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r + 1L, l, rr, l + rr, cnt))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          // left-to-right non-overlapping application
          val res = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
              res += l + rr; i += 2
            } else { res += syms(i); i += 1 }
          }
          res.result()
        }(_._2)(_ + _)
      }
      r += 1
    }
    out.result()
  }

  test("distributed trainer equals the sequential reference on a classic corpus") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val docs = words.toSeq.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .mkString(" ")
    val df = Seq((1L, docs)).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMergesOf(spark, df, 10)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val want = referenceBpe(words, 10)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("trainer on the fixture equals the reference on the fixture's own vocab") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
    val words = docs.selectExpr("explode(filter(split(text, ' '), t -> t <> '')) AS w")
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val got = TextAnalysis.bpeMergesOf(spark, docs, 8)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == referenceBpe(words, 8))
    assert(got.nonEmpty)
    got.foreach { case (_, l, r, m, c) =>
      assert(m == l + r); assert(c >= 1)
    }
  }

  test("merge table is partition-count invariant") {
    val df = Seq.tabulate(40)(i => (i.toLong, s"ab abc abcd w${i % 4}"))
      .toDF("doc_id", "text")
    val one = TextAnalysis.bpeMergesOf(spark, df.repartition(1), 6)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val many = TextAnalysis.bpeMergesOf(spark, df.repartition(11), 6)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(one == many)
  }

  /** Sequential tokenizer: apply a merge table to one word, in rank
    * order, each merge one left-to-right non-overlapping pass. */
  private def referenceTokenize(word: String,
      merges: Seq[(String, String)]): Int = {
    var syms = word.split("").toVector.filter(_.nonEmpty)
    merges.foreach { case (l, r) =>
      val res = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          res += l + r; i += 2
        } else { res += syms(i); i += 1 }
      }
      syms = res.result()
    }
    syms.length
  }

  test("bpeTokenize equals sequential application of the reference table") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
    val collected = docs.selectExpr("doc_id",
        "filter(split(text, ' '), t -> t <> '') AS ws")
      .as[(Long, Seq[String])].collect()
    val vocab = collected.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => (w, xs.length.toLong) }
    val merges = referenceBpe(vocab, 8).map(m => (m._2, m._3))
    val want = collected.filter(_._2.nonEmpty).map { case (id, ws) =>
      id -> ((ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(w => referenceTokenize(w, merges).toLong).sum))
    }.toMap
    val got = TextAnalysis.bpeTokenizeOf(spark, docs, 8)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nw, nc, nt) => id -> ((nw, nc, nt)) }.toMap
    assert(got == want)
    // learned merges can only shrink: n_words <= n_tokens <= n_chars
    got.values.foreach { case (nw, nc, nt) =>
      assert(nw <= nt && nt <= nc)
    }
  }

  test("bpeTokenize with zero merges degenerates to character counts") {
    val df = Seq((1L, "ab abc"), (2L, "zzzz")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenizeOf(spark, df, 0)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nw, nc, nt) => id -> ((nw, nc, nt)) }.toMap
    assert(got == Map(1L -> ((2L, 5L, 5L)), 2L -> ((1L, 4L, 4L))))
  }
}
