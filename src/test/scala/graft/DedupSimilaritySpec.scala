package graft

import graft.operators.{Dedup, Similarity}
import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("MinHash+LSH recovers the exact ngram-Jaccard pair set (recall 1.0 here)") {
    val exact = pairSet(Dedup.ngramJaccard(spark, TestSpark.Sf))
    val lsh = pairSet(Dedup.minhashLsh(spark, TestSpark.Sf))
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    // LSH-verified pairs are exactly the exact pairs: verification uses the
    // same threshold, and banding recall at j≈0.99 is ~1.
    assert(lsh == exact)
  }

  test("simhash: identical texts identical sigs; near-dup close; unrelated far") {
    val docs = Seq(
      (1L, "spark shuffles data between stages during wide transformations always"),
      (2L, "spark shuffles data between stages during wide transformations always"),
      (3L, "spark shuffles data between stages during wide transformations often"),
      (4L, "completely unrelated vocabulary about gardening tulips roses soil"))
      .toDF("doc_id", "text")
    val s = Dedup.simhashOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(s(1L) == s(2L), "identical texts must collide")
    assert(ham(s(1L), s(3L)) < ham(s(1L), s(4L)),
      "one-token edit must be closer than unrelated text")
    val again = Dedup.simhashOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s == again, "simhash must be deterministic across runs")
  }

  test("exact dedup: n_copies sums to corpus size, representatives unique") {
    val d = Dedup.exact(spark, TestSpark.Sf)
    val total = d.agg(org.apache.spark.sql.functions.sum("n_copies")).as[Long].head()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.Sf).count()
    assert(total == nDocs)
    assert(d.select("doc_id").distinct().count() == d.count())
  }

  test("cosine near-dup pairs are symmetric-free and above threshold") {
    val p = Dedup.cosinePairs(spark, TestSpark.Sf)
      .as[(Long, Long, Double)].collect()
    assert(p.forall { case (a, b, c) => a < b && c >= 0.45 })
  }

  test("ANN recall@5 >= 0.9 for both paths (random-vector regime)") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val gt = pairs(Similarity.topKBruteForce(spark, TestSpark.Sf))
    val lsh = pairs(Similarity.topKLsh(spark, TestSpark.Sf))
    val ivf = pairs(Similarity.topKIvf(spark, TestSpark.Sf))
    assert(gt.size == 50)
    val lshRecall = (lsh & gt).size.toDouble / gt.size
    val ivfRecall = (ivf & gt).size.toDouble / gt.size
    assert(lshRecall >= 0.9, s"lsh recall $lshRecall")
    assert(ivfRecall >= 0.9, s"ivf recall $ivfRecall")
  }

  test("cosine LSH dedup recovers the exact pair set with a bucketed plan") {
    val exact = Dedup.cosinePairs(spark, TestSpark.Sf)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lshDf = Dedup.cosineLsh(spark, TestSpark.Sf)
    val lsh = lshDf.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
    val plan = lshDf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "bucketed path must not plan an all-pairs nested loop")
    // scores bit-match the exact form on the shared pairs
    val exactScores = Dedup.cosinePairs(spark, TestSpark.Sf)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    Dedup.cosineLsh(spark, TestSpark.Sf).as[(Long, Long, Double)].collect()
      .foreach { case (a, b, c) => assert(exactScores((a, b)) == c) }
  }

  test("brute-force top-k ranks are 1..5 per query, cosine non-increasing") {
    val rows = Similarity.topKBruteForce(spark, TestSpark.Sf)
      .select("query_id", "rank", "cosine").as[(Long, Long, Double)]
      .collect().groupBy(_._1)
    rows.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(sorted.sliding(2).forall { case Array(a, b) => a._3 >= b._3 })
    }
  }
}
