package graft

import graft.operators.Similarity
import graft.sources.SyntheticEmbeddings
import org.scalatest.funsuite.AnyFunSuite

/** The ×10 ANN recall gate (round-15 verdict item 1): the driver's
  * scaled fixture copies `embeddings` UNSCALED (tools/make_sfx.py —
  * replicating vectors would plant exact dups and measure the corpus,
  * not the index), so this spec builds a genuine 20 000-vector corpus
  * (10× the bench tier's 2 000) in BOTH regimes and holds the DEFAULT
  * keys — the ones whose parameters now DERIVE from corpus size
  * ([[Similarity.ivfStride]]/[[Similarity.ivfProbes]]/
  * [[Similarity.pqShortlist]]) — to the same recall@5 ≥ 0.9 floor the
  * fixture-scale specs pin. A fixed cell count / probe count /
  * shortlist would fail here: 17 fixed probes of 142 derived cells is
  * a 0.12 probe fraction (vs the measured 0.68 recall point), and a
  * fixed 150-row shortlist at n=20 000 is a 0.0075 fraction (vs 0.3).
  *
  * LSH deliberately keeps 8×6-bit tables at any n ON UNIFORM data:
  * its scan FRACTION — the recall determinant — is bits-and-tables-
  * determined and n-invariant (buckets grow ∝ n), so recall carries;
  * deriving bits UP with n would shrink the fraction and break the
  * uniform floor. Bits is the REGIME knob, and the default key now
  * switches it by regime (6 uniform / 12 clustered — r16); the
  * uniform test here pins the n-invariance of the 6-bit curve at ×10,
  * and the clustered test now doubles as the 12-bit ×10 recall gate.
  */
class ScaledAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 20000L

  private lazy val uniDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ann-x10u").toString
    SyntheticEmbeddings.writeUniformFixture(spark, d, N)
    d
  }
  private lazy val cluDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ann-x10c").toString
    SyntheticEmbeddings.writeFixture(spark, d, N)
    d
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  private lazy val gtUni: Set[(Long, Long)] =
    pairs(Similarity.topKBruteForce(spark, uniDir))
  private lazy val gtClu: Set[(Long, Long)] =
    pairs(Similarity.topKBruteForce(spark, cluDir))

  private def gateBoth(label: String,
      run: String => org.apache.spark.sql.DataFrame): Unit = {
    val ru = (pairs(run(uniDir)) & gtUni).size.toDouble / gtUni.size
    val rc = (pairs(run(cluDir)) & gtClu).size.toDouble / gtClu.size
    info(f"$label x10: uniform recall=$ru%.3f clustered recall=$rc%.3f")
    assert(ru >= 0.9, s"$label uniform x10 recall $ru")
    assert(rc >= 0.9, s"$label clustered x10 recall $rc")
  }

  test("derived parameters take the documented values at n=20000") {
    val stride = Similarity.ivfStride(N)
    val k = (N + stride - 1) / stride
    assert(stride == 140L && k == 143L, s"stride=$stride k=$k")
    assert(Similarity.ivfProbes(k.toInt) == 98)
    assert(Similarity.pqShortlist(N) == 6000)
    // and at the fixture tiers the derivation reproduces the measured
    // recall points the round-14 constants encoded
    assert(Similarity.ivfStride(500L) == 21L) // 24 cells (was fixed 25)
    assert(Similarity.ivfProbes(24) == 17)    // the measured 0.68 point
    assert(Similarity.pqShortlist(500L) == 150)
  }

  test("LSH default (8x6 bits): recall floor holds at x10 in both regimes") {
    gateBoth("lsh", Similarity.topKLsh(spark, _))
  }

  test("IVF derived (~sqrt(n) cells, 0.68 probe fraction): recall floor holds at x10") {
    gateBoth("ivf", Similarity.topKIvf(spark, _))
  }

  test("PQ derived (0.3n shortlist): recall floor holds at x10") {
    gateBoth("pq", Similarity.topKPq(spark, _))
  }

  test("IVF-PQ derived: recall floor holds at x10") {
    gateBoth("ivfpq", Similarity.topKIvfPq(spark, _))
  }

  test("OPQ residual tier: recall floor holds at x10 with the SAMPLED rotation") {
    // at n=20000 the rotation's covariance stride is 2 (half the corpus
    // sampled) — this is the first tier where the bounded-sample
    // training path actually engages, so the floor here gates it
    gateBoth("opq", Similarity.topKOpq(spark, _))
  }
}
