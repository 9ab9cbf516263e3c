package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic mixture-of-Gaussians embedding generator — the
  * "honesty fixture" for the ANN family (SURVEY.md §2.3 X3).
  *
  * The driver's `embeddings` fixture is near-uniform random directions,
  * the ADVERSARIAL regime for every ANN index: with no cluster structure,
  * recall@5 ≥ 0.9 inherently costs a large candidate fraction (~0.6 for
  * the LSH path, 17/25 probes for IVF — measured in DedupSimilaritySpec
  * and documented in [[graft.operators.Similarity]]). Production
  * embeddings are clustered, and the same machinery prunes far harder at
  * the same recall. This generator produces the clustered regime so
  * ClusteredAnnSpec can PIN that claim instead of asserting it in prose:
  * recall@5 ≥ 0.9 at a materially lower scan fraction.
  *
  * Determinism: every value derives from `xxhash64` of (row id, dim,
  * fixed salt) — no RNG object, no seed state, no partition-order
  * dependence; the same (n, dim, k, sigma) always yields bit-identical
  * vectors, on any partitioning (generation is a pure map over
  * `spark.range`, embarrassingly parallel at any scale).
  *
  * Construction: cluster centers are uniform per-dimension in [-1, 1]
  * (hash of (cluster, dim)); in 64-dim any two such centers are nearly
  * orthogonal with norm ≈ √(64/3) ≈ 4.6, so clusters are well separated.
  * Points add per-dimension Gaussian noise (σ configurable) obtained via
  * the Box–Muller transform of two hash-uniforms. Cluster membership is
  * `xxhash64(vec_id) mod k` — queries (`vec_id < 10`) land in hash-spread
  * clusters. The `label` column carries the true cluster id, giving
  * specs a free ground truth for cluster-recovery assertions.
  *
  * Schema matches the driver fixture exactly (vec_id BIGINT, embedding
  * FLOAT[], label INT) so `Tables.embeddings` reads a directory written
  * by [[writeFixture]] unchanged.
  */
object SyntheticEmbeddings {

  /** One row per vector: (vec_id, embedding: array<float>, label: int). */
  def clustered(spark: SparkSession, n: Long, dim: Int = 64, k: Int = 20,
      sigma: Double = 0.15): DataFrame = {
    val u = (salt: Int) =>
      s"(pmod(xxhash64(id, d, $salt), 1000000) + 0.5) / 1000000.0d"
    val center =
      s"(pmod(xxhash64(cl, d, 1001), 2000001) - 1000000) / 1000000.0d"
    val noise = s"$sigma * sqrt(-2.0d * ln(${u(1002)})) " +
      s"* cos(2.0d * pi() * ${u(1003)})"
    spark.range(n)
      .withColumn("cl", pmod(xxhash64(col("id"), lit(500)), lit(k)))
      .select(col("id").as("vec_id"),
        expr(s"transform(sequence(0L, ${dim - 1}L), " +
          s"d -> cast($center + $noise as float))").as("embedding"),
        col("cl").cast("int").as("label"))
  }

  /** The UNIFORM regime — per-dimension uniform in [-1, 1] from the
    * same hash machinery, no cluster structure: the driver fixture's
    * near-uniform-random shape at any n. This is the ADVERSARIAL
    * regime for every ANN index (class scaladoc), so it is what the
    * ×10 recall gate (ScaledAnnSpec) must hold on: an index whose
    * derived parameters keep recall@5 ≥ 0.9 on uniform directions at
    * 10× the bench corpus has no silently-shrinking scan fraction. */
  def uniform(spark: SparkSession, n: Long, dim: Int = 64): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0L, ${dim - 1}L), d -> cast(" +
        "(pmod(xxhash64(id, d, 2001), 2000001) - 1000000) / 1000000.0d" +
        " as float))").as("embedding"),
      lit(0).as("label"))

  /** Write a directory `Tables.embeddings` can read (one parquet file
    * named like the driver fixture's). */
  def writeFixture(spark: SparkSession, dir: String, n: Long,
      dim: Int = 64, k: Int = 20, sigma: Double = 0.15): Unit =
    clustered(spark, n, dim, k, sigma)
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  /** [[writeFixture]] for the uniform regime. */
  def writeUniformFixture(spark: SparkSession, dir: String, n: Long,
      dim: Int = 64): Unit =
    uniform(spark, n, dim)
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
}
