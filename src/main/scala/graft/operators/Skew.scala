package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense at runtime. Salting is the
  * plan-level fallback when one join key dominates so heavily that even
  * split partitions bottleneck — the classic 100 TB hot-key case
  * (a null-ish default key, a celebrity user).
  *
  * `saltedJoin` salts DETERMINISTICALLY: the big side's salt derives
  * from a hash of its whole row-key set (`xxhash64 % factor`), and the
  * small side is replicated `factor` ways — results are identical to the
  * plain join (pinned by SkewSpec), only the shuffle distribution
  * changes, and reruns are reproducible (no `rand()`).
  */
object Skew {

  /** Inner equi-join `big ⨝ small` on `key`, fanned out over `factor`
    * salt buckets. `saltBy` spreads the big side's hot key: any stable
    * high-cardinality column (or the row-unique id) of the big side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBy: Column, factor: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltBy), lit(factor)))
    val saltedSmall = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${factor - 1})")))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
