package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: every declared query must execute on the
  * smallest fixture, every oracle key must reference a real query, and
  * pack keys must not collide — the failure modes that would silently
  * zero a round's correctness score. */
class ContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("pack query keys never collide") {
    val all = SparkEntry.packs.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query keys across packs: $dups")
  }

  test("every query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, TestSpark.Sf).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("representative outputs are bit-identical across shuffle-partition counts") {
    // partitioning must never reach results: decimal-exact sums, total-order
    // window ties, and fixed-order folds are the mechanisms; this pins them
    // against the config axis the driver actually varies (cpus = partitions)
    val names = Seq("ssb_yearly_revenue", "x_scd2_dim", "dedup_ngram_jaccard",
      "ev_sequence_count", "dedup_containment", "text_ngram_novelty")
    def run(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, TestSpark.Sf)
        .collect().map(_.toString).toSeq.sorted
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    val at32 = names.map(n => n -> run(n)).toMap
    try {
      conf.set("spark.sql.shuffle.partitions", "5")
      names.foreach { n =>
        assert(run(n) == at32(n), s"$n output depends on partition count")
      }
    } finally conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("oracle SQL contains no unresolved stripMargin pipes") {
    // a leading '|' that survived stripMargin means mangled SQL
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.linesIterator.exists(_.trim.startsWith("|")),
        s"$name oracle still has margin pipes")
    }
  }
}
