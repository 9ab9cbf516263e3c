package graft

import graft.operators.{Curation, Dedup}
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("components: every near-dup pair lands in one component, labels are minima") {
    val comp = Curation.components(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    val pairs = Dedup.ngramJaccard(spark, TestSpark.Sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"pair ($a,$b) split across components")
    }
    // the label is the component's min member
    comp.groupBy(_._2).foreach { case (label, members) =>
      assert(label == members.keys.min)
    }
    // every doc labeled exactly once
    assert(comp.size == graft.sources.Tables.documents(spark, TestSpark.Sf).count())
  }

  test("componentsOf: 200-node chain converges within the round cap (pointer jumping)") {
    val n = 200L
    val nodes = (0L until n).toDF("doc_id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // diameter 199 >> maxRounds: pure one-hop propagation would throw
    val comp = Curation.componentsOf(nodes, edges).as[(Long, Long)].collect()
    assert(comp.length == n)
    assert(comp.forall(_._2 == 0L), "chain collapses to min label 0")
  }

  test("curated corpus: representatives only, quality-gated, sizes consistent") {
    val rows = Curation.curatedCorpus(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (docId, component, clusterSize, nTokens) =>
      assert(docId == component, "only representatives survive")
      assert(clusterSize >= 1)
      assert(nTokens >= 20 && nTokens <= 500)
    }
    // strictly fewer docs than the corpus (dupes + low quality removed)
    assert(rows.length < graft.sources.Tables.documents(spark, TestSpark.Sf).count())
  }
}
