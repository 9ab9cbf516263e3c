package graft

import graft.operators.Curation
import org.scalatest.funsuite.AnyFunSuite

/** `cur_communities` is iterative label propagation (rows-only at the
  * oracle gate); this suite is its correctness pin. The reference is an
  * independent sequential simulation of the same deterministic rule:
  * synchronous rounds, most-frequent neighbor label, ties to the
  * smallest label, fixed 10 rounds. */
class CommunitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential synchronous LPA over an undirected edge list. */
  private def referenceLpa(edges: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap))
      .groupMap(_._1)(_._2).view.mapValues(_.toVector).toMap
    var lbl: Map[Long, Long] = adj.keys.map(k => k -> k).toMap
    (1 to rounds).foreach { _ =>
      lbl = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupMapReduce(lbl)(_ => 1L)(_ + _)
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  private def communitySizes(lbl: Map[Long, Long]): Seq[(Long, Long)] =
    lbl.groupMapReduce(_._2)(_ => 1L)(_ + _).toSeq.sorted

  test("two cliques with one bridge stay separate communities") {
    val cliqueA = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 10L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val edges = cliqueA ++ cliqueB ++ Seq((4L, 10L))
    val got = Curation.communitiesOf(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toSeq
    assert(got == communitySizes(referenceLpa(edges, 10)))
    assert(got.size == 2, s"expected 2 communities, got $got")
    assert(got.map(_._2).sum == 10)
  }

  test("distributed LPA equals the sequential reference on the fixture graph") {
    val items = graft.sources.Tables.lineitem(spark, TestSpark.Sf)
      .selectExpr("l_orderkey AS ok", "l_partkey AS pid").distinct()
    val e = items.selectExpr("ok", "pid AS u")
      .join(items.selectExpr("ok", "pid AS v"), "ok")
      .where("u < v").select("u", "v").distinct()
      .as[(Long, Long)].collect().toSeq
    val got = Curation.communities(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toSeq
    val want = communitySizes(referenceLpa(e, 10))
    assert(got == want)
    assert(got.map(_._2).sum == e.flatMap(p => Seq(p._1, p._2)).distinct.size)
  }

  test("result is partition-count invariant") {
    val edges = ((0L to 20L).map(i => (i, (i + 1) % 21)) ++
      (30L to 40L).flatMap(i => ((i + 1) to 40L).map((i, _)))).toSeq
    val one = Curation.communitiesOf(edges.toDF("u", "v").repartition(1))
      .as[(Long, Long)].collect().toSeq
    val many = Curation.communitiesOf(edges.toDF("u", "v").repartition(9))
      .as[(Long, Long)].collect().toSeq
    assert(one == many)
  }
}
