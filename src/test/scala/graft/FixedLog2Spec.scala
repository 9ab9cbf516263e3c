package graft

import graft.functions.FixedLog2
import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fixed-point shift-and-square log2 device and its two consumers:
  * accuracy of L2 against libm on a wide value sweep, and independent
  * Scala recomputes of the entropy / Theil's U integer cores. */
class FixedLog2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The Scala twin of the SQL device — identical integer steps. */
  private def l2(a: Long): Long = {
    require(a >= 1)
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(a)
    var m = BigInt(a) << (61 - bl)
    var f = 0L
    (1 to 20).foreach { _ =>
      val m2 = (m * m) >> 60
      if (m2 >= (BigInt(1) << 61)) { f = f * 2 + 1; m = m2 >> 1 }
      else { f = f * 2; m = m2 }
    }
    (bl - 1).toLong * FixedLog2.Unit + f
  }

  test("L2 is within 2^-20 + 2^-40 of true log2 across magnitudes") {
    val vals = Seq(1L, 2L, 3L, 5L, 7L, 10L, 63L, 64L, 65L, 999L,
      1000000L, 999999937L, 6000000000L, (1L << 40) - 1, (1L << 40) + 1) ++
      (1 to 50).map(i => math.abs(new scala.util.Random(i).nextLong()) % (1L << 45) + 1)
    val got = FixedLog2.withLog2(vals.toDF("a"), "a", "l")
      .select("a", "l").as[(Long, Long)].collect().toMap
    vals.foreach { a =>
      val fixed = got(a).toDouble / FixedLog2.Unit
      val truth = math.log(a.toDouble) / math.log(2.0)
      assert(math.abs(fixed - truth) <= math.pow(2, -20) + math.pow(2, -39),
        s"a=$a fixed=$fixed true=$truth")
      assert(got(a) == l2(a), s"SQL vs Scala twin diverge at a=$a")
    }
  }

  test("entropy matches an independent integer-core recompute and libm") {
    val rows = Events.entropy(spark, TestSpark.Sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val cells = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type", "k").count()
      .as[(String, Option[Long], Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    rows.foreach { case (t, n, nv, h) =>
      val cs = cells(t)
      assert(n == cs.sum && nv == cs.size.toLong)
      val sh = cs.map(c => BigInt(c) * (l2(n) - l2(c))).sum
      assert(h == sh.toLong.toDouble / (n * FixedLog2.Unit).toDouble, s"type $t")
      val libm = cs.map { c =>
        val p = c.toDouble / n; -p * math.log(p) / math.log(2.0)
      }.sum
      assert(math.abs(h - libm) < 1e-4, s"type $t vs libm")
    }
  }

  test("theils U: integer-core recompute, bounds, and the MI identity") {
    val Seq((n, hType, hWd, mi, u, uRev)) =
      Events.theilsU(spark, TestSpark.Sf)
        .as[(Long, Double, Double, Double, Option[Double], Option[Double])]
        .collect().toSeq
    val grid = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000 % 7").as("wd"))
      .groupBy("event_type", "wd").count()
      .as[(String, Long, Long)].collect()
    val nn = grid.map(_._3).sum
    assert(n == nn)
    val r = grid.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val c = grid.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val sI = grid.map { case (t, w, o) =>
      BigInt(o) * (l2(o) + l2(nn) - l2(r(t)) - l2(c(w))) }.sum
    val sHx = r.values.map(v => BigInt(v) * (l2(nn) - l2(v))).sum
    val sHy = c.values.map(v => BigInt(v) * (l2(nn) - l2(v))).sum
    val den = (nn * FixedLog2.Unit).toDouble
    assert(hType == sHx.toLong.toDouble / den)
    assert(hWd == sHy.toLong.toDouble / den)
    assert(mi == sI.toLong.toDouble / den)
    assert(u.contains(sI.toLong.toDouble / sHx.toLong.toDouble))
    assert(uRev.contains(sI.toLong.toDouble / sHy.toLong.toDouble))
    // normalized MI is a fraction of either marginal entropy
    assert(u.get >= -1e-9 && u.get <= 1.0 + 1e-9)
    assert(uRev.get >= -1e-9 && uRev.get <= 1.0 + 1e-9)
    // U(X|Y)·H(X) == U(Y|X)·H(Y) == I
    assert(math.abs(u.get * hType - mi) < 1e-9)
    assert(math.abs(uRev.get * hWd - mi) < 1e-9)
  }
}
