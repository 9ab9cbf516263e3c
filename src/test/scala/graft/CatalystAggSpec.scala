package graft

import graft.functions.MinHashAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CatalystAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = 8

  test("MinHashAgg equals the expression-composed xxhash64 signature") {
    val df = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 99L))
      .toDF("g", "h0")
    val agg = df.groupBy($"g")
      .agg(MinHashAgg.minhashSig($"h0", n).as("sig"))
      .select($"g", $"sig").as[(Long, Seq[Long])].collect().toMap
    val seedCols = (0 until n).map(s => min(xxhash64($"h0", lit(s))).as(s"m$s"))
    val expr = df.groupBy($"g").agg(seedCols.head, seedCols.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to n).map(r.getLong)).toMap
    assert(agg.keySet == expr.keySet)
    agg.foreach { case (g, sig) => assert(sig == expr(g), s"group $g") }
  }

  test("MinHashAgg is partition-merge invariant") {
    val rows = (1L to 1000L).map(i => (i % 7, i * 31 + 5))
    val one = rows.toDF("g", "h0").repartition(1).groupBy($"g")
      .agg(MinHashAgg.minhashSig($"h0", n).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val many = rows.toDF("g", "h0").repartition(13).groupBy($"g")
      .agg(MinHashAgg.minhashSig($"h0", n).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(one == many)
  }

  test("typed Aggregator: per-flag avg quantity equals the untyped plan") {
    import graft.functions.TypedAggregators
    case class Li(l_returnflag: String, l_quantity: Double)
    val ds = graft.sources.Tables.lineitem(spark, TestSpark.Sf)
      .select($"l_returnflag", $"l_quantity").as[(String, Double)]
    val typedAvg = ds.groupByKey(_._1)
      .agg(new TypedAggregators.AvgLong[(String, Double)](_._2.toLong).toColumn)
      .collect().toMap
    val untyped = graft.sources.Tables.lineitem(spark, TestSpark.Sf)
      .groupBy($"l_returnflag")
      .agg((sum($"l_quantity".cast("long")).cast("double") / count(lit(1))).as("avg"))
      .as[(String, Double)].collect().toMap
    assert(typedAvg.keySet == untyped.keySet)
    typedAvg.foreach { case (k, v) => assert(v == untyped(k), k) }
  }

  test("MinHashAgg estimates Jaccard (sketch property, loose bound)") {
    // two sets with true overlap 50/150 ≈ 0.33 under 64 hashes
    val a = (1L to 100L).map(h => (0L, h))
    val b = (51L to 200L).map(h => (1L, h))
    val sigs = (a ++ b).toDF("g", "h0").groupBy($"g")
      .agg(MinHashAgg.minhashSig($"h0", 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val est = sigs(0L).zip(sigs(1L)).count { case (x, y) => x == y } / 64.0
    val truth = 50.0 / 150.0
    assert(math.abs(est - truth) < 0.2, s"est $est vs $truth")
  }
}
