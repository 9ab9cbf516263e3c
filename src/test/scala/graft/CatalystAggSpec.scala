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

  test("MinHashSig equals explode+MinHashAgg, with codegen ON and OFF") {
    import graft.functions.MinHashSig
    // per-doc shingle arrays, including dup hashes inside one array
    val docs = Seq(
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(10L, 99L, 10L)),
      (3L, Seq(7L)),
      (4L, Seq(Long.MinValue, 0L, Long.MaxValue))).toDF("doc_id", "sh")
    def viaSig(): Map[Long, Seq[Long]] = docs
      .select($"doc_id", MinHashSig.minhashSig($"sh", n).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaAgg = docs.select($"doc_id", explode($"sh").as("h0"))
      .groupBy($"doc_id").agg(MinHashAgg.minhashSig($"h0", n).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val conf = spark.conf
    val codegenOn = viaSig()
    val prevWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val codegenOff =
      try {
        conf.set("spark.sql.codegen.wholeStage", "false")
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        viaSig()
      } finally {
        conf.set("spark.sql.codegen.wholeStage", prevWs)
        conf.set("spark.sql.codegen.factoryMode", prevFm)
      }
    assert(codegenOn == viaAgg, "doGenCode path diverges from MinHashAgg")
    assert(codegenOff == viaAgg, "nullSafeEval path diverges from MinHashAgg")
  }

  test("PqEncode matches a plain-Scala argmin, with codegen ON and OFF") {
    import graft.functions.PqEncode
    // 2 subspaces x 3 centroids x 2 dims; vectors chosen to exercise
    // ties (strict < keeps the lowest cid) and the short-array zero-pad
    val books: Seq[Seq[(Int, Array[Double])]] = Seq(
      Seq((0, Array(1.0, 0.0)), (1, Array(0.0, 1.0)), (2, Array(-1.0, 0.0))),
      Seq((0, Array(0.5, 0.5)), (1, Array(-0.5, -0.5)), (2, Array(0.0, 0.0))))
    val vecs = Seq(
      (1L, Seq(3f, 0f, 1f, 1f)),
      (2L, Seq(0f, -2f, -1f, -1f)),
      (3L, Seq(-1f, 0f, 0f, 0f)),   // subspace 2 all-zero: tie across cents
      (4L, Seq(2f, 0f, 0f)))        // short array: dim 4 zero-padded
    def reference(v: Seq[Float]): Seq[Int] = {
      val nrm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      books.zipWithIndex.map { case (book, s) =>
        // minBy keeps the FIRST minimum — book is cid-ascending, so ties
        // resolve to the lowest cid, same as the expression's strict <
        book.minBy { case (_, cent) =>
          cent.indices.map { j =>
            val idx = s * 2 + j
            val x = if (idx < v.length) v(idx) / nrm else 0.0
            val d = x - cent(j); d * d
          }.sum
        }._1
      }
    }
    val df = vecs.toDF("id", "v")
    def run(): Map[Long, Seq[Int]] = df
      .select($"id", PqEncode.codes($"v", books).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    val conf = spark.conf
    val on = run()
    val prevWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val off =
      try {
        conf.set("spark.sql.codegen.wholeStage", "false")
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        run()
      } finally {
        conf.set("spark.sql.codegen.wholeStage", prevWs)
        conf.set("spark.sql.codegen.factoryMode", prevFm)
      }
    val want = vecs.map { case (id, v) => id -> reference(v) }.toMap
    assert(on == want, "doGenCode path diverges from the Scala argmin")
    assert(off == want, "nullSafeEval path diverges from the Scala argmin")
  }

  test("PqAdc matches the HOF fold, with codegen ON and OFF") {
    import graft.functions.PqAdc
    import org.apache.spark.sql.functions._
    val k = 4
    // 3 subspaces x 4 centroids; qtab values non-commutative-friendly
    // doubles so an accumulation-order change would show
    val rows = Seq(
      (1L, Seq(0, 3, 1), (0 until 12).map(i => 1.0 / (i + 3))),
      (2L, Seq(3, 0, 2), (0 until 12).map(i => math.Pi * (i - 5))),
      (3L, Seq(1, 1, 1), (0 until 12).map(i => 1e15 + i * 0.1)))
    val df = rows.toDF("id", "codes", "qtab")
    def run(native: Boolean): Map[Long, Double] = df
      .select($"id",
        (if (native) PqAdc.adc($"codes", $"qtab", k)
         else aggregate(sequence(lit(0), lit(2)), lit(0.0), (acc, s) =>
           acc + element_at($"qtab",
             s.cast("int") * lit(k) + element_at($"codes", s.cast("int") + 1) + 1)))
          .as("adc"))
      .as[(Long, Double)].collect().toMap
    val conf = spark.conf
    val hof = run(native = false)
    val on = run(native = true)
    val prevWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val off =
      try {
        conf.set("spark.sql.codegen.wholeStage", "false")
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        run(native = true)
      } finally {
        conf.set("spark.sql.codegen.wholeStage", prevWs)
        conf.set("spark.sql.codegen.factoryMode", prevFm)
      }
    assert(on == hof, "doGenCode path diverges from the HOF fold")
    assert(off == hof, "nullSafeEval path diverges from the HOF fold")
  }

  test("MinHashSig: empty shingle array yields the all-MaxValue signature") {
    import graft.functions.MinHashSig
    val sig = Seq((9L, Seq.empty[Long])).toDF("doc_id", "sh")
      .select(MinHashSig.minhashSig($"sh", n).as("sig"))
      .as[Seq[Long]].head()
    assert(sig == Seq.fill(n)(Long.MaxValue))
  }

  test("UniqUpToAgg: exact below cap, sentinel above, nulls ignored") {
    import graft.functions.UniqUpToAgg
    // group A: 3 distinct (+dups +null) → exact 3; group B: 7 distinct
    // under cap 5 → sentinel 6; group C: exactly the cap → exact 5
    val rows =
      Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L)).map(t => (t._1, Some(t._2))) ++
      Seq(("a", None)) ++
      (1L to 7L).map(v => ("b", Some(v))) ++
      (1L to 5L).map(v => ("c", Some(v)))
    val got = rows.toDF("g", "k")
      .groupBy($"g").agg(UniqUpToAgg.uniqUpTo($"k", 5).as("u"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 6L, "c" -> 5L), got.toString)
    // repartitioned (forced partial+merge path) agrees — merge is capped
    val merged = rows.toDF("g", "k").repartition(8)
      .groupBy($"g").agg(UniqUpToAgg.uniqUpTo($"k", 5).as("u"))
      .as[(String, Long)].collect().toMap
    assert(merged == got)
  }

  test("BottomKAgg equals the window row_number formulation") {
    import graft.functions.BottomKAgg
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 500L).map(i => (i % 3, i * 2654435761L, i))
    val df = rows.toDF("g", "k", "id")
    val sketch = df.repartition(11).groupBy($"g")
      .agg(BottomKAgg.bottomK($"k", $"id", 7).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    val w = Window.partitionBy($"g").orderBy($"k", $"id")
    val window = df.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 7).groupBy($"g")
      .agg(sort_array(collect_list(struct($"rk", $"id"))).as("s"))
      .select($"g", expr("transform(s, x -> x.id)").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sketch == window, s"sketch=$sketch window=$window")
  }

  test("BottomKAgg: duplicate pairs once, short groups, merge-invariant") {
    import graft.functions.BottomKAgg
    // group a: dup (key,id) pair + a null key; group b: 2 rows under k
    val rows = Seq(
      ("a", Some(5L), 100L), ("a", Some(5L), 100L), ("a", Some(1L), 200L),
      ("a", None, 999L), ("a", Some(3L), 50L),
      ("b", Some(9L), 1L), ("b", Some(2L), 2L))
    val run = (parts: Int) => rows.toDF("g", "k", "id").repartition(parts)
      .groupBy($"g").agg(BottomKAgg.bottomK($"k", $"id", 3).as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    val one = run(1)
    assert(one == Map("a" -> Seq(200L, 50L, 100L), "b" -> Seq(2L, 1L)), one.toString)
    assert(run(9) == one)
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

  test("MisraGriesAgg: exact below the counter budget, partition-invariant") {
    import graft.functions.MisraGriesAgg
    val rows = (1 to 2000).map(i => (s"item${i % 20}", (i % 7 + 1).toLong))
    def run(parts: Int) = rows.toDF("item", "w").repartition(parts)
      .agg(MisraGriesAgg.topKWeighted($"item", $"w", 64, 30).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est").as[(String, Long)].collect().toSeq
    val got = run(1)
    val truth = rows.groupMapReduce(_._1)(_._2)(_ + _)
    val want = truth.toSeq.sortBy { case (i, c) => (-c, i) }
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(run(13) == got, "partition-count dependence")
  }

  test("MisraGriesAgg above the cap: never overcounts, bounded undercount, heavy hitters kept") {
    import graft.functions.MisraGriesAgg
    val m = 8
    // zipf-ish: item j has weight total ~ 4000/j for j = 1..100
    val rows = (1 to 100).flatMap(j =>
      Seq.tabulate(40)(t => (s"i$j", (100L / j) + (t % 3))))
    val truth = rows.groupMapReduce(_._1)(_._2)(_ + _)
    val w = truth.values.sum
    val got = rows.toDF("item", "w").repartition(7)
      .agg(MisraGriesAgg.topKWeighted($"item", $"w", m, m).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est").as[(String, Long)].collect().toMap
    val eps = w / (m + 1)
    got.foreach { case (i, est) =>
      assert(est <= truth(i), s"$i overcounted: $est > ${truth(i)}")
      assert(est >= truth(i) - eps, s"$i undercount beyond W/(m+1): $est vs ${truth(i)}")
    }
    // every item with true weight > W/(m+1) must be retained
    truth.filter(_._2 > eps).keys.foreach(i =>
      assert(got.contains(i), s"heavy hitter $i evicted"))
  }
}
