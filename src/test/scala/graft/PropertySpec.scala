package graft

import graft.functions.VectorOps
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants (SURVEY.md §5): properties that must hold for
  * any input, checked over ScalaCheck-generated data through the real
  * operators (seeded for reproducibility; the scalatest-scalacheck
  * bridge isn't in the offline dependency cache, so Gen is driven
  * directly). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forAll[T](g: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  test("filter partition: count(p) + count(!p) == count") {
    forAll(Gen.chooseNum(-100.0, 600.0)) { threshold =>
      val ev = graft.sources.Tables.events(spark, TestSpark.Sf)
      val n = ev.count()
      val p = ev.filter($"value" > threshold).count()
      val np = ev.filter(!($"value" > threshold) || $"value".isNull).count()
      assert(p + np == n)
    }
  }

  test("sum linearity: sum(a*x) == a * sum(x) on exact integer domain") {
    forAll(Gen.chooseNum(1L, 1000L)) { a =>
      val li = graft.sources.Tables.lineitem(spark, TestSpark.Sf)
      val sx = li.agg(sum($"l_quantity".cast("long"))).as[Long].head()
      val sax = li.agg(sum($"l_quantity".cast("long") * a)).as[Long].head()
      assert(sax == a * sx)
    }
  }

  test("dedup idempotence: exact dedup of deduped output is a fixpoint") {
    val once = Dedup.exact(spark, TestSpark.Sf).cache()
    val again = once.groupBy($"fp")
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
    assert(again.count() == once.count())
    assert(again.filter($"n_copies" =!= 1).count() == 0)
    once.unpersist()
  }

  test("cosine symmetry and self-similarity on generated vectors") {
    val gen = Gen.listOfN(8, Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f)))
    forAll(gen) { vecs =>
      whenever(vecs.nonEmpty && vecs.forall(v => v.exists(x => math.abs(x) > 1e-3))) {
        val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
          .toDF("id", "embedding")
        val a = df.select($"id".as("ia"), $"embedding".as("ea"))
        val b = df.select($"id".as("ib"), $"embedding".as("eb"))
        val pairs = a.join(b)
          .select($"ia", $"ib", VectorOps.dot("ea", "eb").as("d"))
          .as[(Long, Long, Double)].collect()
        val m = pairs.map { case (i, j, d) => (i, j) -> d }.toMap
        // dot symmetric bit-for-bit; self-dot non-negative
        m.foreach { case ((i, j), d) =>
          assert(java.lang.Double.doubleToLongBits(d) ==
            java.lang.Double.doubleToLongBits(m((j, i))))
        }
        vecs.indices.foreach(i => assert(m((i.toLong, i.toLong)) >= 0.0))
      }
    }
  }

  test("jaccard bounds: all reported similarities lie in (0, 1]") {
    val j = Dedup.ngramJaccard(spark, TestSpark.Sf)
      .select($"jaccard").as[Double].collect()
    assert(j.forall(x => x > 0.0 && x <= 1.0))
  }

  test("containment losslessness: filters recover brute force on random corpora") {
    // planted sub-documents: prefixes of longer docs (containment ≈ 1.0)
    // plus prefix-with-one-edit variants straddling the 0.9 threshold
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "p", "q")
    val corpusGen = for {
      base <- Gen.listOfN(8, Gen.chooseNum(15, 50).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)).map(_.toVector)))
      cuts <- Gen.listOfN(4, Gen.chooseNum(8, 14))
      edits <- Gen.listOfN(4, Gen.chooseNum(0, 1))
    } yield {
      val subs = base.take(4).zip(cuts).zip(edits).map { case ((t, cut), k) =>
        val prefix = t.take(math.min(cut, t.size))
        (0 until math.min(k, prefix.size))
          .foldLeft(prefix)((v, i) => v.updated(i, "z"))
      }
      (base ++ subs).zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
    }
    forAll(corpusGen, n = 5) { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val sh = Dedup.hashedShinglesOf(docs)
      val got = Dedup.containmentOf(sh)
        .select($"doc_a", $"doc_b", $"containment").as[(Long, Long, Double)]
        .collect().map { case (a, b, c) => (a, b) -> c }.toMap
      val sets = sh.as[(Long, Array[Long])].collect()
        .map { case (id, s) => id -> s.toSet }.sortBy(_._1)
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets
        if a != b && sa.nonEmpty
        common = (sa & sb).size
        if common * 10 >= sa.size * 9
      } yield (a, b) -> common.toDouble / sa.size).toMap
      assert(got == want,
        s"missed=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    }
  }

  test("PPJoin losslessness: filters recover the brute-force pair set on random corpora") {
    // adversarial corpora: small shared vocabulary + planted near-dups
    // (copy with 0-2 token edits) so true pairs straddle the threshold;
    // brute-force reference computed in plain Scala over hashed shingles
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen = for {
      n <- Gen.chooseNum(5, 40)
      toks <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield toks.mkString(" ")
    val corpusGen = for {
      base <- Gen.listOfN(12, docGen)
      edits <- Gen.listOfN(6, Gen.chooseNum(0, 2))
    } yield {
      val dups = base.take(6).zip(edits).map { case (text, k) =>
        val t = text.split(" ").toVector
        // mutate the first k tokens: a high-but-not-1.0 jaccard near-dup
        (0 until math.min(k, t.size)).foldLeft(t)((v, i) => v.updated(i, "z")).mkString(" ")
      }
      (base ++ dups).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    }
    forAll(corpusGen, n = 5) { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val sh = Dedup.hashedShinglesOf(docs)
      val got = Dedup.ngramJaccardOf(sh)
        .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)]
        .collect().map { case (a, b, j) => (a, b) -> j }.toMap
      // plain-Scala brute force over the SAME hashed shingle sets
      val sets = sh.as[(Long, Array[Long])].collect()
        .map { case (id, s) => id -> s.toSet }.sortBy(_._1)
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        common = (sa & sb).size
        union = sa.size + sb.size - common
        j = common.toDouble / union if union > 0 && j >= 0.8
      } yield (a, b) -> j).toMap
      assert(got == want,
        s"missed=${(want.keySet -- got.keySet).take(3)} extra=${(got.keySet -- want.keySet).take(3)}")
    }
  }

  test("inner-join row count: star rows == lineitem rows under FK totality") {
    val li = graft.sources.Tables.lineitem(spark, TestSpark.Sf).count()
    val star = graft.plans.Star.build(spark, TestSpark.Sf).count()
    // every lineitem key resolves in each dimension on the fixture
    assert(star == li)
  }

  test("year-partitioned star: read-back prunes to one partition directory") {
    val df = graft.operators.Extras.starPartitionPruned(spark, TestSpark.Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("order_year"), s"partition filter missing:\n$plan")
    // the pruned scan must NOT carry the year predicate as a data filter
    assert(!plan.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      "filter should resolve via partitions, not row groups")
  }

  test("star materialization round-trip (O4 CTAS path)") {
    val out = java.nio.file.Files.createTempDirectory("graft-star").toString
    graft.plans.Star.materialize(spark, TestSpark.Sf, s"$out/star")
    val re = spark.read.parquet(s"$out/star")
    assert(re.count() == graft.plans.Star.build(spark, TestSpark.Sf).count())
    assert(re.columns.toSeq ==
      graft.plans.Star.build(spark, TestSpark.Sf).columns.toSeq)
  }
}
