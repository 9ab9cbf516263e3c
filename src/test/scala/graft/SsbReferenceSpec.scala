package graft

import graft.plans.SsbReferenceStar
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end reference-parity check: generate a deterministic
  * dbgen-shaped dataset, run the exact reference star + Q1 flight, and
  * cross-check every answer against an independent in-memory
  * computation (the reference's golden-answer methodology, SURVEY §5). */
class SsbReferenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // deterministic LCG, no RNG
  private var st = 0x5EED5EEDL
  private def nxt(bound: Int): Int = {
    st = st * 6364136223846793005L + 1442695040888963407L
    (((st >>> 33) % bound).toInt + bound) % bound
  }

  case class Lo(ok: Long, ln: Int, cust: Long, part: Long, supp: Long,
      date: String, qty: Int, price: Long, disc: Int)

  private lazy val (dir, rows) = {
    val d = java.nio.file.Files.createTempDirectory("graft-ssb")
    val rows = (1 to 400).map { i =>
      val y = 1992 + nxt(4) // 1992..1995
      val m = 1 + nxt(12)
      val day = 1 + nxt(28)
      Lo(i / 4 + 1, i % 4 + 1, nxt(30) + 1, nxt(40) + 1, nxt(10) + 1,
        f"$y%04d-$m%02d-$day%02d", 1 + nxt(50), 100000 + nxt(4000000), nxt(11))
    }
    def w(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(d.resolve(name), lines.mkString("", "\n", "\n"))
    w("lineorder.tbl", rows.map(r =>
      s"${r.ok}|${r.ln}|${r.cust}|${r.part}|${r.supp}|${r.date}|3-MEDIUM|0|" +
        s"${r.qty}|${r.price}|${r.price * 4}|${r.disc}|${r.price}|${r.price / 2}|3|${r.date}|TRUCK"))
    w("customer.tbl", (1 to 30).map(i =>
      s"$i|Customer#$i|addr$i|CITY_${i % 10}|NATION_${i % 5}|REGION_${i % 3}|phone|SEG${i % 4}"))
    w("supplier.tbl", (1 to 10).map(i =>
      s"$i|Supplier#$i|addr$i|CITY_${i % 10}|NATION_${i % 5}|REGION_${i % 3}|phone"))
    w("part.tbl", (1 to 40).map(i =>
      s"$i|Part#$i|MFGR#${i % 5}|CAT#${i % 7}|BRAND#${i % 9}|COLOR${i % 6}|TYPE${i % 8}|${i % 50}|CONT${i % 4}"))
    (d.toString, rows)
  }

  test("38-column star with the reference's aliases, row count preserved") {
    val star = SsbReferenceStar.build(spark, dir)
    assert(star.columns.length == 38)
    assert(star.columns.take(3).toSeq == Seq("LO_ORDERKEY", "LO_LINENUMBER", "LO_CUSTKEY"))
    assert(star.columns.contains("C_MKTSEGMENT") && star.columns.contains("P_CONTAINER"))
    assert(star.count() == rows.length) // FK-total joins keep every lineorder
  }

  test("Q1.1/1.2/1.3 match an independent in-memory computation") {
    val star = SsbReferenceStar.build(spark, dir).cache()
    def got(df: org.apache.spark.sql.DataFrame): Option[Long] =
      Option(df.collect()(0)).flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    def year(s: String) = s.take(4).toInt
    def month(s: String) = s.slice(5, 7).toInt
    def isoWeek(s: String) = java.time.LocalDate.parse(s)
      .get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear)

    val w1 = rows.filter(r => year(r.date) == 1993 && r.disc >= 1 && r.disc <= 3 && r.qty < 25)
      .map(r => r.price * r.disc).sum
    val w2 = rows.filter(r => year(r.date) * 100 + month(r.date) == 199401 &&
        r.disc >= 4 && r.disc <= 6 && r.qty >= 26 && r.qty <= 35)
      .map(r => r.price * r.disc).sum
    val w3 = rows.filter(r => isoWeek(r.date) == 6 && year(r.date) == 1994 &&
        r.disc >= 5 && r.disc <= 7 && r.qty >= 26 && r.qty <= 35)
      .map(r => r.price * r.disc).sum

    assert(got(SsbReferenceStar.q1_1(star)).getOrElse(0L) == w1)
    assert(got(SsbReferenceStar.q1_2(star)).getOrElse(0L) == w2)
    assert(got(SsbReferenceStar.q1_3(star)).getOrElse(0L) == w3)
    assert(w1 > 0, "generated data must hit the Q1.1 predicate")
    star.unpersist()
  }
}
