package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Deterministic fixed-point base-2 logarithm of a positive BIGINT —
  * the device that lets LOG-based statistics (entropy, mutual
  * information, Theil's U) be ORACLE-PAIRED rather than rows-only.
  *
  * Why not `log2(x)`: libm transcendentals are only guaranteed within
  * 1 ulp, and the JVM intrinsic and DuckDB's std::log may disagree on
  * the last bit for some arguments, so any hash gate over a log-based
  * statistic would flake. This computes log2 in PURE INTEGER
  * arithmetic instead — both engines execute the identical truncating
  * integer steps, so the result is equal by construction:
  *
  *   1. integer part  e = bitlen(a) − 1  (via `length(bin(a))` — the
  *      `text_lm_bits` floor-log2 device, TextAnalysis.scala:316-321);
  *   2. mantissa at fixed-point scale 2⁶⁰: m = a << (61 − bitlen) ∈
  *      [2⁶⁰, 2⁶¹) — exact, no truncation (BIGINT holds 2⁶¹);
  *   3. 20 SQUARING rounds: m ← m²/2⁶⁰ (truncating); if the result
  *      reaches 2⁶¹ the next output bit is 1 and m halves, else 0 —
  *      the classical shift-and-square binary logarithm. The square
  *      peaks at 2¹²² which rides DECIMAL(38,0) (Spark, max ~10³⁸ ≈
  *      2¹²⁶) and HUGEINT (DuckDB, 2¹²⁷); the truncating division is
  *      identical in both engines for non-negative operands (Spark
  *      `div` == DuckDB `//`).
  *
  * Output: L2(a) = e·2²⁰ + frac, a BIGINT in 2⁻²⁰ units. Truncation
  * error relative to true log2: the per-round loss is ≤ 2⁻⁶⁰ of the
  * mantissa and doubles each squaring, so after 20 rounds the
  * accumulated error is < 2⁻⁴⁰ — the 20 emitted bits equal the true
  * bits except within 2⁻⁴⁰ of a carry boundary, and either way both
  * engines emit the SAME bits. |L2(a)/2²⁰ − log2(a)| ≤ 2⁻²⁰ + 2⁻⁴⁰
  * (checked by FixedLog2Spec against Math.log on random inputs).
  *
  * Scale: callers apply this to BOUNDED frames only (contingency
  * cells, per-group counts — dozens to value-domain-bounded rows),
  * never per fact row; the 60 generated projections collapse to one
  * codegen stage under CollapseProject. */
object FixedLog2 {

  /** 2²⁰ — one unit of the returned fixed-point log. */
  val Unit: Long = 1L << 20

  private val FracBits = 20
  private val Scale = 1L << 60 // mantissa fixed-point scale
  private val Top = 1L << 61   // normalization bound: m ∈ [2^60, 2^61)

  /** JVM twin of the SQL device — the IDENTICAL integer steps, so
    * streaming twins (bounded count-map state replaying the batch
    * tail) land bit-equal to the batch keys. FixedLog2Spec pins
    * l2Long == withLog2 on a magnitude sweep. */
  def l2Long(a: Long): Long = {
    require(a >= 1, s"l2Long needs a positive count, got $a")
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(a)
    var m = BigInt(a) << (61 - bl)
    var f = 0L
    (1 to FracBits).foreach { _ =>
      val m2 = (m * m) >> 60
      if (m2 >= (BigInt(1) << 61)) { f = f * 2 + 1; m = m2 >> 1 }
      else { f = f * 2; m = m2 }
    }
    (bl - 1).toLong * Unit + f
  }

  /** Adds BIGINT column `out` = L2(`in`) in 2⁻²⁰ units. `in` must be a
    * positive BIGINT column name (counts ≥ 1). */
  def withLog2(df: DataFrame, in: String, out: String): DataFrame = {
    val m = s"__m_$out"
    val f = s"__f_$out"
    val m2 = s"__m2_$out"
    var d = df
      .withColumn(m, expr(s"shiftleft(CAST($in AS BIGINT), 61 - length(bin($in)))"))
      .withColumn(f, expr("CAST(0 AS BIGINT)"))
    (1 to FracBits).foreach { _ =>
      d = d
        .withColumn(m2, expr(
          s"CAST((CAST($m AS DECIMAL(38,0)) * CAST($m AS DECIMAL(38,0))) div CAST($Scale AS DECIMAL(38,0)) AS BIGINT)"))
        .withColumn(f, expr(s"$f * 2 + IF($m2 >= $Top, 1, 0)"))
        .withColumn(m, expr(s"IF($m2 >= $Top, $m2 div 2, $m2)"))
    }
    d.withColumn(out,
        expr(s"(CAST(length(bin($in)) AS BIGINT) - 1) * ${Unit}L + $f"))
      .drop(m, f, m2)
  }

  /** DuckDB mirror: wraps subquery `from` (which must yield positive
    * BIGINT column `in`), returning SQL that yields every column of
    * `from` plus BIGINT `out` — the identical integer steps, so the
    * value matches [[withLog2]] bit for bit. */
  def duckLog2(from: String, in: String, out: String): String = {
    var q = s"SELECT *, ($in << (61 - length(bin($in))))::BIGINT AS __m," +
      s" 0::BIGINT AS __f FROM ($from)"
    (1 to FracBits).foreach { _ =>
      q = s"SELECT * EXCLUDE (__m, __f, __m2)," +
        s" CASE WHEN __m2 >= $Top THEN __m2 // 2 ELSE __m2 END AS __m," +
        s" __f * 2 + (CASE WHEN __m2 >= $Top THEN 1 ELSE 0 END) AS __f" +
        s" FROM (SELECT *, ((__m::HUGEINT * __m::HUGEINT) //" +
        s" ${Scale}::HUGEINT)::BIGINT AS __m2 FROM ($q))"
    }
    s"SELECT * EXCLUDE (__m, __f)," +
      s" (length(bin($in)) - 1)::BIGINT * $Unit + __f AS $out FROM ($q)"
  }
}
