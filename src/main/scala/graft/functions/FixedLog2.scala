package graft.functions

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, LongType}

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
  * never per fact row. Spark-side the device is the codegen'd
  * [[Log2Fix]] expression (one projection per application); the
  * DuckDB oracle keeps the 20-round integer SQL chain, so the hash
  * gate cross-verifies two independent implementations. */
object FixedLog2 {

  /** 2²⁰ — one unit of the returned fixed-point log. */
  val Unit: Long = 1L << 20

  private val FracBits = 20
  private val Scale = 1L << 60 // mantissa fixed-point scale
  private val Top = 1L << 61   // normalization bound: m ∈ [2^60, 2^61)

  /** Domain ceiling (exclusive): the mantissa normalization shifts a
    * LEFT to [2⁶⁰, 2⁶¹), so any input with more than 61 bits would
    * need a negative shift — which Java wraps mod 64 and DuckDB's
    * `<<` does not, so past this bound the two engines would silently
    * diverge. Every entry point rejects a ∉ [1, 2⁶¹) loudly instead.
    * Consumers' worst-case arguments (2·n₁·n₂ rank products ≈ 7×10¹⁷)
    * sit ~3× under this 2⁶¹ ≈ 2.3×10¹⁸ ceiling. */
  val MaxInputExclusive: Long = 1L << 61

  /** JVM twin of the SQL device — the IDENTICAL integer steps, so
    * streaming twins (bounded count-map state replaying the batch
    * tail) land bit-equal to the batch keys. FixedLog2Spec pins
    * l2Long == withLog2 on a magnitude sweep. */
  def l2Long(a: Long): Long = {
    require(a >= 1 && a < MaxInputExclusive,
      s"l2Long domain is [1, 2^61), got $a")
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

  /** The pure-long core behind [[Log2Fix]]'s codegen: the identical 20
    * truncating rounds with the 122-bit square carried as
    * `Math.multiplyHigh` high/low limbs — m < 2⁶¹ so m² < 2¹²², the
    * signed high limb stays < 2⁵⁸, and m²/2⁶⁰ is exactly
    * `(hi << 4) | (lo >>> 60)`. Bit-equal to [[l2Long]]'s BigInt
    * reference (FixedLog2Spec sweeps both) and to the oracle's
    * HUGEINT chain (the hash gate). Inputs outside [1, 2⁶¹) throw
    * ArithmeticException — a negative shift count would wrap mod 64
    * on the JVM and yield silent garbage otherwise. */
  def l2LongFast(a: Long): Long = {
    if (a < 1 || a >= MaxInputExclusive)
      throw new ArithmeticException(
        s"graft_log2fix domain is [1, 2^61), got $a")
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(a)
    var m = a << (61 - bl)
    var f = 0L
    var i = 0
    while (i < FracBits) {
      val hi = Math.multiplyHigh(m, m)
      val lo = m * m
      var m2 = (hi << 4) | (lo >>> 60)
      if (m2 >= Top) { f = f * 2 + 1; m2 >>= 1 } else f *= 2
      m = m2
      i += 1
    }
    (bl - 1).toLong * Unit + f
  }

  /** Adds BIGINT column `out` = L2(`in`) in 2⁻²⁰ units via the
    * codegen'd [[Log2Fix]] expression. `in` must be a positive BIGINT
    * column name (counts ≥ 1).
    *
    * This first shipped as a 62-projection SQL chain (20 × squaring /
    * bit / renormalize `withColumn`s in DECIMAL(38,0)) — semantically
    * identical, but chaining it 4–6 times per query put ~7 s of PURE
    * Catalyst work (analyze/optimize/codegen over hundreds of Project
    * nodes) on every invocation, measured at sf0.001 where the data is
    * negligible. One native expression collapses each application to a
    * single projection; the DuckDB oracle keeps the integer chain
    * ([[duckLog2]]), so the hash gate still cross-verifies the
    * algorithm in two independent implementations. */
  def withLog2(df: DataFrame, in: String, out: String): DataFrame =
    df.withColumn(out,
      GraftBridge.column(Log2Fix(GraftBridge.expression(col(in).cast("long")))))

  /** DuckDB mirror: wraps subquery `from` (which must yield positive
    * BIGINT column `in`), returning SQL that yields every column of
    * `from` plus BIGINT `out` — the identical integer steps (HUGEINT
    * squares, truncating `//`), so the value matches [[withLog2]] bit
    * for bit while being a fully independent implementation. */
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

/** Native Catalyst form of [[FixedLog2]]: BIGINT → BIGINT fixed-point
  * log2 in 2⁻²⁰ units as ONE codegen'd expression (a static call to
  * [[FixedLog2.l2LongFast]] — a 20-iteration long-only loop, no
  * allocation). Registered as `graft_log2fix` by
  * [[graft.GraftExtensions]]. Domain is [1, 2⁶¹): callers clamp with
  * `greatest(c, 1)` and gate zero cells out of the statistic;
  * out-of-domain input throws ArithmeticException from the core
  * rather than returning silent garbage (the SQL registration shares
  * this guard). */
case class Log2Fix(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_log2fix expects bigint, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_log2fix"

  override protected def nullSafeEval(input: Any): Any =
    FixedLog2.l2LongFast(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixedLog2.l2LongFast($c)")

  override protected def withNewChildInternal(newChild: Expression): Log2Fix =
    copy(child = newChild)
}
