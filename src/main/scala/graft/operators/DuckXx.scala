package graft.operators

/** DuckDB-SQL replica of Spark's `xxhash64` (XXH64, seed 42) over ASCII
  * strings — the device that moves hash-keyed query keys from the
  * rows-only tier into the driver's hash-exact oracle gate: the oracle
  * RE-DERIVES every 64-bit hash with an independent implementation
  * (HUGEINT modular arithmetic in a recursive CTE) instead of trusting
  * the engine's, the same two-engines-agree discipline as the rest of
  * the oracle surface.
  *
  * Arithmetic notes (all values ride as non-negative HUGEINT < 2⁶⁴):
  *  - mod-2⁶⁴ multiply splits the left operand at 2³² so no
  *    intermediate exceeds ~2⁹⁶ (HUGEINT is signed 128-bit; a direct
  *    (2⁶⁴−1)² product would overflow it);
  *  - rotl(x, r) = (x mod 2⁶⁴⁻ʳ)·2ʳ + x div 2⁶⁴⁻ʳ — exact, disjoint
  *    bit ranges;
  *  - xor round-trips through UBIGINT (DuckDB's xor is defined there);
  *  - byte reads use `ascii(substr(...))`, valid for the fixtures'
  *    ASCII token contract (a non-ASCII token would hash WRONG and
  *    fail the gate loudly — never silently pass);
  *  - only the `len < 32` XXH64 path is emitted (the 8/4/1-byte chunk
  *    loop); a ≥ 32-byte token takes the four-lane path the CTE does
  *    not implement and would likewise fail loudly. Fixture vocabulary
  *    tokens are ≤ ~10 bytes at every tier.
  *
  * Pinned bit-exact against `xxhash64` for the multi-chunk paths
  * (8+8+4+3 bytes) and singles; the consuming oracles re-verify
  * end-to-end per run (`dedup_simhash` hash gate).
  */
private[graft] object DuckXx {

  private val M64 = "18446744073709551616"
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  private def m64(x: String) = s"(($x) % $M64::HUGEINT)"

  private def mul64(a: String, b: String) =
    s"((((($a) % 4294967296::HUGEINT) * ($b)) + " +
      s"((((($a) // 4294967296::HUGEINT) * ($b)) % 4294967296::HUGEINT) * " +
      s"4294967296::HUGEINT)) % $M64::HUGEINT)"

  private def rot(x: String, r: Int) = {
    val lo = BigInt(1) << (64 - r)
    val hi = BigInt(1) << r
    s"(((($x) % $lo::HUGEINT) * $hi::HUGEINT) + (($x) // $lo::HUGEINT))"
  }

  private def xor(a: String, b: String) =
    s"xor(($a)::UBIGINT, ($b)::UBIGINT)::HUGEINT"

  /** Little-endian read of `w` bytes at 1-based offset i+1 of `token`,
    * zero-padded past the end (never actually read past it — the step
    * CASE guards — but kept total so the projection is evaluable). */
  private def le(w: Int): String =
    (0 until w).map { j =>
      s"(CASE WHEN i::BIGINT + ${j + 1} <= n::BIGINT THEN " +
        s"ascii(substr(token, i::BIGINT + ${j + 1}, 1)) ELSE 0 END::HUGEINT * " +
        s"${BigInt(256).pow(j)}::HUGEINT)"
    }.mkString("(", " + ", ")")

  private def avalanche(x: String): String = {
    val a = mul64(xor(x, s"(($x) // 8589934592::HUGEINT)"), P2)   // >> 33
    val b = mul64(xor(a, s"(($a) // 536870912::HUGEINT)"), P3)    // >> 29
    xor(b, s"(($b) // 4294967296::HUGEINT)")                      // >> 32
  }

  private val acc8 =
    m64(s"${mul64(rot(xor("acc", mul64(rot(mul64("k8", P2), 31), P1)), 27), P1)} + $P4")
  private val acc4 =
    m64(s"${mul64(rot(xor("acc", mul64("k4", P1)), 23), P2)} + $P3")
  private val acc1 =
    m64(s"${mul64(rot(xor("acc", mul64("k1", P5)), 11), P1)}")

  /** CTE fragment computing `(token, h: UBIGINT)` — xxhash64 of every
    * row of a `dt(token)` CTE that must precede it. Emit inside a
    * `WITH RECURSIVE` list; the fragment defines CTEs `st` and `xx`. */
  def xxCte: String =
    s"""st AS (
       |  SELECT token, length(token)::HUGEINT AS n, 0::HUGEINT AS i,
       |         ${m64(s"42::HUGEINT + $P5 + length(token)::HUGEINT")} AS acc
       |  FROM dt
       |  UNION ALL
       |  SELECT token, n, i + step AS i,
       |         CASE WHEN step = 8 THEN $acc8
       |              WHEN step = 4 THEN $acc4
       |              ELSE $acc1 END AS acc
       |  FROM (
       |    SELECT token, n, i, acc,
       |           CASE WHEN n - i >= 8 THEN 8::HUGEINT
       |                WHEN n - i >= 4 THEN 4::HUGEINT
       |                ELSE 1::HUGEINT END AS step,
       |           ${le(8)} AS k8, ${le(4)} AS k4,
       |           (CASE WHEN i < n THEN ascii(substr(token, i::BIGINT + 1, 1))
       |                 ELSE 0 END)::HUGEINT AS k1
       |    FROM st WHERE i < n)),
       |xx AS (SELECT token, (${avalanche("acc")})::UBIGINT AS h
       |       FROM st WHERE i = n)""".stripMargin

  /** Signed-BIGINT view of an unsigned 64-bit HUGEINT expression (the
    * two's-complement value Spark's BIGINT columns carry). */
  def signed64(x: String): String =
    s"CASE WHEN ($x) >= 9223372036854775808::HUGEINT " +
      s"THEN (($x) - $M64::HUGEINT)::BIGINT ELSE ($x)::BIGINT END"

  /** Unsigned-HUGEINT view of a signed BIGINT column. */
  def unsigned64(col: String): String =
    s"(CASE WHEN $col < 0 THEN ($col)::HUGEINT + $M64::HUGEINT " +
      s"ELSE ($col)::HUGEINT END)"

  // ---- Closed-form chain hashing (longs/ints, no recursion) ------------
  // Spark's xxhash64 over multiple/array children seed-CHAINS one fixed
  // XXH64 block per element: result = 42; for each long child, result =
  // hashLong(child, result); an int literal takes the 4-byte block.
  // Both blocks are closed-form (~10 mod-2⁶⁴ steps), so shingle/gram
  // hashes (xxhash64 over a slice of per-token hashes) and MinHash
  // seeds (xxhash64(h, seedLit)) replay WITHOUT recursion — but NOT as
  // one nested expression: textual substitution multiplies the operand
  // ~32× through the avalanche, and DuckDB then walks a ~100 KB
  // interpreted tree per row (measured minutes at sf0.01). The steps
  // are therefore STAGED: each emits one small column expression over
  // the previous step's COLUMN, composed via [[staged]] into nested
  // projections DuckDB vectorizes normally (measured seconds).

  /** The XXH64 8-byte block + avalanche as staged (column, expr) steps:
    * final column `prefix` minus its trailing '_' holds
    * hashLong(vCol, seedCol). */
  def xxLongSteps(v: String, seed: String, p: String): Seq[(String, String)] = Seq(
    s"${p}m1" -> mul64(v, P2),
    s"${p}r1" -> rot(s"${p}m1", 31),
    s"${p}m2" -> mul64(s"${p}r1", P1),
    s"${p}a0" -> m64(s"($seed) + $P5 + 8::HUGEINT"),
    s"${p}x1" -> xor(s"${p}a0", s"${p}m2"),
    s"${p}r2" -> rot(s"${p}x1", 27),
    s"${p}m3" -> m64(mul64(s"${p}r2", P1) + s" + $P4"),
    s"${p}v1" -> mul64(xor(s"${p}m3", s"(${p}m3 // 8589934592::HUGEINT)"), P2),
    s"${p}v2" -> mul64(xor(s"${p}v1", s"(${p}v1 // 536870912::HUGEINT)"), P3),
    p.dropRight(1) -> xor(s"${p}v2", s"(${p}v2 // 4294967296::HUGEINT)"))

  /** The XXH64 4-byte block + avalanche, staged — `hashInt(sdCol,
    * pfxCol)` where pfxCol already holds (seed + P5 + 4) mod 2⁶⁴
    * (shared across seeds) and sdCol is the int value. Final column =
    * `prefix` minus '_'. */
  def xxIntSteps(sd: String, pfx: String, p: String): Seq[(String, String)] = Seq(
    s"${p}x1" -> xor(pfx, mul64(s"($sd)::HUGEINT", P1)),
    s"${p}r1" -> rot(s"${p}x1", 23),
    s"${p}m1" -> m64(mul64(s"${p}r1", P2) + s" + $P3"),
    s"${p}v1" -> mul64(xor(s"${p}m1", s"(${p}m1 // 8589934592::HUGEINT)"), P2),
    s"${p}v2" -> mul64(xor(s"${p}v1", s"(${p}v1 // 536870912::HUGEINT)"), P3),
    p.dropRight(1) -> xor(s"${p}v2", s"(${p}v2 // 4294967296::HUGEINT)"))

  /** The shared 4-byte-block seed prefix: (h + P5 + 4) mod 2⁶⁴. */
  def intBlockPrefix(h: String): String = m64(s"($h) + $P5 + 4::HUGEINT")

  /** Compose staged steps into one CTE: nested one-column projections
    * over `baseSql`, keeping `keep` at the end. MATERIALIZED — every
    * consumer CTE downstream references these more than once, and
    * DuckDB inlines plain CTEs (re-running the whole chain per
    * reference; measured minutes → seconds). */
  def staged(baseSql: String, keep: String, steps: Seq[(String, String)],
      alias: String): String =
    s"$alias AS MATERIALIZED (${stagedSelect(baseSql, keep, steps)})"

  /** The bare staged SELECT (no CTE wrapper) — for recursion arms,
    * where the staged chain must sit inside the recursive term. */
  def stagedSelect(baseSql: String, keep: String,
      steps: Seq[(String, String)]): String = {
    val q = steps.foldLeft(baseSql) { case (acc, (name, ex)) =>
      s"SELECT *, $ex AS $name FROM ($acc)"
    }
    s"SELECT $keep FROM ($q)"
  }

  /** Staged chain of [[xxLongSteps]] over columns `cols` starting from
    * seed 42 — xxhash64 of a fixed-length long array whose elements sit
    * in those columns. Final column: `out`. */
  def xxChainSteps(cols: Seq[String], out: String): Seq[(String, String)] = {
    val steps = cols.zipWithIndex.flatMap { case (c, i) =>
      xxLongSteps(c, if (i == 0) "42::HUGEINT" else s"${out}c$i",
        s"${out}c${i + 1}_")
    }
    // rename the last chain column to `out`
    steps.dropRight(1) :+ (out -> steps.last._2)
  }
}
