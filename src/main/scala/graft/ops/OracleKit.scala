package graft.ops

/** Shared DuckDB-SQL generators that replay Spark-internal primitives the
  * oracle engine lacks — the pieces that kept the last rows-only queries off
  * the full hash gate ("the portability floor" of PLANS.md r10):
  *
  *  - '''xxhash64 on longs''': Spark's `xxhash64(id)` / `xxhash64(id, k)` is
  *    XXH64's fixed-width path (8-byte word, then a 4-byte int for the
  *    literal second arg), closed-form — ~24 arithmetic steps. DuckDB has no
  *    xxhash64, but it has HUGEINT: every wrapping 64-bit op is replayed as
  *    128-bit arithmetic mod 2^64 (wrapping multiply splits into 32-bit
  *    halves; rotations become multiply-by-2^r plus a right shift; DuckDB's
  *    native `<<` overflow-checks, so it is never used). Emitted as ONE
  *    nested subquery per step: DuckDB inlines lateral column aliases
  *    textually — a flat alias chain re-expands each step into its
  *    predecessors and planning goes exponential (measured: 24 steps never
  *    finished binding) — whereas nested projections bind linearly.
  *
  *  - '''Spark decimal means''': `sum(x.cast(DecimalType(38,18))) / count`
  *    then `.cast("double")`, the centroid-update arithmetic of
  *    [[Similarity.fitKmeansCodebook]]. Three semantics have to be replayed
  *    exactly, measured against the real corpus (see OracleKitSpec):
  *    (a) Spark's double→decimal cast rounds the SHORTEST decimal
  *    representation (java `BigDecimal.valueOf`), not the exact binary
  *    value — DuckDB's direct cast uses the exact value and disagrees on
  *    78% of real embedding components, but its double→VARCHAR→DECIMAL
  *    route is shortest-repr + HALF_UP and agreed on all 31,995 of them;
  *    (b) the division must round HALF_UP at scale 18 — DuckDB's decimal
  *    division returns DOUBLE, so the mean is computed on the scale-18
  *    integer in HUGEINT ((2|T|+n) div 2n, sign restored);
  *    (c) decimal→double is java `BigDecimal.doubleValue`: a fast path
  *    `(double)unscaled / 1e18` below 2^52, else a correctly-rounded
  *    string parse — both branches replayed verbatim.
  *
  * Built on these, [[kmeansCtes]] replays the whole deterministic Lloyd
  * fit of [[Similarity.fitKmeansCodebook]] — hash-ordered init, cosine
  * argmax assignment with ties to the lowest cell id, exact decimal
  * centroid means, empty cells keeping their centroid — bit-identically
  * (validated codebook-vs-codebook at sf0.001/sf0.01, K=8 and K=16).
  */
object OracleKit {

  private val P1 = java.lang.Long.parseUnsignedLong("9E3779B185EBCA87", 16)
  private val P2 = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)
  private val P3 = java.lang.Long.parseUnsignedLong("165667B19E3779F9", 16)
  private val P4 = java.lang.Long.parseUnsignedLong("85EBCA77C2B2AE63", 16)
  private val P5 = java.lang.Long.parseUnsignedLong("27D4EB2F165667C5", 16)
  private val M64 = "18446744073709551616" // 2^64

  private def u(l: Long): String = java.lang.Long.toUnsignedString(l)

  /** Nested-projection chain: one subquery layer per step (name, expr) —
    * the linear-binding alternative to DuckDB's exponentially-inlined
    * lateral aliases. Every layer keeps all columns below it. */
  def nestedProjections(baseSql: String, steps: Seq[(String, String)], keep: String): String = {
    val inner = steps.foldLeft(s"($baseSql)") {
      case (acc, (name, expr)) => s"(SELECT *, $expr AS $name FROM $acc)"
    }
    s"SELECT $keep FROM $inner"
  }

  /** Wrapping 64-bit multiply by a constant, via 32-bit halves in HUGEINT. */
  def mul64(a: String, c: Long): String = {
    val cl = u(c & 0xFFFFFFFFL)
    val ch = u(c >>> 32)
    s"(((($a & 4294967295)::HUGEINT * $cl) + (((($a & 4294967295)::HUGEINT * $ch" +
      s" + ($a >> 32)::HUGEINT * $cl) % 4294967296) * 4294967296)) % $M64)::UBIGINT"
  }

  private def rotl(x: String, r: Int): String =
    s"((($x::HUGEINT * ${1L << r}) % $M64 + ($x >> ${64 - r})::HUGEINT) % $M64)::UBIGINT"

  private def addc(a: String, c: Long): String =
    s"(($a::HUGEINT + ${u(c)}) % $M64)::UBIGINT"

  private def fmix(h: String, p: String): Seq[(String, String)] = Seq(
    s"${p}1" -> s"xor($h, $h >> 33)",
    s"${p}2" -> mul64(s"${p}1", P2),
    s"${p}3" -> s"xor(${p}2, ${p}2 >> 29)",
    s"${p}4" -> mul64(s"${p}3", P3),
    s"${p}5" -> s"xor(${p}4, ${p}4 >> 32)")

  /** Step list computing `hk` = Spark `xxhash64(idCol)` (signed BIGINT) —
    * and, when `seed2` is set, `xxhash64(idCol, lit(seed2))` (the int-typed
    * second literal takes XXH64's 4-byte tail path with the first hash as
    * its seed — exactly Spark's multi-argument chaining). */
  private def xxSteps(idCol: String, seed2: Option[Int]): Seq[(String, String)] = {
    val h0 = u(42L + P5 + 8L)
    val longPath = Seq(
      "xu0" -> s"(($idCol::HUGEINT + $M64) % $M64)::UBIGINT",
      "xm1" -> mul64("xu0", P2),
      "xr1" -> rotl("xm1", 31),
      "xk1" -> mul64("xr1", P1),
      "xh1" -> s"xor($h0::UBIGINT, xk1)",
      "xh2" -> rotl("xh1", 27),
      "xh3" -> mul64("xh2", P1),
      "xh4" -> addc("xh3", P4)) ++ fmix("xh4", "xf")
    val tail = seed2 match {
      case None => Seq("hk" ->
        s"(xf5::HUGEINT - CASE WHEN xf5 >= 9223372036854775808 THEN $M64 ELSE 0 END)::BIGINT")
      case Some(s2) =>
        val g1c = u((s2.toLong & 0xFFFFFFFFL) * P1)
        Seq(
          "xg0" -> addc("xf5", P5 + 4L),
          "xg1" -> s"xor(xg0, $g1c::UBIGINT)",
          "xg2" -> rotl("xg1", 23),
          "xg3" -> mul64("xg2", P2),
          "xg4" -> addc("xg3", P3)) ++ fmix("xg4", "xe") :+ ("hk" ->
          s"(xe5::HUGEINT - CASE WHEN xe5 >= 9223372036854775808 THEN $M64 ELSE 0 END)::BIGINT")
    }
    longPath ++ tail
  }

  /** `SELECT keep, hk FROM ...` over `baseSql`, where hk = xxhash64(idCol)
    * (seed2 = None) or xxhash64(idCol, lit(seed2)), as nested projections. */
  def xxhash64Sql(baseSql: String, idCol: String, keep: String, seed2: Option[Int]): String =
    nestedProjections(baseSql, xxSteps(idCol, seed2), s"$keep, hk")

  /** Signed BIGINT view of an unsigned 64-bit column. */
  def toSigned64(a: String): String =
    s"($a::HUGEINT - CASE WHEN $a >= 9223372036854775808 THEN $M64 ELSE 0 END)::BIGINT"

  /** Wrapping 64-bit add of two variable columns. */
  def add64(a: String, b: String): String =
    s"(($a::HUGEINT + $b::HUGEINT) % $M64)::UBIGINT"

  /** Exact scale-18 integer of Spark's `CAST(x AS DECIMAL(38,18))`. */
  def decScaled18(x: String): String =
    s"CAST(replace(CAST(CAST(CAST($x AS VARCHAR) AS DECIMAL(38,18)) AS VARCHAR), '.', '') AS HUGEINT)"

  /** HALF_UP integer mean of a scaled sum `ts` over count `n` (both HUGEINT). */
  def halfUpDiv(ts: String, n: String): String =
    s"CASE WHEN $ts >= 0 THEN (2 * $ts + $n) // (2 * $n) ELSE -((2 * (-($ts)) + $n) // (2 * $n)) END"

  /** java BigDecimal.doubleValue of a scale-18 integer `ms`. */
  def ms18ToDouble(ms: String): String =
    s"CASE WHEN abs($ms) < 4503599627370496 THEN CAST($ms AS DOUBLE) / 1000000000000000000.0" +
      s" ELSE CAST((CASE WHEN $ms < 0 THEN '-' ELSE '' END ||" +
      s" CAST(abs($ms) // 1000000000000000000 AS VARCHAR) || '.' ||" +
      s" lpad(CAST(abs($ms) % 1000000000000000000 AS VARCHAR), 18, '0')) AS DOUBLE) END"

  /** Left-fold cosine, same shape as [[graft.functions.CosineSimilarity]]. */
  def cosSql(a: String, b: String): String =
    s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"

  /** Sequential left-fold sum of a DOUBLE list — the order-faithful replay
    * of a Scala `var s = 0.0; while (...) s += x(i)` accumulation (SQL SUM
    * guarantees no order; list_reduce folds left-to-right). */
  def foldSumSql(listExpr: String): String =
    s"list_reduce($listExpr, (acc, x) -> acc + x)"

  /** CTE definitions replaying [[Similarity.fitKmeansCodebook]](k, iters) on
    * `vecsSql` (must yield columns id, v — the full fit input; callers rely
    * on the gate-SF corpus being under the 2^20 sample cap, so the
    * adaptive-modulus hash-sample is the identity there). Returns the CTE
    * list and the name of the final codebook CTE (columns cid, cent). */
  def kmeansCtes(vecsSql: String, k: Int, iters: Int, prefix: String = "km"): (Seq[String], String) = {
    val vecs = s"${prefix}_vecs"
    val hx = s"${prefix}_hx"
    val init = s"${prefix}_c0"
    var ctes = Seq(
      s"$vecs AS MATERIALIZED ($vecsSql)",
      s"$hx AS MATERIALIZED (${xxhash64Sql(s"SELECT id, v FROM $vecs", "id", "id, v", Some(7))})",
      s"$init AS MATERIALIZED (SELECT (ROW_NUMBER() OVER (ORDER BY hk, id) - 1)::BIGINT AS cid, v AS cent" +
        s" FROM (SELECT * FROM $hx ORDER BY hk, id LIMIT $k))")
    var prev = init
    for (t <- 1 to iters) {
      val a = s"${prefix}_a$t"; val x = s"${prefix}_x$t"
      val m = s"${prefix}_m$t"; val c = s"${prefix}_c$t"
      ctes ++= Seq(
        // argmax cosine, ties to the lowest cid — nearestCell's struct-max
        s"$a AS MATERIALIZED (SELECT id, v, cid FROM (SELECT s.id, s.v, c.cid," +
          s" ROW_NUMBER() OVER (PARTITION BY s.id ORDER BY ${cosSql("s.v", "c.cent")} DESC, c.cid) AS rn" +
          s" FROM $vecs s CROSS JOIN $prev c) WHERE rn = 1)",
        s"$x AS MATERIALIZED (SELECT cid, generate_subscripts(v, 1) - 1 AS pos, ${decScaled18("unnest(v)")} AS txd FROM $a)",
        s"$m AS MATERIALIZED (SELECT cid, pos, ${ms18ToDouble("ms")} AS m FROM" +
          s" (SELECT cid, pos, ${halfUpDiv("ts", "n")} AS ms FROM" +
          s" (SELECT cid, pos, SUM(txd) AS ts, COUNT(*)::HUGEINT AS n FROM $x GROUP BY cid, pos)))",
        // empty cells keep their previous centroid
        s"$c AS MATERIALIZED (SELECT c.cid, COALESCE(m.cent, c.cent) AS cent FROM $prev c" +
          s" LEFT JOIN (SELECT cid, list(m ORDER BY pos) AS cent FROM $m GROUP BY cid) m ON m.cid = c.cid)")
      prev = c
    }
    (ctes, prev)
  }
}
