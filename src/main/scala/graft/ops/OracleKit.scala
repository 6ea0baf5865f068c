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

  /** Spark's `round(doubleCol, d)` replayed exactly: Spark rounds the
    * SHORTEST decimal representation (java BigDecimal.valueOf) HALF_UP
    * (= half away from zero), while DuckDB's `round(DOUBLE, d)` scales
    * the BINARY value by 10^d first — a multiply whose own rounding can
    * push a near-midpoint quotient onto the other side (the r13 sf0.1
    * sweep caught exactly one such row in ~3.4M rounded values:
    * q_perplexity_kn's avg_nll). DuckDB's CAST(double AS VARCHAR) is the
    * shortest repr and its DECIMAL round is half-away-from-zero, so the
    * VARCHAR→DECIMAL route replays Spark bit-for-bit with no multiply.
    * Use for any rounded column whose input double is cross-engine
    * identical but not itself a short decimal — quotients, exps, sums of
    * unrounded doubles. (Columns that round an already-6-dp value, or
    * whose inputs differ upstream anyway, don't need it.) */
  def sparkRound(x: String, d: Int): String =
    s"CAST(round(CAST(CAST($x AS VARCHAR) AS DECIMAL(38,18)), $d) AS DOUBLE)"

  /** Left-fold cosine, same shape as [[graft.functions.CosineSimilarity]]. */
  def cosSql(a: String, b: String): String =
    s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"

  /** Sequential left-fold sum of a DOUBLE list — the order-faithful replay
    * of a Scala `var s = 0.0; while (...) s += x(i)` accumulation (SQL SUM
    * guarantees no order; list_reduce folds left-to-right). */
  def foldSumSql(listExpr: String): String =
    s"list_reduce($listExpr, (acc, x) -> acc + x)"

  /** The UTF-8 BYTE list of a VARCHAR column — byte-faithful on EVERY
    * corpus (VERDICT r11 #2: replaces the ASCII-only `ord(substr(...))`
    * read and retires the named ASCII guard that made non-ASCII corpora
    * fail the gate loudly instead of joining it). One `str_split_regex`
    * pass to characters, `unicode()` per character, then the codepoint
    * expanded arithmetically to its 1-4 UTF-8 bytes and flattened —
    * exactly the bytes Spark's UTF8String carries into xxhash64 and
    * [[graft.functions.RollingHash]]. Pair with `strlen()` (DuckDB's
    * BYTE length) wherever Spark counts bytes. The empty-string case is
    * guarded (`str_split_regex('', '')` yields [''] whose unicode is
    * -1, not an empty list). */
  def utf8BytesSql(col: String): String =
    s"(CASE WHEN $col IS NULL OR $col = '' THEN CAST([] AS BIGINT[]) ELSE " +
      s"flatten(list_transform(list_transform(str_split_regex($col, ''), ch -> unicode(ch)::BIGINT), cp -> " +
      "CASE WHEN cp < 128 THEN [cp] " +
      "WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64] " +
      "WHEN cp < 65536 THEN [224 + cp // 4096, 128 + (cp // 64) % 64, 128 + cp % 64] " +
      "ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64, 128 + (cp // 64) % 64, 128 + cp % 64] END)) END)"

  /** Signed rolling polynomial hash of the n bytes of byte-list column
    * `blCol` ([[utf8BytesSql]]) starting at 0-based BYTE position column
    * `posCol` — [[graft.functions.RollingHash]]'s per-window value as
    * ONE list_reduce fold (an n-layer nested-projection chain re-copies
    * every carried column — including the byte list — through all n
    * layers; at n = 50 that was the oracle's whole cost). */
  def polyHashFoldSteps(blCol: String, posCol: String, n: Int, base: Long): Seq[(String, String)] = {
    val bytes = s"list_transform(range(1, ${n + 1}), i -> $blCol[($posCol + i)::INT]::UBIGINT)"
    Seq(
      "rhu" -> s"list_reduce($bytes, (a, b) -> ((${mul64("a", base)}::HUGEINT + b) % $M64)::UBIGINT)",
      "hh" -> toSigned64("rhu"))
  }

  // ---- XXH64 over UTF-8 strings (general: stripes + tail) ----

  /** 8-byte little-endian word of byte-list `bl` at 0-based offset `off0`. */
  private def wordSql(bl: String, off0: String): String = {
    val terms = (0 until 8).map(j => s"$bl[$off0 + ${j + 1}]::HUGEINT * ${1L << (8 * j)}").mkString(" + ")
    s"(($terms) % $M64)::UBIGINT"
  }

  private def round64(a: String, w: String): String =
    mul64(rotl(add64(a, mul64(w, P2)), 31), P1)
  private def round64zero(a: String): String =
    mul64(rotl(mul64(a, P2), 31), P1)

  /** Steps computing `hu` = XXH64(utf8Bytes(shCol), seed 42) as UBIGINT —
    * Spark's `xxhash64(stringCol)`, full algorithm (4-lane 32-byte stripes
    * via per-lane list_reduce folds, then the 8/4/1-byte tail). Bytes come
    * from [[utf8BytesSql]] and the length from `strlen` (BYTE count), so
    * the replay is byte-faithful on EVERY corpus — non-ASCII strings hash
    * identically to Spark and JOIN the gate (VERDICT r11 #2; the r10
    * named ASCII guard is retired). */
  def xxhash64StrSteps(shCol: String): Seq[(String, String)] = {
    val v = Seq(42L + P1 + P2, 42L + P2, 42L, 42L - P1)
    val laneSteps = (0 until 4).flatMap { l =>
      Seq(
        s"lw$l" -> s"list_transform(range(0, ns), s -> ${wordSql("bl", s"(32 * s + ${8 * l})")})",
        s"ac$l" -> s"list_reduce(list_prepend(${u(v(l))}::UBIGINT, lw$l), (a, w) -> ${round64("a", "w")})")
    }
    val merges = {
      val m0 = "mg0" -> add64(add64(add64(rotl("ac0", 1), rotl("ac1", 7)), rotl("ac2", 12)), rotl("ac3", 18))
      val rounds = (0 until 4).map { l =>
        s"mg${l + 1}" -> addc(mul64(s"xor(mg$l, ${round64zero(s"ac$l")})", P1), P4)
      }
      m0 +: rounds
    }
    Seq(
      "nb" -> s"strlen($shCol)::BIGINT",
      "bl" -> utf8BytesSql(shCol),
      "ns" -> "nb // 32") ++ laneSteps ++ merges ++ Seq(
      "hb" -> s"CASE WHEN nb >= 32 THEN mg4 ELSE ${u(42L + P5)}::UBIGINT END",
      "hl" -> add64("hb", "nb::UBIGINT"),
      "t0" -> "32 * ns",
      "tw" -> "(nb - t0) // 8",
      "twl" -> s"list_transform(range(0, tw), s -> ${wordSql("bl", "(t0 + 8 * s)")})",
      "h1" -> s"list_reduce(list_prepend(hl, twl), (a, w) -> ${addc(mul64(rotl(s"xor(a, ${round64zero("w")})", 27), P1), P4)})",
      "o4" -> "t0 + 8 * tw",
      "u32" -> ("CASE WHEN o4 + 4 <= nb THEN ((bl[o4 + 1]::HUGEINT + bl[o4 + 2]::HUGEINT * 256" +
        " + bl[o4 + 3]::HUGEINT * 65536 + bl[o4 + 4]::HUGEINT * 16777216))::UBIGINT ELSE 0::UBIGINT END"),
      "h2" -> s"CASE WHEN o4 + 4 <= nb THEN ${addc(mul64(rotl(s"xor(h1, ${mul64("u32", P1)})", 23), P2), P3)} ELSE h1 END",
      "ob" -> "o4 + CASE WHEN o4 + 4 <= nb THEN 4 ELSE 0 END",
      "tbl" -> "list_transform(range(ob, nb), i -> bl[i + 1]::UBIGINT)",
      "h3" -> s"list_reduce(list_prepend(h2, tbl), (a, b) -> ${mul64(rotl(s"xor(a, ${mul64("b", P5)})", 11), P1)})",
      "z1" -> "xor(h3, h3 >> 33)", "z2" -> mul64("z1", P2),
      "z3" -> "xor(z2, z2 >> 29)", "z4" -> mul64("z3", P3),
      "hu" -> "xor(z4, z4 >> 32)")
  }

  // ---- Murmur3_x86_32 (Spark `hash()`) on 32-bit UBIGINT arithmetic ----

  private def rotl32(x: String, r: Int): String =
    s"((($x * ${1L << r}) % 4294967296) + ($x >> ${32 - r}))"
  private def mixK1(k: String): String =
    s"((${rotl32(s"(($k * 3432918353) % 4294967296)", 15)} * 461845907) % 4294967296)"
  private def mixH1(h: String, k: String): String =
    s"(((${rotl32(s"xor($h, $k)", 13)} * 5) + 3864292196) % 4294967296)"
  private def fmix32Steps(h: String, len: Int, p: String, out: String): Seq[(String, String)] = Seq(
    s"${p}a" -> s"xor($h, $len::UBIGINT)",
    s"${p}b" -> s"xor(${p}a, ${p}a >> 16)",
    s"${p}c" -> s"((${p}b * 2246822507) % 4294967296)",
    s"${p}d" -> s"xor(${p}c, ${p}c >> 13)",
    s"${p}e" -> s"((${p}d * 3266489909) % 4294967296)",
    out -> s"xor(${p}e, ${p}e >> 16)")

  /** Steps computing `mh` = signed-INT Spark `hash(longCol, intCol)` from
    * UBIGINT columns `low`/`high` (the long's halves) and `seed` (the int
    * second argument). Spark's multi-arg murmur CHAINS full per-argument
    * hashes: hashInt(seed, hashLong(long, 42)) — the long runs with the
    * FIXED seed 42 and the int argument folds on top (getting this
    * backwards still yields plausible minhash candidates, which is why
    * only the estimate column caught it — see PLANS.md r10). */
  def murmurLongSteps(low: String, high: String, seed: String): Seq[(String, String)] =
    Seq(
      "c1" -> mixH1("42::UBIGINT", mixK1(low)),
      "c2" -> mixH1("c1", mixK1(high))) ++
      fmix32Steps("c2", 8, "cl", "hL") ++
      Seq("d1" -> mixH1("hL", mixK1(seed))) ++
      fmix32Steps("d1", 4, "dm", "qf") :+
      ("mh" -> "(qf::BIGINT - CASE WHEN qf >= 2147483648 THEN 4294967296 ELSE 0 END)::INT")

  /** Steps folding Spark `hash(array<int>)` (seed 42) over the elements of
    * an INT-list column `lst` of fixed length `n` — each element runs the
    * full hashInt (mixK1/mixH1/fmix) with the running hash as its seed. */
  def murmurIntArraySteps(lst: String, n: Int): Seq[(String, String)] = {
    var prev = "42::UBIGINT"
    (0 until n).flatMap { i =>
      val uu = s"w$i" -> s"(($lst[${i + 1}]::HUGEINT + 4294967296) % 4294967296)::UBIGINT"
      val hh = s"v$i" -> mixH1(prev, mixK1(s"w$i"))
      val fm = fmix32Steps(s"v$i", 4, s"f$i", s"bh$i")
      prev = s"bh$i"
      uu +: hh +: fm
    } :+ ("bsu" -> prev)
  }

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
