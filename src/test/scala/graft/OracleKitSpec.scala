package graft

import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pins the SPARK-side semantics [[graft.ops.OracleKit]]'s DuckDB replays
  * are built on. The cross-engine halves run under the driver's DuckDB
  * gate; these tests freeze the Spark behaviors the generated SQL assumes,
  * so a Spark upgrade that changes any of them fails HERE, not as an
  * unexplained oracle hash mismatch:
  *
  *  1. xxhash64(longCol) and xxhash64(longCol, intLit) are XXH64's
  *     fixed-width 8-byte/4-byte paths with seed 42 and multi-arg
  *     seed-chaining (reimplemented below from the public XXH64 spec);
  *  2. double→DECIMAL(38,18) casts round the SHORTEST decimal
  *     representation (java BigDecimal.valueOf) HALF_UP — not the exact
  *     binary value;
  *  3. the decimal mean sum/count rounds HALF_UP at scale 18, and
  *     decimal→double is java BigDecimal.doubleValue (whose sub-2^52
  *     fast path `(double)unscaled / 1e18` is NOT correctly rounded —
  *     the replay reproduces it branch-for-branch).
  */
class OracleKitSpec extends SparkSpec {

  // --- XXH64 fixed-width model (public spec: Collet, xxHash) ---
  private val P1 = java.lang.Long.parseUnsignedLong("9E3779B185EBCA87", 16)
  private val P2 = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)
  private val P3 = java.lang.Long.parseUnsignedLong("165667B19E3779F9", 16)
  private val P4 = java.lang.Long.parseUnsignedLong("85EBCA77C2B2AE63", 16)
  private val P5 = java.lang.Long.parseUnsignedLong("27D4EB2F165667C5", 16)

  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32; h
  }
  private def hashLong(l: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    h ^= java.lang.Long.rotateLeft(l * P2, 31) * P1
    h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
    fmix(h)
  }
  private def hashInt(i: Int, seed: Long): Long = {
    var h = seed + P5 + 4L
    h ^= (i.toLong & 0xFFFFFFFFL) * P1
    h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
    fmix(h)
  }

  test("spark xxhash64 on longs is XXH64 hashLong(seed=42); (id, 7) chains through hashInt") {
    val rnd = new scala.util.Random(1)
    val ids = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue) ++ Seq.fill(200)(rnd.nextLong())
    import spark.implicits._
    val got = ids.toDF("id")
      .select(col("id"), xxhash64(col("id")).as("h1"), xxhash64(col("id"), lit(7)).as("h2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    ids.foreach { id =>
      assert(got(id)._1 == hashLong(id, 42L), s"xxhash64($id) model drift")
      assert(got(id)._2 == hashInt(7, hashLong(id, 42L)), s"xxhash64($id, 7) chain drift")
    }
  }

  test("double -> decimal(38,18) rounds the shortest repr HALF_UP, incl. every corpus component") {
    import spark.implicits._
    val xs = T.embeddings(spark, TinyDir)
      .select(explode(col("embedding").cast("array<double>")).as("x"))
      .distinct().as[Double].collect().toSeq ++ Seq(0.1, -0.1, 1e-30, 123.456, -35.75)
    val got = xs.toDF("x")
      .select(col("x"), col("x").cast(DecimalType(38, 18)).as("d"))
      .collect().map(r => r.getDouble(0) -> r.getDecimal(1)).toMap
    xs.foreach { x =>
      val want = java.math.BigDecimal.valueOf(x).setScale(18, java.math.RoundingMode.HALF_UP)
      assert(got(x).compareTo(want) == 0,
        s"cast($x as decimal(38,18)) = ${got(x)}, shortest-repr model says $want")
    }
  }

  test("decimal mean replay: HALF_UP scale-18 division + BigDecimal.doubleValue, on real centroids") {
    // Every (cell, pos) mean of the corpus's first Lloyd round, computed by
    // Spark's decimal pipeline vs the OracleKit integer model.
    val e = T.embeddings(spark, TinyDir)
      .select((col("vec_id") % 8).as("cid"), posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
    val rows = e.groupBy("cid", "pos")
      .agg((sum(col("x").cast(DecimalType(38, 18))) / count(lit(1))).cast("double").as("m"),
        collect_list(col("x")).as("xs"))
      .collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val xs = r.getSeq[Double](3)
      val t = xs.map(x => java.math.BigDecimal.valueOf(x).setScale(18, java.math.RoundingMode.HALF_UP)
        .unscaledValue).reduce(_ add _) // exact scale-18 integer sum
      val n = java.math.BigInteger.valueOf(xs.length.toLong)
      val two = java.math.BigInteger.TWO
      val ms0 = t.abs.multiply(two).add(n).divide(two.multiply(n)) // HALF_UP |T|/n
      val ms = if (t.signum < 0) ms0.negate else ms0
      // BigDecimal.doubleValue replica: sub-2^52 fast path, else parse
      val want =
        if (ms.abs.compareTo(java.math.BigInteger.valueOf(1L << 52)) < 0)
          ms.doubleValue / 1e18
        else new java.math.BigDecimal(ms, 18).toString.toDouble
      assert(r.getDouble(2) == want,
        s"cid=${r.getLong(0)} pos=${r.getInt(1)}: spark mean ${r.getDouble(2)} != model $want")
    }
  }

  // full XXH64 over bytes (stripes + tail), the string-path model
  private def xxh64Bytes(b: Array[Byte], seed: Long): Long = {
    val n = b.length
    var off = 0
    def word(o: Int): Long = {
      var w = 0L; var j = 7
      while (j >= 0) { w = (w << 8) | (b(o + j) & 0xFFL); j -= 1 }
      w
    }
    def rnd(acc: Long, in: Long): Long =
      java.lang.Long.rotateLeft(acc + in * P2, 31) * P1
    var h =
      if (n >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2; var v3 = seed; var v4 = seed - P1
        while (off + 32 <= n) {
          v1 = rnd(v1, word(off)); v2 = rnd(v2, word(off + 8))
          v3 = rnd(v3, word(off + 16)); v4 = rnd(v4, word(off + 24))
          off += 32
        }
        var m = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
        Seq(v1, v2, v3, v4).foreach(v => m = (m ^ rnd(0L, v)) * P1 + P4)
        m
      } else seed + P5
    h += n
    while (off + 8 <= n) {
      h ^= rnd(0L, word(off)); h = java.lang.Long.rotateLeft(h, 27) * P1 + P4; off += 8
    }
    if (off + 4 <= n) {
      var w = 0L; var j = 3
      while (j >= 0) { w = (w << 8) | (b(off + j) & 0xFFL); j -= 1 }
      h ^= w * P1; h = java.lang.Long.rotateLeft(h, 23) * P2 + P3; off += 4
    }
    while (off < n) {
      h ^= (b(off) & 0xFFL) * P5; h = java.lang.Long.rotateLeft(h, 11) * P1; off += 1
    }
    fmix(h)
  }

  test("spark xxhash64 on strings is XXH64 over UTF-8 bytes (stripe + every tail shape)") {
    // every byte-length residue class around the 32-byte stripe boundary,
    // plus real gram-shaped strings
    val strs = (0 to 70).map(n => ("ab cd " * 12).take(n)) ++
      Seq("", "a", "hello world foo", "x" * 31, "y" * 32, "z" * 33)
    import spark.implicits._
    val got = strs.distinct.toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.distinct.foreach { s =>
      assert(got(s) == xxh64Bytes(s.getBytes("UTF-8"), 42L), s"xxhash64(${s.take(20)}...) string-path drift")
    }
  }

  // --- Murmur3_x86_32 model (public spec: Appleby, MurmurHash3) ---
  private def rotl32(x: Int, r: Int): Int = Integer.rotateLeft(x, r)
  private def mixK1(k0: Int): Int = {
    var k = k0 * 0xcc9e2d51; k = rotl32(k, 15); k * 0x1b873593
  }
  private def mixH1(h0: Int, k: Int): Int = {
    var h = h0 ^ k; h = rotl32(h, 13); h * 5 + 0xe6546b64
  }
  private def fmix32(h0: Int, len: Int): Int = {
    var h = h0 ^ len
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16; h
  }
  private def mmhInt(i: Int, seed: Int): Int = fmix32(mixH1(seed, mixK1(i)), 4)
  private def mmhLong(l: Long, seed: Int): Int =
    fmix32(mixH1(mixH1(seed, mixK1(l.toInt)), mixK1((l >>> 32).toInt)), 8)

  test("spark hash(long, intLit) chains hashInt(i, hashLong(l, 42)) - the long runs at seed 42") {
    // The r10 oracle bug this pins: a replay that instead computes
    // hashLong(l, i) still yields PLAUSIBLE minhash candidates (argmins
    // correlate with similarity under any consistent hash) - only the
    // estimate values expose it. The chain layering must stay frozen.
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)((rnd.nextLong(), rnd.nextInt(64)))
    import spark.implicits._
    val got = rows.toDF("l", "i")
      .select(col("l"), col("i"), hash(col("l"), col("i").cast("int")).as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    rows.foreach { case (l, i) =>
      assert(got((l, i)) == mmhInt(i, mmhLong(l, 42)), s"hash($l, $i) chain drift")
      assert(got((l, i)) != mmhLong(l, mmhInt(i, 42)) || mmhInt(i, mmhLong(l, 42)) == mmhLong(l, mmhInt(i, 42)),
        "sanity: the two layerings differ")
    }
  }

  test("spark hash(array<int>) folds full per-element hashInt from seed 42") {
    import spark.implicits._
    val arrs = Seq(Seq(1, -5, 3, Int.MaxValue), Seq(0, 0, 0, 0), Seq(-1, 2, -3, 4))
    val got = arrs.toDF("a")
      .select(col("a"), hash(col("a")).as("h"))
      .collect().map(r => r.getSeq[Int](0) -> r.getInt(1)).toMap
    arrs.foreach { a =>
      assert(got(a) == a.foldLeft(42)((h, x) => mmhInt(x, h)), s"hash($a) fold drift")
    }
  }

  test("generated kmeans CTEs carry the fit's shape: init limit, one round per iter, empty-cell keep") {
    val (ctes, last) = graft.ops.OracleKit.kmeansCtes("SELECT 1 AS id, [1.0] AS v", k = 8, iters = 4)
    assert(last == "km_c4")
    assert(ctes.exists(_.contains("LIMIT 8")), "init must take the K smallest (hk, id)")
    assert(ctes.count(_.contains("ROW_NUMBER() OVER (PARTITION BY s.id")) == 4, "one assignment per Lloyd round")
    assert(ctes.count(_.contains("COALESCE(m.cent, c.cent)")) == 4, "empty cells must keep their centroid")
    // the hash chain must never use DuckDB's overflow-checked `<<`
    assert(!ctes.exists(_.contains("<<")), "left shift would overflow-error in DuckDB")
  }
}
