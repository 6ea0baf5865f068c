package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Red-teams the minhash equality certificate (VERDICT r9 #6): the r9
  * gate measured ZERO missed pairs at 16×4 banding, but that was on the
  * saturated arm of the S-curve — a certificate that can only ever say
  * "pass" proves nothing. This spec drives the SAME certificate chain
  * ([[Dedup.minhashGraphOf]]) to a banding point BELOW saturation
  * (2 bands × 32 rows: collision probability at j≈0.82 is ≈ 2·0.82³² ≈
  * 0.003) on a planted mid-similarity corpus, and requires the
  * certificate to REPORT the misses: mismatches > 0, flag false, and
  * the missing edges exactly the exact-minus-verified set.
  */
class MinhashCertificateSpec extends SparkSpec {

  // 24 docs = 12 planted pairs. Each pair shares a 70-word prefix and
  // diverges in the tail (5 vs 10 extra words), putting exact trigram
  // Jaccard at 68/83 ≈ 0.82 — above the 0.5 threshold (so the exact
  // graph holds all 12 edges), collision-certain at 16×4 (per-pair miss
  // ≈ (1−0.82⁴)¹⁶ ≈ 7·10⁻⁵) yet deep below saturation at 2×32
  // (per-pair collision ≈ 2·0.82³² ≈ 0.003). Words are pair-salted so
  // no cross-pair similarity exists.
  private lazy val planted = {
    import spark.implicits._
    val docs = (0 until 12).flatMap { p =>
      val shared = (0 until 70).map(w => s"p${p}w$w")
      val a = shared ++ (0 until 5).map(w => s"p${p}a$w")
      val b = shared ++ (0 until 10).map(w => s"p${p}b$w")
      Seq((p * 2L, a.mkString(" ")), (p * 2L + 1, b.mkString(" ")))
    }
    docs.toDF("doc_id", "text").localCheckpoint(true)
  }

  test("sub-saturation banding: the certificate reports the misses") {
    val g = Dedup.minhashGraphOf(planted, "doc_id", "text",
      n = 3, k = 64, bands = 2, threshold = 0.5, certify = true)
    val exact = g.exact.get.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size === 12, s"all 12 planted pairs must be exact edges, got $exact")
    val verified = g.verified.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(exact),
      "LSH-verified pairs are exact-verified, so false positives are impossible")
    val missed = exact -- verified
    assert(missed.nonEmpty,
      "2×32 banding at j≈0.82 must miss pairs — a certificate that cannot " +
        s"fail certifies nothing (verified=$verified)")
    assert(g.mismatches.contains(missed.size.toLong),
      s"certificate must count exactly the missed edges: " +
        s"mismatches=${g.mismatches} missed=${missed.size}")
    assert(!g.exactVerified, "the flag the gate ships must read FALSE here")
  }

  test("saturated banding on the same corpus: certificate passes") {
    // the complementary arm: 16×4 banding collides at ≥1−(1−j⁴)¹⁶ ≈ 0.99+
    // for j ≈ 0.82 per pair — on THIS corpus it finds all 12, and the
    // same chain that reported misses above reports zero here. Together
    // the two tests pin that the flag tracks the banding, not the code
    // path.
    val g = Dedup.minhashGraphOf(planted, "doc_id", "text",
      n = 3, k = 64, bands = 16, threshold = 0.5, certify = true)
    assert(g.mismatches.contains(0L),
      s"16×4 on j≈0.82 planted pairs should find all (got ${g.mismatches})")
    assert(g.exactVerified)
  }

  test("simhash certificate: 1-band (exact-collision) banding reports misses") {
    // bands = 1 ⇒ a candidate only on hamming == 0; the planted pairs'
    // differing tails flip simhash bits, so the exact J ≥ 0.5 graph has
    // edges the single band cannot surface — the simhash certificate
    // must say so, same falsifiability contract as the minhash one
    val g = Dedup.simhashGraphOf(planted, "doc_id", "text",
      n = 3, bands = 1, threshold = 0.5, certify = true)
    val exact = g.exact.get.count()
    assert(exact === 12L)
    assert(g.mismatches.exists(_ > 0L),
      s"1-band simhash on unequal near-dups must miss (mismatches=${g.mismatches})")
    assert(!g.exactVerified)
  }

  test("simhash certificate: 8-band gate banding on the same corpus passes " +
    "only if hamming fits — and reports honestly either way") {
    val g = Dedup.simhashGraphOf(planted, "doc_id", "text",
      n = 3, bands = 8, threshold = 0.5, certify = true)
    // the planted tails differ by ~8 of 75-80 words: simhash hamming is
    // small but corpus-dependent — what this test PINS is certificate
    // honesty, not a recall promise: mismatches == |exact − verified|
    val exact = g.exact.get.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = g.verified.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(exact))
    assert(g.mismatches.contains((exact -- verified).size.toLong))
    assert(g.exactVerified === (exact == verified))
  }
}
