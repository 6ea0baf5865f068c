package graft

/** q_corpus_release semantics (exact values oracle-pinned; this pins the
  * STAGING decisions on a planted corpus where the stage order is
  * observable): quality drops happen before dedup ever sees the doc, a
  * contaminated cluster representative never promotes its follower, and
  * each doc carries the FIRST stage that dropped it. */
class CorpusReleaseSpec extends SparkSpec {

  private val Txt = "the alpha beta gamma of the delta epsilon zeta and " +
    "the eta theta iota in the kappa lambda mu"

  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_release").toString
    import spark.implicits._
    Seq(
      // the benchmark doc (doc_id < 25): never a release candidate
      (1L, Txt, "en", "bench", 200L),
      // a French copy with the SMALLEST id of the near-dup family: if
      // dedup ran before quality it would be the min-id survivor and 101
      // would point at 90 — staging correctly drops it at 'lang' first
      (90L, Txt, "fr", "web", 200L),
      (100L, Txt, "en", "web", 200L),
      (101L, Txt + " extra", "en", "web", 200L),
      (103L, "a completely different and unique document about the " +
        "quick brown fox and the lazy dog in the meadow", "en", "web", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("staged verdicts: quality first, dup second, contamination last, no promotion") {
    val out = SparkEntry.queries("q_corpus_release")(spark, plantedDir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3))).toMap
    assert(out.keySet == Set(90L, 100L, 101L, 103L), s"rows: ${out.keySet}")
    // quality stage wins even though 90 is also a near-dup of 100/101
    assert(out(90L) == (("lang", None, false)), s"90: ${out(90L)}")
    // 100 survives dedup (min id of {100, 101}) but leaks the benchmark
    assert(out(100L) == (("contaminated", Some(100L), false)), s"100: ${out(100L)}")
    // the follower stays 'dup' pointing at 100 — NOT at the French 90
    // (staging) and NOT promoted when its survivor is contaminated
    assert(out(101L) == (("dup", Some(100L), false)), s"101: ${out(101L)}")
    assert(out(103L) == (("keep", Some(103L), true)), s"103: ${out(103L)}")
  }

  test("release card: per-source counts partition the decision table exactly") {
    val dec = SparkEntry.queries("q_corpus_release")(spark, TinyDir).collect()
    val card = SparkEntry.queries("q_release_card")(spark, TinyDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(card.nonEmpty)
    // the card's n_docs sum equals the decision table; every row's
    // counts partition its n_docs; keep_frac is the exact ratio
    assert(card.map(_._2).sum == dec.length)
    assert(card.map(_._3).sum == dec.count(_.getString(1) == "keep"))
    card.foreach { case (src, n, k, q, du, c, frac) =>
      assert(k + q + du + c == n, s"$src: $k+$q+$du+$c != $n")
      assert(math.abs(frac - k.toDouble / n) < 1e-6, s"$src keep_frac")
    }
  }

  test("real corpus: every training doc gets exactly one verdict; keeps are consistent") {
    val rows = SparkEntry.queries("q_corpus_release")(spark, TinyDir).collect()
    val train = graft.sources.Tables.documents(spark, TinyDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 25).count()
    assert(rows.length == train)
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getString(1) == "keep"))
      if (r.getString(1) == "dup")
        assert(r.getLong(2) != r.getLong(0), s"dup ${r.getLong(0)} is its own survivor")
    }
    assert(rows.count(_.getString(1) == "keep") > 0)
  }
}
