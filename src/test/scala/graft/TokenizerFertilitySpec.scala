package graft

/** q_tokenizer_fertility semantics (exact values oracle-pinned; this pins
  * the metric's DISCRIMINATIVE behavior on a planted corpus where one
  * source's vocabulary is fully merged and another's never is). */
class TokenizerFertilitySpec extends SparkSpec {

  /** s_merged's three words absorb the 3 BPE merges (counts 50 each, lex
    * tie-break p < r < t); s_frag's "xyz" (10×) never merges. */
  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fert").toString
    import spark.implicits._
    val merged = (0 until 50).map(i =>
      (i.toLong, "pq rs tu", "en", "s_merged", 8L))
    val frag = (0 until 10).map(i =>
      (100L + i, "xyz", "en", "s_frag", 3L))
    (merged ++ frag)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a source the vocabulary covers scores fertility 1; a fragmented one scores word length") {
    val out = SparkEntry.queries("q_tokenizer_fertility")(spark, plantedDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // 150 word occurrences, every one a single 2-char token
    assert(out("s_merged") == ((150L, 150L, 1.0, 2.0, 1.0)), s"s_merged: ${out("s_merged")}")
    // 10 occurrences of a 3-char word left as 3 single-char tokens
    assert(out("s_frag") == ((10L, 30L, 3.0, 1.0, 0.0)), s"s_frag: ${out("s_frag")}")
  }

  test("real corpus: one row per source, ratios internally consistent") {
    val rows = SparkEntry.queries("q_tokenizer_fertility")(spark, TinyDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nt) = (r.getLong(1), r.getLong(2))
      assert(nt >= nw, s"${r.getString(0)}: tokens $nt < words $nw")
      assert(math.abs(r.getDouble(3) - nt.toDouble / nw) < 1e-6)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }
}
