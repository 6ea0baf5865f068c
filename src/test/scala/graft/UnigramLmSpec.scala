package graft

/** q_unigram_lm semantics (exact values are oracle-pinned; this pins the
  * method's DISCRIMINATIVE behavior vs BPE on a planted corpus — the
  * Kudo 2018 argument: likelihood segmentation can pick a whole word the
  * greedy merge sequence never builds). */
class UnigramLmSpec extends SparkSpec {

  /** Three high-frequency pair-words (pq, rs, tu) absorb all 3 BPE merge
    * rounds; "abc" (30×) and "ab" (20×) are frequent enough to enter the
    * unigram seed but never get a BPE merge. */
  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram").toString
    import spark.implicits._
    val words =
      Seq.fill(100)("pq") ++ Seq.fill(90)("rs") ++ Seq.fill(80)("tu") ++
        Seq.fill(30)("abc") ++ Seq.fill(20)("ab")
    words.zipWithIndex
      .map { case (w, i) => (i.toLong, w, "en", s"src${i % 4}", w.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("unigram keeps whole-word tokens BPE's greedy merges never build") {
    val uni = SparkEntry.queries("q_unigram_lm")(spark, plantedDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // likelihood segmentation: p(abc) = 30/T beats any two-token product,
    // so every "abc" word Viterbi-selects the single token ["abc"]
    assert(uni.get("abc").contains(30L), s"unigram vocab: $uni")
    assert(uni.get("ab").contains(20L), s"unigram vocab: $uni")
    val bpe = SparkEntry.queries("q_bpe_tokenize")(spark, plantedDir)
      .collect().map(_.getString(0)).toSet
    // BPE's 3 merges go to (p,q)=100, (r,s)=90, (t,u)=80; "abc" stays a
    // character sequence — the two tokenizers disagree on the same corpus
    assert(Set("pq", "rs", "tu").subsetOf(bpe), s"bpe tokens: $bpe")
    assert(!bpe.contains("abc") && !bpe.contains("ab"), s"bpe tokens: $bpe")
  }

  test("reachability floor: unused single chars stay in the vocab at n=1") {
    val uni = SparkEntry.queries("q_unigram_lm")(spark, plantedDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byTok = uni.map(t => t._1 -> t._2).toMap
    // 'a' only occurs inside words segmented as whole tokens → count 0 →
    // floored to 1 (the lattice must always have a single-char path)
    assert(byTok.get("a").contains(1L), s"vocab: $byTok")
    assert(uni.forall(_._3 > 0.0))
  }

  test("tokenizer apply: the planted corpus tokenizes to exactly its whole words") {
    val toks = SparkEntry.queries("q_unigram_tokenize")(spark, plantedDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every planted word is its own best segmentation under the trained
    // model, so the applied tokenizer emits ONLY whole-word tokens with
    // the corpus frequencies — no single-char fallback fires
    assert(toks == Map("pq" -> 100L, "rs" -> 90L, "tu" -> 80L,
      "abc" -> 30L, "ab" -> 20L), s"tokenized corpus: $toks")
  }

  test("real corpus: 30 deterministic rows, counts descending") {
    val out = SparkEntry.queries("q_unigram_lm")(spark, TinyDir).collect()
    assert(out.length == 30)
    val ns = out.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    val again = SparkEntry.queries("q_unigram_lm")(spark, TinyDir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
