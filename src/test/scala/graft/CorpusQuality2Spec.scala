package graft

import graft.ops.CorpusQuality2
import org.apache.spark.sql.execution.exchange.Exchange

/** Semantic pins for the second corpus-quality wave (SURVEY §2.4
  * q_ngram_novelty / q_para_dedup / q_dedup_savings). The oracle gate
  * proves the full queries hash-match DuckDB; these pin the helper
  * semantics on adversarial inputs and the zero-shuffle plan shape the
  * Scaladoc promises. */
class CorpusQuality2Spec extends SparkSpec {

  test("ngramNovelty: exact duplicate docs score 0, unique-vocab doc scores 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact dup of 1 — every gram shared
      (3L, "unique tokens appear nowhere else")
    ).toDF("doc_id", "text")
    val m = CorpusQuality2.ngramNovelty(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m(1L)._3 == 0.0 && m(2L)._3 == 0.0, s"dup docs must have zero novelty: $m")
    assert(m(3L)._3 == 1.0, s"unique doc must be fully novel: $m")
    assert(m(1L)._1 == 2L, "4 tokens -> 2 distinct trigrams")
  }

  test("ngramNovelty: short docs (<n tokens) fall back to whole-text identity") {
    import spark.implicits._
    val docs = Seq((1L, "hi"), (2L, "hi"), (3L, "bye")).toDF("doc_id", "text")
    val m = CorpusQuality2.ngramNovelty(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) == 0.0 && m(2L) == 0.0 && m(3L) == 1.0, m.toString)
  }

  test("paraDedup: keep-first preserves order and drops every later repeat") {
    import spark.implicits._
    // chunkTokens=2 -> chunks: "a b", "c d", "a b", "e f", "c d"
    val docs = Seq((1L, "a b c d a b e f c d")).toDF("doc_id", "text")
    val r = CorpusQuality2.paraDedup(docs, "doc_id", "text", 2).collect().head
    assert(r.getLong(1) == 5L, "5 chunks in")
    assert(r.getLong(2) == 2L, "2 repeats removed")
    assert(r.getString(3) == "a b c d e f", s"order-preserving keep-first: ${r.getString(3)}")
  }

  test("paraDedup: no-dup doc passes through unchanged; ragged tail kept") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val r = CorpusQuality2.paraDedup(docs, "doc_id", "text", 2).collect().head
    assert(r.getLong(2) == 0L && r.getString(3) == "a b c d e")
  }

  test("paraDedup plans zero exchanges (map-side only, as documented)") {
    val plan = CorpusQuality2.paraDedup(
      graft.sources.Tables.documents(spark, TinyDir), "doc_id", "text", 8)
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty, s"expected shuffle-free plan, got:\n$plan")
  }

  test("dedupSavings: duplicate cost lands on the source holding the removed copy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "x y z"),     // survivor (min id)
      (2L, "srcB", "x y z"),     // removed copy -> srcB charged 3 tokens
      (3L, "srcB", "p q")        // unique
    ).toDF("doc_id", "source", "text")
    val m = CorpusQuality2.dedupSavings(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m("srcA") == ((1L, 3L, 0L, 0L)), m.toString)
    assert(m("srcB") == ((2L, 5L, 1L, 3L)), m.toString)
  }

  test("dedupSavings totals reconcile with q_dedup_exact's survivor count") {
    val savings = CorpusQuality2.qDedupSavings.fn(spark, TinyDir)
    val totals = savings.groupBy().sum("n_docs", "dup_docs").collect().head
    val nDocs = totals.getLong(0)
    val dupDocs = totals.getLong(1)
    val survivors = graft.ops.Dedup.qDedupExact.fn(spark, TinyDir).count()
    assert(nDocs - dupDocs == survivors,
      s"docs($nDocs) - removed($dupDocs) must equal exact-dedup survivors($survivors)")
  }
}
