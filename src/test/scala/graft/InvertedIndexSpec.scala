package graft

import java.nio.file.Files

import graft.sources.{InvertedIndex, Tables => T}
import org.apache.spark.sql.functions._

/** Inverted-index sink + serving lookup (sink_inverted): posting lists
  * round-trip exactly, the AND lookup equals a direct corpus scan, and the
  * term probe is pushed into the parquet scan (the index is read by key,
  * never scanned whole). */
class InvertedIndexSpec extends SparkSpec {

  private lazy val idxPath = {
    val d = Files.createTempDirectory("invidx").toString + "/idx"
    InvertedIndex.write(T.documents(spark, TinyDir).select("doc_id", "text"), d)
    d
  }

  test("AND lookup equals the direct corpus scan") {
    val terms = Seq("spark", "join")
    val got = InvertedIndex.lookupAll(spark, idxPath, terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = T.documents(spark, TinyDir).select("doc_id", "text").collect()
    val expect = docs.flatMap { r =>
      val toks = r.getString(1).split(" ")
      val hits = toks.count(terms.contains)
      if (terms.forall(toks.contains)) Some((r.getLong(0), hits.toLong)) else None
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty, "probe terms should match documents in the corpus")
  }

  test("term probe is pushed down to the index scan; df and postings are consistent") {
    val probe = spark.read.parquet(idxPath).filter(col("term") === "spark")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(term,spark)"), plan)
    val row = probe.collect()
    assert(row.length == 1)
    val postings = row(0).getSeq[org.apache.spark.sql.Row](2)
    assert(row(0).getLong(1) == postings.size.toLong, "df == |postings|")
    // postings sorted by doc_id, tf positive
    val ids = postings.map(_.getLong(0))
    assert(ids == ids.sorted)
    assert(postings.forall(_.getLong(1) > 0))
  }

  test("multi-term OR-degenerate case: single term lookup equals contains-count") {
    val got = InvertedIndex.lookupAll(spark, idxPath, Seq("window"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = T.documents(spark, TinyDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").count(_ == "window").toLong)
      .filter(_._2 > 0).toMap
    assert(got == expect)
  }

  test("incremental delta + compaction: lookups equal a from-scratch full build throughout") {
    val docs = T.documents(spark, TinyDir).select("doc_id", "text")
    val base = docs.filter(col("doc_id") < 250)
    val delta = docs.filter(col("doc_id") >= 250)
    val d = Files.createTempDirectory("invidx_incr").toString
    val incrPath = s"$d/incr"; val fullPath = s"$d/full"
    InvertedIndex.write(base, incrPath)
    InvertedIndex.appendDelta(spark, incrPath, delta)
    InvertedIndex.write(docs, fullPath)
    val terms = Seq("window", "the")
    def m(p: String) = InvertedIndex.lookupAll(spark, p, terms)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // pre-compaction: region-merged reads already serve correct results
    assert(m(incrPath) == m(fullPath))
    // post-compaction: one region again, identical index content
    InvertedIndex.compact(spark, incrPath)
    assert(!new java.io.File(incrPath + "_delta").exists(), "delta region survived compact")
    assert(m(incrPath) == m(fullPath))
    val a = spark.read.parquet(incrPath).orderBy("term")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Any](2)))
    val b = spark.read.parquet(fullPath).orderBy("term")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Any](2)))
    assert(a.sameElements(b), "compacted index differs from full rebuild")
  }
}
