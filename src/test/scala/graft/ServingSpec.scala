package graft

import graft.sources.{AnnIndex, InvertedIndex, Serving}
import org.apache.spark.sql.functions._

/** The release-publishing capstone: every artifact lands, serves, and is
  * accounted for in the provenance ledger. */
class ServingSpec extends SparkSpec {

  test("buildAll: artifacts serve and the ledger accounts for each") {
    val out = java.nio.file.Files.createTempDirectory("serving").toString
    Serving.buildAll(spark, TinyDir, out, loadedAtUs = 1700000000000000L)

    // ANN index serves a pruned probe query
    val probes = spark.read.parquet(s"$out/ann/index")
      .select(col("id").as("query_id"), col("v").as("qv")).limit(3)
    assert(AnnIndex.query(spark, out + "/ann", probes, nProbe = 4, topK = 5).count() > 0)

    // inverted index answers an AND lookup without touching the corpus
    val docsWithThe = InvertedIndex.lookupAll(spark, s"$out/inverted", Seq("the"))
    assert(docsWithThe.count() > 0)

    // sorted export preserves the corpus row-for-row
    val docs = graft.sources.Tables.documents(spark, TinyDir)
    assert(spark.read.parquet(s"$out/docs_sorted").count() == docs.count())

    // the datasheet rides along
    assert(spark.read.parquet(s"$out/card").count() == 7)

    // the dedup state serves from the published artifacts: batch query
    // against the bundled index equals the from-scratch SSJoin edges,
    // the labeling covers every doc, and the point-lookup endpoint
    // answers from the same files
    val expectPairs = graft.ops.Dedup.nearDupEdges(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = graft.ops.Dedup.NearDupIndex
      .query(spark, s"$out/dedup/index", docs.select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == expectPairs, s"bundle dedup index serves $served, want $expectPairs")
    val labels = graft.ops.DedupService.labels(spark, s"$out/dedup")
    assert(labels.count() == docs.count())
    expectPairs.headOption.foreach { case (a, b) =>
      val hits = graft.ops.Dedup.NearDupIndex.lookup(spark, s"$out/dedup/index", a)
        .collect().map(_.getLong(0)).toSet
      assert(hits.contains(b), s"lookup($a) missing near-dup $b (got $hits)")
    }
    // and post-release ingest resumes from the published path directly
    assert(graft.ops.DedupService.appliedBatch(spark, s"$out/dedup") == 0L)

    // the published kNN-graph bundle serves q_graph_search-identical
    // answers (VERDICT r12 #4): a release consumer reads the bundle
    // instead of re-running NN-Descent on the corpus it just downloaded
    val emb = graft.sources.Tables.embeddings(spark, TinyDir)
    val gProbes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
    val viaBundle = graft.sources.GraphBundle
      .search(spark, s"$out/knn_graph", gProbes).collect().toSeq
    val direct = SparkEntry.queries("q_graph_search")(spark, TinyDir).collect().toSeq
    assert(viaBundle == direct,
      "published graph bundle must serve the q_graph_search answers")
    // the publish released its lease: a later maintainer claims fresh
    assert(graft.sources.WriterLease.holder(spark, s"$out/knn_graph").isEmpty)

    // one ledger row per artifact, row counts honest
    val ledger = graft.operators.ProvenanceOps.ledger(spark, s"$out/provenance")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ledger.keySet ==
      Set("ann_index", "inverted_index", "docs_sorted", "corpus_card",
        "dedup_labels", "dedup_index", "knn_graph"))
    assert(ledger("knn_graph") ==
      spark.read.parquet(s"$out/knn_graph/graph").count())
    assert(ledger("docs_sorted") == docs.count())
    assert(ledger("corpus_card") == 7L)
    assert(ledger("dedup_labels") == docs.count())
    assert(ledger("dedup_index") == docs.count())
    assert(ledger("ann_index") ==
      graft.sources.Tables.embeddings(spark, TinyDir).count())
  }

  test("publishRemediated: patched snapshot republished, lookups serve NEW ids, audit clean") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("serving_rem").toString
    val docs = graft.sources.Tables.documents(spark, TinyDir)
    val emb = graft.sources.Tables.embeddings(spark, TinyDir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    // migrate every doc_id ≡ 0 (mod 7) to id+100000 — both sides patched
    val patch = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("old_id"), (col("doc_id") + 100000L).as("new_id"))
    val audit = Serving.publishRemediated(docs, emb, patch, out,
      sourceTag = "r7_patch", loadedAtUs = 9L)
    assert(audit("patch_size") >= 1L)
    assert(audit("patched_docs") == audit("patch_size")) // doc_id unique
    assert(audit("orphans_after") == 0L, audit.toString)
    // the sorted export carries the NEW ids (old ones gone)
    val sorted = spark.read.parquet(s"$out/docs_sorted")
    assert(sorted.filter(col("doc_id") % 7 === 0 && col("doc_id") < 100000L).count() == 0)
    assert(sorted.filter(col("doc_id") >= 100000L).count() == audit("patch_size"))
    assert(sorted.count() == docs.count())
    // the inverted index serves content under the patched ids: a term from
    // a migrated doc must resolve to its NEW id
    val migrated = docs.filter(col("doc_id") % 7 === 0).select("doc_id", "text").head()
    val term = migrated.getString(1).split(" ").filter(_.nonEmpty).head
    val ids = InvertedIndex.lookupAll(spark, s"$out/inverted", Seq(term))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids.contains(migrated.getLong(0) + 100000L),
      s"term '$term' of migrated doc not served under its new id")
    // ANN index rebuilt over the patched embedding ids
    val annIds = spark.read.parquet(s"$out/ann/index").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(annIds.exists(_ >= 100000L))
    assert(audit("patch_size") == annIds.count(_ >= 100000L))
    // ledger rows for every artifact at the caller's batch time — the
    // dedup state is rebuilt over the PATCHED ids too
    val ledger = graft.operators.ProvenanceOps.ledger(spark, s"$out/provenance").collect()
    assert(ledger.map(_.getString(0)).toSet ==
      Set("ann_index", "inverted_index", "docs_sorted",
        "dedup_labels", "dedup_index", "knn_graph"))
    assert(ledger.forall(_.getAs[Long]("loaded_at_us") == 9L))
    val dedupIds = graft.ops.DedupService.labels(spark, s"$out/dedup")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dedupIds.exists(_ >= 100000L))
    assert(dedupIds.forall(id => id % 7 != 0 || id >= 100000L))
  }
}
