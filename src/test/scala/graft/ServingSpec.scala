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

    // one ledger row per artifact, row counts honest
    val ledger = graft.operators.ProvenanceOps.ledger(spark, s"$out/provenance")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ledger.keySet ==
      Set("ann_index", "inverted_index", "docs_sorted", "corpus_card"))
    assert(ledger("docs_sorted") == docs.count())
    assert(ledger("corpus_card") == 7L)
    assert(ledger("ann_index") ==
      graft.sources.Tables.embeddings(spark, TinyDir).count())
  }
}
