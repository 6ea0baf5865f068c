package graft.sources

import graft.operators.ProvenanceOps
import graft.sources.{Tables => T}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-bundle capstone (SURVEY.md §2.1 sink_serving_bundle): ONE call
  * turns a corpus release into every artifact the serving tier reads,
  * each with a provenance ledger row — the "publish a release" job.
  *
  * Artifacts under `outDir`:
  *  - `ann/`        — the IVF-PQ vector index ([[AnnIndex.build]]):
  *                    cell-partitioned, codebook + sub-codebook sidecars;
  *  - `inverted/`   — term-keyed posting lists ([[InvertedIndex.write]]);
  *  - `docs_sorted/`— the corpus range-partitioned and sorted by doc_id
  *                    ([[Tables.writeSorted]] — tight disjoint file stats,
  *                    point/range lookups skip whole files);
  *  - `card/`       — the q_corpus_card datasheet rows;
  *  - `provenance/` — one ledger row per artifact (rows + content
  *                    fingerprint, read back from what was persisted).
  *
  * Each build is the already-specced operator — this entry point adds
  * sequencing and the ledger, nothing bespoke — so the bundle inherits
  * every scale property proved for its parts (pruned ANN cells, pushed
  * index lookups, file-skipping sorted layout). `loadedAtUs` is
  * caller-supplied: release publishing is reproducible, never
  * wall-clock-dependent. */
object Serving {

  def buildAll(spark: SparkSession, sfDir: String, outDir: String,
               loadedAtUs: Long): Unit = {
    val docs = T.documents(spark, sfDir)
    val emb = T.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    val prov = s"$outDir/provenance"

    AnnIndex.build(emb, s"$outDir/ann")
    ProvenanceOps.record(spark.read.parquet(s"$outDir/ann/index"),
      concat_ws(",", col("id"), col("cell")), "ann_index", sfDir, loadedAtUs, prov)

    InvertedIndex.write(docs.select("doc_id", "text"), s"$outDir/inverted")
    ProvenanceOps.record(spark.read.parquet(s"$outDir/inverted"),
      col("term"), "inverted_index", sfDir, loadedAtUs, prov)

    T.writeSorted(docs, s"$outDir/docs_sorted", "doc_id", 8)
    ProvenanceOps.record(spark.read.parquet(s"$outDir/docs_sorted"),
      col("text"), "docs_sorted", sfDir, loadedAtUs, prov)

    ProvenanceOps.writeWithProvenance(
      graft.ops.CorpusQuality.qCorpusCard.fn(spark, sfDir), s"$outDir/card",
      col("metric"), "corpus_card", sfDir, loadedAtUs, prov)
  }
}
