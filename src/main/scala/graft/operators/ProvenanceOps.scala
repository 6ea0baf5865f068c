package graft.operators

import graft.Q
import graft.sources.{Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dataset/provenance lineage — the reference records every load in its
  * `dataset` + `provenance` tables (loaders/TCRD.py:384 `ins_dataset`,
  * :412 `ins_provenance`): what was loaded, when, how many rows, from
  * which source. The Spark-native form is a parquet ledger sidecar: every
  * tracked write appends one row (dataset, source, loaded_at_us, n_rows,
  * content_fp). The fingerprint is an ORDER-INDEPENDENT content checksum —
  * a sum of per-row md5-derived 60-bit integers — so two loads compare
  * equal iff their content is identical, regardless of partitioning, and
  * the ledger joins directly to q_delta_detect output ("what changed
  * between loads").
  *
  * Scale: the fingerprint is one map-side hash + one aggregation; the
  * ledger append is a single row. Nothing here touches the data a second
  * time beyond the checksum pass (fold it into the writing job's plan).
  */
object ProvenanceOps {

  /** 60-bit integer from a row's content hash; summing these (exact, as
    * DECIMAL) gives an order/partitioning-independent dataset checksum.
    * Cross-engine: DuckDB's ('0x'||substr(md5(x),1,15))::BIGINT matches. */
  def rowFingerprint(content: Column): Column =
    conv(substring(md5(content), 1, 15), 16, 10).cast("long")

  private val FpMod = 4611686018427387904L // 2^62

  /** (n_rows, content_fp) for a dataset, keyed on `content`. */
  def datasetFingerprint(df: DataFrame, content: Column): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      (sum(rowFingerprint(content).cast(DecimalType(38, 0))) % FpMod)
        .cast("long").as("content_fp"))

  /** Append one ledger row describing `df` to the provenance table at
    * `provDir`. `loadedAtUs` is caller-supplied (a job id / batch time) so
    * reruns are reproducible — the ledger never reads the wall clock. */
  def record(df: DataFrame, content: Column, dataset: String, source: String,
             loadedAtUs: Long, provDir: String): Unit =
    datasetFingerprint(df, content)
      .select(lit(dataset).as("dataset"), lit(source).as("source"),
        lit(loadedAtUs).as("loaded_at_us"), col("n_rows"), col("content_fp"))
      .write.mode("append").parquet(provDir)

  /** Tracked write: data lands at `path`, its ledger row at `provDir`.
    * The fingerprint pass reads back what was actually PERSISTED at
    * `path`, not the incoming plan — if any upstream of `df` is
    * nondeterministic (sampling, partition-id-derived values, a source
    * that changed between jobs), the ledger still describes the bytes on
    * disk. `content` must therefore be expressed over column NAMES
    * (`col("text")`), which re-resolve against the read-back schema. */
  def writeWithProvenance(df: DataFrame, path: String, content: Column,
                          dataset: String, source: String, loadedAtUs: Long,
                          provDir: String): Unit = {
    df.write.mode("overwrite").parquet(path)
    val persisted = df.sparkSession.read.parquet(path)
    record(persisted, content, dataset, source, loadedAtUs, provDir)
  }

  /** Read the ledger back, latest row per dataset first. */
  def ledger(spark: SparkSession, provDir: String): DataFrame =
    spark.read.parquet(provDir)
      .orderBy(col("dataset"), col("loaded_at_us").desc)

  /** The dataset-ledger audit as a query: one row per corpus source with
    * row count, distinct-doc count, and the order-independent content
    * fingerprint — exactly what ins_dataset/ins_provenance persist per
    * load, derived here per source "dataset" of the documents table. Two
    * runs of a load compare by (n_rows, content_fp); a changed fingerprint
    * with equal counts is a content-only update (the case row counts
    * alone cannot detect). */
  val qProvenanceAudit: Q = Q(
    "q_provenance_audit",
    """SELECT source AS dataset,
      |  COUNT(*) AS n_rows,
      |  COUNT(DISTINCT doc_id) AS n_distinct_ids,
      |  CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT) % 4611686018427387904 AS BIGINT) AS content_fp
      |FROM documents GROUP BY source ORDER BY dataset""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .groupBy(col("source").as("dataset"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_distinct_ids"),
        (sum(rowFingerprint(col("text")).cast(DecimalType(38, 0))) % FpMod)
          .cast("long").as("content_fp"))
      .orderBy("dataset")
  }

  val all: Seq[Q] = Seq(qProvenanceAudit)
}
