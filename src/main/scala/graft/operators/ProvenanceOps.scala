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

  /** The order-independent dataset checksum AGGREGATE over [[rowFingerprint]]:
    * exact decimal sum mod 2^62, cast back to long. Every operator that
    * fingerprints content (ledger, release diffs, schema-drift profiles)
    * must use THIS expression — a second copy that drifts stops
    * comparing across operators. DuckDB twin:
    * `CAST(SUM(('0x'||substr(md5(x),1,15))::BIGINT) % 4611686018427387904 AS BIGINT)`. */
  def contentFp(content: Column): Column =
    (sum(rowFingerprint(content).cast(DecimalType(38, 0))) % FpMod)
      .cast("long")

  /** (n_rows, content_fp) for a dataset, keyed on `content`. */
  def datasetFingerprint(df: DataFrame, content: Column): DataFrame =
    df.agg(count(lit(1)).as("n_rows"), contentFp(content).as("content_fp"))

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
        contentFp(col("text")).as("content_fp"))
      .orderBy("dataset")
  }

  /** The one-scan fan-out loader pattern end-to-end, verified through its
    * ledger: parse the documents table once ([[graft.sources.FanOut]]),
    * write three sinks (raw core, a per-doc token projection, a per-source
    * rollup) with one provenance row each, and return the ledger. The
    * oracle recomputes every sink's (n_rows, content_fp) directly from
    * `documents` in SQL, so a hash match proves both the fan-out writes
    * and the fingerprints — the composed analog of load-UniProt.py's
    * one-parse → ins_target → N-table insert path. */
  val qFanout: Q = Q(
    "q_fanout",
    """WITH st AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |fp AS (
      |  SELECT 'doc_core' AS dataset, COUNT(*) AS n_rows,
      |    CAST(SUM(('0x' || substr(md5(concat_ws(chr(1), doc_id, source, text)), 1, 15))::BIGINT)
      |      % 4611686018427387904 AS BIGINT) AS content_fp
      |  FROM documents
      |  UNION ALL
      |  SELECT 'doc_tokens', COUNT(*),
      |    CAST(SUM(('0x' || substr(md5(concat_ws(chr(1), doc_id, len(string_split(text, ' ')))), 1, 15))::BIGINT)
      |      % 4611686018427387904 AS BIGINT)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'source_stats', COUNT(*),
      |    CAST(SUM(('0x' || substr(md5(concat_ws(chr(1), source, n_docs, n_tokens)), 1, 15))::BIGINT)
      |      % 4611686018427387904 AS BIGINT)
      |  FROM st)
      |SELECT dataset, n_rows, content_fp FROM fp ORDER BY dataset""".stripMargin) { (s, d) =>
    import graft.sources.FanOut
    val tmp = java.nio.file.Files.createTempDirectory("graft_fanout").toFile.getAbsolutePath
    val parsed = T.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    FanOut.writeFanOut(parsed, Seq(
      FanOut.Sink("doc_core",
        df => df.select("doc_id", "source", "text"), s"$tmp/doc_core"),
      FanOut.Sink("doc_tokens",
        df => df.select("doc_id", "n_tokens"), s"$tmp/doc_tokens"),
      FanOut.Sink("source_stats",
        df => df.groupBy("source").agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("n_tokens")), s"$tmp/source_stats")),
      provDir = Some(s"$tmp/prov"), loadedAtUs = 1L, source = "documents")
    s.read.parquet(s"$tmp/prov")
      .select(col("dataset"), col("n_rows"), col("content_fp"))
      .orderBy("dataset")
  }

  /** Release-over-release ledger diff — the build-notes "what changed
    * this release" report (doc/TCRD_Build_Notes.txt per-release dataset
    * comparisons; perl/TCRD_TDLevol.txt): per dataset, row-count delta
    * and fingerprint comparison between two releases, INCLUDING the
    * content-only-change class (fingerprint moved, row count identical —
    * the case row counts alone cannot detect, and the reason the ledger
    * stores content_fp at all) and the added/removed classes (a dataset
    * present in only one release — the most drastic change a release
    * screen exists to surface, so the join is FULL OUTER, never inner).
    * Releases are carved deterministically per source from `documents`
    * so every diff class appears: 'src16' is absent from the old release
    * (added), 'src5' from the new (removed), sources up to 'src4' (lex)
    * lose their doc_id%13=5 rows (row-count change — 13 is coprime to
    * the testdata's source=doc_id%20 striping), 'src8'+ get a text tweak
    * on doc_id%13=0 rows (content-only change), the rest are identical.
    * Mirrors q_delta_detect's snapshot carve one level up: that op diffs
    * ROWS, this op diffs LEDGER ENTRIES — the O(#datasets) screen a
    * warehouse runs FIRST to decide which datasets need the row-level
    * diff at all. */
  val qReleaseDiff: Q = Q(
    "q_release_diff",
    """WITH old AS (
      |  SELECT source, COUNT(*) AS n_rows,
      |    CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT) % 4611686018427387904 AS BIGINT) AS fp
      |  FROM documents WHERE doc_id % 10 <> 3 AND source <> 'src16' GROUP BY source),
      |nw AS (
      |  SELECT source, COUNT(*) AS n_rows,
      |    CAST(SUM(('0x' || substr(md5(CASE WHEN doc_id % 13 = 0 AND source >= 'src8' THEN text || '!' ELSE text END), 1, 15))::BIGINT)
      |      % 4611686018427387904 AS BIGINT) AS fp
      |  FROM documents
      |  WHERE doc_id % 10 <> 3 AND source <> 'src5'
      |    AND NOT (doc_id % 13 = 5 AND source <= 'src4')
      |  GROUP BY source)
      |SELECT COALESCE(old.source, nw.source) AS dataset,
      |  COALESCE(nw.n_rows, 0) - COALESCE(old.n_rows, 0) AS rows_delta,
      |  old.fp IS DISTINCT FROM nw.fp AS content_changed,
      |  COALESCE(old.n_rows = nw.n_rows, FALSE) AND (old.fp IS DISTINCT FROM nw.fp) AS content_only_change,
      |  CASE WHEN old.n_rows IS NULL THEN 'added'
      |       WHEN nw.n_rows IS NULL THEN 'removed'
      |       ELSE 'common' END AS status
      |FROM old FULL JOIN nw ON old.source = nw.source
      |ORDER BY dataset""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    def release(pred: Column, content: Column): DataFrame =
      docs.filter(pred).groupBy("source")
        .agg(count(lit(1)).as("n_rows"),
          contentFp(content).as("fp"))
    val old = release(col("doc_id") % 10 =!= 3 && col("source") =!= "src16",
        col("text"))
      .select(col("source").as("src_o"), col("n_rows").as("old_n"),
        col("fp").as("old_fp"))
    val nw = release(
        col("doc_id") % 10 =!= 3 && col("source") =!= "src5" &&
          !(col("doc_id") % 13 === 5 && col("source") <= "src4"),
        when(col("doc_id") % 13 === 0 && col("source") >= "src8",
          concat(col("text"), lit("!"))).otherwise(col("text")))
      .select(col("source").as("src_n"), col("n_rows").as("new_n"),
        col("fp").as("new_fp"))
    old.join(nw, col("src_o") === col("src_n"), "full_outer")
      .select(coalesce(col("src_o"), col("src_n")).as("dataset"),
        (coalesce(col("new_n"), lit(0L)) - coalesce(col("old_n"), lit(0L)))
          .as("rows_delta"),
        (!(col("old_fp") <=> col("new_fp"))).as("content_changed"),
        (coalesce(col("old_n") === col("new_n"), lit(false)) &&
          !(col("old_fp") <=> col("new_fp"))).as("content_only_change"),
        when(col("old_n").isNull, "added").when(col("new_n").isNull, "removed")
          .otherwise("common").as("status"))
      .orderBy("dataset")
  }

  val all: Seq[Q] = Seq(qProvenanceAudit, qFanout, qReleaseDiff)
}
