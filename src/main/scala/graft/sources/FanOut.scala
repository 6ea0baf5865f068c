package graft.sources

import graft.operators.ProvenanceOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One-scan multi-sink fan-out write — the loader-shaped sink the
  * reference's XML loaders need: one parsed record fans out into MANY
  * tables (loaders/load-UniProt.py:127 `ins_target` inserts one parsed
  * UniProt entry into protein + xref + alias + feature + goa rows via the
  * 47 `ins_*` methods of loaders/TCRD.py). Expressing the N projections is
  * easy; the trap is that N separate `.write` calls re-run the parse N
  * times — on a 100 TB XML dump that is N full parse passes.
  *
  * [[FanOut.writeFanOut]] materializes the parsed scan ONCE
  * (`persist(MEMORY_AND_DISK)` — spill-safe, partition-local, no shuffle),
  * then every sink projection reads the cached blocks: the expensive
  * parse/decode runs exactly once regardless of sink count, and each
  * sink's write stays a column-pruned projection of the in-memory rows.
  * FanOutSpec proves the single-scan property from the executed plans
  * (each write command scans InMemoryTableScan, never the source files).
  *
  * Each sink also gets a provenance ledger row (dataset, source,
  * loaded_at_us, n_rows, content_fp) — the reference records every load
  * in its dataset/provenance tables (loaders/TCRD.py:384 ins_dataset,
  * :412 ins_provenance). Fingerprints follow [[ProvenanceOps]]'s
  * order-independent checksum over what was actually PERSISTED.
  */
object FanOut {

  /** One sink of a fan-out write: a named projection of the parsed
    * record stream and its destination path. */
  final case class Sink(name: String, project: DataFrame => DataFrame, path: String)

  /** Order-independent content column for a persisted sink: all columns,
    * in schema order, joined with a \u0001 separator (concat_ws skips
    * nulls identically in Spark and DuckDB, so ledger fingerprints stay
    * oracle-checkable). */
  def contentAllColumns(df: DataFrame): org.apache.spark.sql.Column =
    concat_ws("\u0001", df.columns.map(c => col(c).cast("string")).toSeq: _*)

  /** Parse once, write N sinks. Returns per-sink persisted row counts.
    *
    * @param parsed     the parsed record stream (e.g. [[Tables.readXml]] /
    *                   [[Tables.readOboTerms]] output, already projected to
    *                   the fields the sinks need — keep it narrow: the
    *                   cache holds exactly these columns)
    * @param provDir    when set, append one ledger row per sink
    * @param loadedAtUs caller-supplied load timestamp / batch id (the
    *                   ledger never reads the wall clock — reruns are
    *                   reproducible)
    * @param source     ledger source tag (e.g. the dump's filename)
    */
  /** @param storageLevel how the materialized parse is held between sink
    *                      writes. MEMORY_AND_DISK suits most loads; for a
    *                      parse wider than cluster memory use
    *                      `StorageLevel.DISK_ONLY` (sequential re-reads of
    *                      local serialized blocks still beat re-parsing
    *                      the source N times). */
  def writeFanOut(parsed: DataFrame, sinks: Seq[Sink],
                  provDir: Option[String] = None,
                  loadedAtUs: Long = 0L,
                  source: String = "fanout",
                  storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK): Map[String, Long] = {
    require(sinks.nonEmpty, "writeFanOut: no sinks")
    require(sinks.map(_.name).distinct.size == sinks.size,
      "writeFanOut: duplicate sink names")
    val spark = parsed.sparkSession
    val cached = parsed.persist(storageLevel)
    try {
      // materialize the parse up front so every sink (including the first)
      // reads cached blocks, and a sink failure can't leave a half-built
      // cache racing another sink's scan
      cached.count()
      val counts = sinks.map { sk =>
        val proj = sk.project(cached)
        proj.write.mode("overwrite").parquet(sk.path)
        // read back what was persisted (same contract as
        // ProvenanceOps.writeWithProvenance: the ledger describes the bytes
        // on disk, not the incoming plan)
        sk.name -> spark.read.parquet(sk.path).count()
      }.toMap
      // append ALL ledger rows only after every sink committed: a failure
      // at sink k followed by a rerun would otherwise leave duplicate
      // rows for sinks 1..k-1 (the data writes are overwrite-idempotent;
      // a bare append is not). One union'd single append narrows the
      // non-atomic window to the final ledger write itself; consumers can
      // additionally dedupe on (dataset, loaded_at_us).
      provDir.foreach { pd =>
        sinks.map { sk =>
          val persisted = spark.read.parquet(sk.path)
          ProvenanceOps.datasetFingerprint(persisted, contentAllColumns(persisted))
            .select(lit(sk.name).as("dataset"), lit(source).as("source"),
              lit(loadedAtUs).as("loaded_at_us"), col("n_rows"), col("content_fp"))
        }.reduce(_ unionByName _)
          .write.mode("append").parquet(pd)
      }
      counts
    } finally {
      cached.unpersist()
      ()
    }
  }
}
