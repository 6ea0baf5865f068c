package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared file-layout helpers for the skipping sidecars ([[FileIndex]],
  * [[ZoneIndex]]): an indexed directory may hold its data files flat
  * (the batch bootstrap write) AND in `batch_id=<n>` subdirectories (the
  * overwrite-idempotent streaming appends — same convention as the
  * fan-out sink). Underscore/dot-prefixed entries (`_bloom_index`,
  * `_zone_index`, `_spark_metadata`, temp dirs) are never data.
  *
  * That mixed layout breaks Spark's partition DISCOVERY (leaf dirs at
  * different depths), which is why every sidecar read path works from an
  * EXPLICIT file list instead: discovery-free, schema = the data columns,
  * and the list is exactly what the sidecar indexes. The listing itself
  * is planner-sized (the driver already holds the file list of any table
  * it plans a scan over).
  */
object SidecarLayout {

  /** All `part-` data files under `path`, at any depth, skipping
    * underscore/dot-prefixed files and directories. */
  def dataFiles(spark: SparkSession, path: String): Seq[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: Path): Seq[FileStatus] =
      fs.listStatus(d).toIndexedSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else if (n.startsWith("part-")) Seq(st)
        else Nil
      }
    walk(p)
  }

  /** Read every data file under `path` as one DataFrame via the explicit
    * file list — the discovery-free full read for mixed flat + batch-dir
    * layouts. Spark part-file names carry a per-job UUID, so basenames
    * identify files across nesting. */
  def readData(spark: SparkSession, path: String): DataFrame = {
    // serve the swap backup if a compact crashed between its renames —
    // `path` is then momentarily absent but `path_prev` is complete
    // (AtomicSwap.live; SwapConsistencySpec pins the window)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = AtomicSwap.live(fs, p).map(_.toString).getOrElse(path)
    val files = dataFiles(spark, dir).map(_.getPath.toString)
    require(files.nonEmpty, s"readData: no data files under $dir")
    spark.read.parquet(files: _*)
  }

  /** Compact a streamed indexed directory back to a clean flat layout:
    * `rebuild` re-writes the full data (one row set, any mix of flat +
    * batch dirs) into a fresh sibling `<path>_next` — callers pass the
    * SAME indexed write that bootstrapped the dir
    * (`writeWithBloomIndex` / `writeWithZoneIndex`), so the rebuilt dir
    * carries a correct, minimal sidecar by construction — then the dirs
    * swap via rename-to-backup (the upsertSink/AnnIndex.compact
    * pattern: at every instant `<path>` or `<path>_prev` holds a
    * complete copy; a crash before the swap leaves `<path>` untouched
    * and `_next` to be overwritten by the re-run). Run between
    * streaming epochs (stop the append query; restart with a fresh
    * checkpoint dir — the batch-id sequence resets with it). This is
    * the small-files cure for indexedAppendSink: per-batch dirs
    * accumulate one file per batch and planning degrades long before
    * data size does. Returns the compacted row count. */
  def compactSwap(spark: SparkSession, path: String,
                  rebuild: (DataFrame, String) => Unit): Long = {
    val cur = new Path(path)
    val next = new Path(path + "_next")
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(next, true)
    // readData resolves the live dir itself (falls back to _prev when a
    // prior compact crashed half-swapped), so the re-run recovers
    rebuild(readData(spark, path), next.toString)
    val n = readData(spark, next.toString).count()
    AtomicSwap.commit(fs, cur, keepBackup = true)
    n
  }
}
