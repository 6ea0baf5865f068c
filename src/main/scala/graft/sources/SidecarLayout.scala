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

  /** The live sidecar directory `<path>/<name>` — or its `_prev` backup
    * if a staged [[replaceSidecar]] crashed between its renames. Sidecar
    * READS must resolve through this (the maintenance-consistency
    * contract: a reader at any crash point sees one complete sidecar,
    * never a missing or half-written one). */
  def sidecarDir(spark: SparkSession, path: String, name: String): String = {
    val p = new Path(s"$path/$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.live(fs, p).map(_.toString).getOrElse(p.toString)
  }

  /** Crash-safe sidecar replacement: stage the new sidecar at
    * `<path>/<name>_next`, then land it via [[AtomicSwap.commit]]. A
    * plain `mode("overwrite")` deletes the old sidecar before the new
    * one is committed — a reader (or a crash) in that window loses the
    * index entirely; the staged swap keeps a complete sidecar resolvable
    * at every instant and converges under re-runs. */
  def replaceSidecar(df: DataFrame, path: String, name: String,
                     crashAfter: Int = Int.MaxValue): Unit = {
    val cur = new Path(s"$path/$name")
    val fs = cur.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val next = AtomicSwap.nextOf(cur)
    fs.delete(next, true)
    df.coalesce(1).write.mode("overwrite").parquet(next.toString)
    AtomicSwap.commit(fs, cur, crashAfter = crashAfter)
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

  /** Retention vacuum for streaming `batch_id=` layouts (r7 verdict #9):
    * fold every batch dir EXCEPT the newest `keepLast` into the flat
    * region and delete them — the small-files cure that can run while
    * the stream's checkpoint still references recent batches. Unlike
    * [[compactSwap]] (which folds everything and must only run between
    * epochs), the kept batch dirs are COPIED into the staged snapshot
    * byte-identically, so a crash-replay of a recent batch still lands
    * as the same overwrite-idempotent `batch_id=` dir. keepLast must
    * cover the stream's replayable tail (≥ 1: only the latest
    * uncommitted batch can replay); expired batches are by definition
    * checkpoint-committed and can never be written again.
    *
    * Protocol: rebuild(flat + expired rows) → `<path>_next` (the same
    * indexed write that bootstrapped the dir, so the new flat region
    * carries a fresh minimal sidecar), copy kept batch dirs in, then
    * [[AtomicSwap.commit]] — a reader at every crash point resolves one
    * complete snapshot; re-runs converge. The sidecar `refresh` fns run
    * against the STAGED `next` directory BEFORE the commit (kept-batch
    * files get statted O(delta) into the staged sidecar; vanished
    * expired files were never in the rebuilt one) — so the swap is
    * atomic for sidecar-served reads too: at no instant does a resolved
    * snapshot carry a sidecar that misses kept-batch rows. Returns the
    * number of batch dirs expired. */
  def vacuumBatches(spark: SparkSession, path: String, keepLast: Int,
                    rebuild: (DataFrame, String) => Unit,
                    refresh: Seq[(SparkSession, String) => Int] = Nil,
                    crashAfter: Int = Int.MaxValue): Int = {
    require(keepLast >= 1, "keepLast must cover the stream's replayable tail")
    val cur = new Path(path)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveDir = AtomicSwap.live(fs, cur).map(_.toString).getOrElse(path)
    val batches = fs.listStatus(new Path(liveDir)).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
      .sortBy(st => st.getPath.getName.stripPrefix("batch_id=").toLong)
    val keep = batches.takeRight(keepLast).map(_.getPath)
    val expire = batches.dropRight(keepLast).map(_.getPath)
    if (expire.isEmpty) {
      // nothing to expire: finish a predecessor that crashed after its
      // swap — delete the stale backup AND run the sidecar refreshes it
      // never reached (the rebuilt sidecar only covers the folded rows;
      // without this, kept-batch files stay unindexed and sidecar-served
      // lookups silently lose their rows)
      if (liveDir == cur.toString) fs.delete(AtomicSwap.prevOf(cur), true)
      refresh.foreach(f => f(spark, path): Unit)
      return 0
    }
    val keepNames = keep.map(_.getName).toSet
    // flat region + expired batches = every data file NOT in a kept batch
    val fold = dataFiles(spark, liveDir)
      .filterNot(st => keepNames(st.getPath.getParent.getName))
      .map(_.getPath.toString)
    val next = AtomicSwap.nextOf(cur)
    fs.delete(next, true)
    rebuild(spark.read.parquet(fold: _*), next.toString)
    // kept batches ride along byte-identically (names included), so a
    // replay overwrite of a recent batch dir behaves exactly as before
    keep.foreach { b =>
      require(org.apache.hadoop.fs.FileUtil.copy(
        fs, b, fs, new Path(next, b.getName), false, true,
        spark.sparkContext.hadoopConfiguration),
        s"vacuum: copy of kept batch $b failed")
    }
    // refresh the staged sidecar BEFORE the commit: the rebuilt sidecar
    // covers only folded rows; statting the kept-batch copies here means
    // the snapshot that lands is sidecar-complete at the commit instant
    // (and at every crash point — the reader resolves either the old
    // complete snapshot or this one)
    refresh.foreach(f => f(spark, next.toString): Unit)
    AtomicSwap.commit(fs, cur, crashAfter = crashAfter)
    expire.length
  }
}
