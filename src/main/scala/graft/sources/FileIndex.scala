package graft.sources

import java.io.ByteArrayInputStream

import graft.functions.BloomAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter skipping index (SURVEY.md §2.1 sink_bloom_index):
  * the Spark-native analog of the reference warehouse's secondary indexes
  * (every MySQL table in SQL/create-TCRDv6.sql carries point-lookup
  * indexes; a data lake gets the same effect by skipping FILES, not rows).
  *
  * Write path: after the data lands, ONE pass keyed on input file builds a
  * [[BloomAgg]] bloom per file (distributed aggregate — the filter never
  * exists un-merged on the driver) and stores them in a `_bloom_index`
  * sidecar next to the data. Sidecar size = #files × filter bytes.
  *
  * Read path: deserialize the sidecar (files-count-sized, driver-safe by
  * construction — it is the file LIST, which the planner already holds),
  * keep the files whose filter might contain the key, and scan only
  * those. For data clustered on the key (repartition-by-key writes, the
  * normal ingest layout), a point lookup touches ~1 file instead of all —
  * min/max pruning can't do this for keys uncorrelated with sort order.
  * False positives only cost an extra file scan; never correctness.
  */
object FileIndex {

  /** Write `df` clustered by `keyCol`, then build the per-file bloom
    * sidecar at `path/_bloom_index`. `expectedPerFile` sizes the filters
    * (items per file, not total). */
  /** One bloom row per file of `data`: (file, bloom, key, expected, fpp).
    * The key column and filter parameters ride along in the sidecar so
    * incremental refresh needs no arguments and cannot drift from the
    * original index configuration. */
  private def bloomRows(data: DataFrame, keyCol: String,
                        expectedPerFile: Long, fpp: Double): DataFrame =
    data.select(input_file_name().as("file"), col(keyCol).as("k"))
      .groupBy("file")
      .agg(BloomAgg.agg(col("k"), expectedPerFile, fpp).as("bloom"))
      .withColumn("key", lit(keyCol))
      .withColumn("expected", lit(expectedPerFile))
      .withColumn("fpp", lit(fpp))

  def writeWithBloomIndex(df: DataFrame, path: String, keyCol: String,
                          nFiles: Int, expectedPerFile: Long = 100000L,
                          fpp: Double = 0.01): Unit = {
    df.repartition(nFiles, col(keyCol)).write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    bloomRows(spark.read.parquet(path), keyCol, expectedPerFile, fpp)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_bloom_index")
  }

  /** Incremental sidecar maintenance under append ingest — the
    * [[ZoneIndex.refreshIncremental]] story for the bloom index: build
    * filters ONLY for the data files the sidecar doesn't know yet (an
    * O(delta) scan, never a table rescan) and append their rows. Key
    * column and filter sizing are read from the existing sidecar; an
    * immutable file's filter never changes, so existing rows stand and
    * a refresh with nothing new appends nothing. Data files may sit flat
    * or in `batch_id=<n>` subdirs ([[SidecarLayout]]); rows of VANISHED
    * files (replayed micro-batch, compaction) are pruned in the same
    * pass. Returns the number of newly indexed files. */
  def refreshIncremental(spark: SparkSession, path: String,
                         crashAfter: Int = Int.MaxValue): Int = {
    val canonical = s"$path/_bloom_index"
    val sideDir = SidecarLayout.sidecarDir(spark, path, "_bloom_index")
    val side = spark.read.parquet(sideDir)
    val head = side.select("key", "expected", "fpp").head()
    val (keyCol, expected, fpp) =
      (head.getString(0), head.getLong(1), head.getDouble(2))
    val known = side.select("file").collect().map(_.getString(0))
      .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    val disk = SidecarLayout.dataFiles(spark, path)
    val diskNames = disk.map(_.getPath.getName).toSet
    val fresh = disk.filter(st => !known.contains(st.getPath.getName))
      .map(_.getPath.toString)
    val stale = known -- diskNames
    // sideDir != canonical: a previous replace crashed half-swapped —
    // heal through the staged-replace path even with nothing new
    if (fresh.isEmpty && stale.isEmpty && sideDir == canonical) {
      // finish a post-swap-crashed replace's cleanup (stale backup)
      val p = new org.apache.hadoop.fs.Path(canonical)
      val fsP = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsP.delete(AtomicSwap.prevOf(p), true)
      0
    } else {
      val freshRows = Option.when(fresh.nonEmpty)(
        bloomRows(spark.read.parquet(fresh: _*), keyCol, expected, fpp))
      if (stale.isEmpty && sideDir == canonical)
        freshRows.get.coalesce(1).write.mode("append").parquet(canonical)
      else {
        // replay/heal path via the crash-safe staged swap — a reader at
        // any crash point still resolves a complete sidecar
        val kept = side.filter(
          element_at(split(col("file"), "/"), -1).isInCollection(diskNames))
        SidecarLayout.replaceSidecar(
          freshRows.fold(kept)(kept.unionByName(_)).localCheckpoint(true),
          path, "_bloom_index", crashAfter)
      }
      fresh.length
    }
  }

  /** Point lookup via the sidecar: scan only files whose bloom might
    * contain `value`. Returns (matched rows, files scanned) so callers
    * and specs can observe the skipping. Candidate paths resolve by
    * BASENAME against the live listing, so the sidecar survives
    * directory moves/renames (compactSwap builds it under `_next`); the
    * listing itself resolves through [[AtomicSwap.live]] so a reader
    * landing between a swap's two renames (dir momentarily at `_prev`)
    * still sees one complete snapshot — same contract as
    * [[SidecarLayout.readData]]. */
  def pointLookup(spark: SparkSession, path: String, keyCol: String,
                  value: Long): (DataFrame, Seq[String]) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveDir = AtomicSwap.live(fs, p).map(_.toString).getOrElse(path)
    val live = SidecarLayout.dataFiles(spark, liveDir)
      .map(st => st.getPath.getName -> st.getPath.toString).toMap
    val candidates = spark.read
      .parquet(SidecarLayout.sidecarDir(spark, liveDir, "_bloom_index"))
      .collect() // sidecar = one row per data file
      .filter { r =>
        BloomFilter.readFrom(new ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
          .mightContainLong(value)
      }
      .map(_.getAs[String]("file"))
      .flatMap(f => live.get(f.substring(f.lastIndexOf('/') + 1))).toSeq
    val df =
      if (candidates.isEmpty) // schema-stable empty, discovery-free
        SidecarLayout.readData(spark, path).filter(lit(false))
      else
        spark.read.parquet(candidates: _*).filter(col(keyCol) === value)
    (df, candidates)
  }
}
