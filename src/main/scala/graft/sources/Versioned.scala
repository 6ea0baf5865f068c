package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned snapshot table with partition-level structural sharing —
  * the table-format capability trio (snapshot isolation, time travel,
  * incremental commits) on plain parquet (SURVEY.md §2.1 sink_versioned).
  *
  * Layout under `tableDir`:
  *   data/v<N>/__p=<part>/  — parquet of partitions (re)written by commit N
  *   manifest/v<N>.manifest — TSV: partition value → data path
  *
  * A commit upserts a delta batch: only partitions carrying delta rows
  * are rewritten (ONE Spark job — the merged touched set writes
  * `partitionBy` into the new version dir); every other partition's
  * manifest entry still points at the files an EARLIER version wrote, so
  * at 100 TB a daily commit costs O(touched partitions), not O(table),
  * and old snapshots stay readable forever (vacuum is a policy choice).
  * The manifest rename is the single atomic commit point: a crash
  * mid-commit leaves an orphaned data dir that no manifest references —
  * never a torn snapshot. Readers resolve a manifest once and read a
  * fixed file set: snapshot isolation without locks.
  *
  * The partition column is duplicated into `__p` for the physical
  * layout so the real column survives inside the data files — readers
  * open leaf dirs directly (no partition inference), which is what lets
  * one snapshot mix dirs from many versions.
  *
  * Reference analog: every loader's "load N of dataset X" bookkeeping
  * (loaders/TCRD.py ins_dataset/ins_provenance) — here the bookkeeping
  * IS the table. */
object Versioned {

  private def hfs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val ManifestRe = """v(\d+)\.manifest""".r

  /** Highest committed version, 0 if none. */
  def latestVersion(spark: SparkSession, tableDir: String): Int = {
    val fs = hfs(spark, tableDir)
    val md = new Path(tableDir, "manifest")
    if (!fs.exists(md)) 0
    else fs.listStatus(md).map(_.getPath.getName).collect {
      case ManifestRe(n) => n.toInt
    }.foldLeft(0)(math.max)
  }

  /** partition value → data dir for snapshot `v`. */
  def readManifest(spark: SparkSession, tableDir: String, v: Int): Map[String, String] = {
    val fs = hfs(spark, tableDir)
    val p = new Path(tableDir, s"manifest/v$v.manifest")
    require(fs.exists(p), s"no version $v at $tableDir")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { line =>
      val i = line.indexOf('\t')
      line.substring(0, i) -> line.substring(i + 1)
    }.toMap
    finally in.close()
  }

  /** Upsert `delta` as the next version; returns its number. Only
    * partitions present in the delta are rewritten. */
  def commit(spark: SparkSession, tableDir: String, delta: DataFrame,
             partCol: String, keyCol: String, versionCol: String): Int = {
    val prev = latestVersion(spark, tableDir)
    val prevMap = if (prev == 0) Map.empty[String, String]
                  else readManifest(spark, tableDir, prev)
    val touched = delta.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    // manifest is TSV and the value becomes a literal dir name — keep to
    // characters Spark's partition-path escaping leaves untouched
    require(touched.forall(_.matches("[A-Za-z0-9_.=-]+")),
      s"partition values must be path/manifest-safe, got: $touched")
    val next = prev + 1
    val dataDir = s"$tableDir/data/v$next"
    val prevTouched = touched.flatMap(prevMap.get)
    val base =
      if (prevTouched.isEmpty) delta.limit(0)
      else spark.read.parquet(prevTouched: _*)
    graft.operators.MergeOps.upsert(base, delta, keyCol, versionCol)
      .withColumn("__p", col(partCol).cast("string"))
      .write.mode("errorifexists").partitionBy("__p").parquet(dataDir)
    val newMap = prevMap ++ touched.map(p => p -> s"$dataDir/__p=$p")
    val fs = hfs(spark, tableDir)
    val mDir = new Path(tableDir, "manifest")
    fs.mkdirs(mDir)
    val tmp = new Path(mDir, s".v$next.manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write(newMap.toSeq.sorted.map { case (p, d) => s"$p\t$d\n" }
      .mkString.getBytes("UTF-8"))
    finally out.close()
    // the commit point: readers either see v<next> complete or not at all
    require(fs.rename(tmp, new Path(mDir, s"v$next.manifest")),
      s"commit rename failed for v$next")
    next
  }

  /** Snapshot read: the fixed file set manifest `v` recorded. */
  def readVersion(spark: SparkSession, tableDir: String, v: Int): DataFrame = {
    val paths = readManifest(spark, tableDir, v).values.toSeq.sorted
    spark.read.parquet(paths: _*)
  }

  /** Retention: drop snapshots older than the last `keepLast`, then
    * delete every partition dir no surviving manifest references —
    * including orphans from crashed commits. Runs driver-side over
    * manifest metadata only (O(versions × partitions) strings, no data
    * scan); deletion is partition-dir granular, matching the commit
    * granularity. Readers of retained versions are untouched. */
  def vacuum(spark: SparkSession, tableDir: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val fs = hfs(spark, tableDir)
    val latest = latestVersion(spark, tableDir)
    if (latest == 0) return
    val keep = (math.max(1, latest - keepLast + 1) to latest).toSeq
    val referenced = keep.flatMap(v =>
      readManifest(spark, tableDir, v).values)
      .map(r => new Path(r).toUri.getPath).toSet
    (1 until keep.head).foreach { v =>
      fs.delete(new Path(tableDir, s"manifest/v$v.manifest"), false)
      ()
    }
    val dataRoot = new Path(tableDir, "data")
    if (fs.exists(dataRoot)) {
      fs.listStatus(dataRoot).filter(_.isDirectory).foreach { vd =>
        fs.listStatus(vd.getPath).filter(_.isDirectory).foreach { pd =>
          if (!referenced.contains(pd.getPath.toUri.getPath)) {
            fs.delete(pd.getPath, true)
            ()
          }
        }
        // only commit markers (_SUCCESS) left → the version holds no data
        if (!fs.listStatus(vd.getPath).exists(_.isDirectory)) {
          fs.delete(vd.getPath, true)
          ()
        }
      }
    }
  }

  /** Time-travel diff: rows added or changed between two snapshots
    * (per-key latest state; `exceptAll` on full rows). Deletions don't
    * exist in upsert-only history; compose with MergeOps.deleteByKey
    * semantics downstream if needed. */
  def changedBetween(spark: SparkSession, tableDir: String,
                     vFrom: Int, vTo: Int): DataFrame =
    readVersion(spark, tableDir, vTo)
      .exceptAll(readVersion(spark, tableDir, vFrom))
}
