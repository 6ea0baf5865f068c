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
    val files = dataFiles(spark, path).map(_.getPath.toString)
    require(files.nonEmpty, s"readData: no data files under $path")
    spark.read.parquet(files: _*)
  }
}
