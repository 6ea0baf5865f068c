package graft.sources

/** Small shared Hadoop-FS helpers for the sidecar/index maintainers. */
object FsUtil {

  /** Basenames of every `.parquet` file under `dir`, recursively — the
    * duplicate-exclusion and emptiness probes of the compact/screen
    * paths (one implementation: a future filter tweak, e.g. skipping
    * `_temporary` remnants, must not land on one copy and miss the
    * other). */
  def parquetBasenames(fs: org.apache.hadoop.fs.FileSystem,
                       dir: org.apache.hadoop.fs.Path): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        out += f.getPath.getName
    }
    out.toSeq
  }
}
