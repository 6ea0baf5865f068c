package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition frequency sidecar (SURVEY.md §2.1 sink_freq_index):
  * a count-min sketch per data partition, built in one distributed pass
  * at write time and persisted as `_freq_index` next to the data — the
  * frequency complement to [[ZoneIndex]]'s range/NDV stats and
  * [[FileIndex]]'s membership blooms.
  *
  * "How often does key x occur in partition p / the whole table?" then
  * reads SIDECAR BYTES only — no data scan — with the CMS guarantee
  * (est ≥ true, ≤ true + εN w.h.p.). Because CMS counters add, the
  * global answer is the byte-merge of the partition sketches, and an
  * appended partition contributes one new sidecar row while existing
  * rows stay byte-identical — daily sketches fold into weekly/monthly
  * without replay, the same maintenance story as the versioned sinks.
  *
  * At 100 TB the sidecar is #partitions × (8 + 8·d·w) bytes —
  * planner-sized. Probes collect it to the driver; the merge loop is
  * partition-count-sized, never data-sized.
  */
object FreqIndex {

  private def sidecarOf(root: String) = s"$root/_freq_index"

  /** Resolve the serving root through [[AtomicSwap.live]]: the snapshot
    * itself, or the `_prev` backup if a crash caught a rebuild between
    * its two renames — so data and sidecar (which lives INSIDE the
    * snapshot dir) always come from the SAME complete snapshot. */
  def liveRoot(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.live(fs, p)
      .getOrElse(throw new IllegalStateException(s"no live snapshot at $path"))
      .toString
  }

  /** Build one CMS row per `partCol` value. The key is hashed through a
    * STRING normalization (`xxhash64(cast(key as string))`) so that
    * probe-side string keys hash identically whatever the column's
    * physical type — a LongType key column and the probe string "42"
    * agree by construction. */
  private def sketchRows(data: DataFrame, partCol: String, keyCol: String,
                         width: Int, depth: Int): DataFrame =
    data.groupBy(col(partCol).as("part"))
      .agg(graft.functions.CmsAgg.agg(
        xxhash64(col(keyCol).cast("string")), width, depth).as("cms"),
        count(lit(1)).as("n_rows"))

  /** Write `df` partitioned by `partCol` with a per-partition frequency
    * sketch over `keyCol` in the `_freq_index` sidecar. Data AND sidecar
    * stage into one `<path>_next` snapshot and land via the shared
    * [[AtomicSwap]] commit, so no crash point can expose new data with a
    * stale sidecar (or vice versa) — a reader through [[liveRoot]]
    * always sees a matching pair. */
  def writeWithFreqIndex(df: DataFrame, path: String, partCol: String,
                         keyCol: String, width: Int = 1024, depth: Int = 4,
                         crashAfter: Int = Int.MaxValue): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val next = AtomicSwap.nextOf(p).toString
    fs.delete(new Path(next), true)
    df.write.mode("overwrite").partitionBy(partCol).parquet(next)
    // sketch from the WRITTEN files, not from df: a second evaluation of
    // df (non-deterministic source, or an upstream mutated between the
    // two jobs) could commit a sketch over a different row set than the
    // data — the exact torn pair the swap exists to rule out
    sketchRows(df.sparkSession.read.parquet(next), partCol, keyCol, width, depth)
      .write.mode("overwrite").parquet(sidecarOf(next))
    AtomicSwap.commit(fs, p, crashAfter = crashAfter)
  }

  /** Append one new partition's rows AND its sidecar sketch; existing
    * data files and sidecar rows are not rewritten. Sketch dimensions
    * are READ FROM THE EXISTING SIDECAR (first row's header bytes),
    * never caller-supplied — a mismatched-width append would poison
    * every future byte-merge, and the sidecar has no repair path short
    * of a rebuild. Caller contract: the batch holds exactly the new
    * `partCol` value(s) (the upsert sinks own the overwrite-existing
    * case).
    *
    * Appends REFUSE to run while a crashed rebuild's swap is pending
    * (live snapshot == the `_prev` backup): rows appended into the
    * backup would be deleted by the rebuild's re-run commit AFTER this
    * call acknowledged them — finish (re-run) the rebuild first.
    *
    * Step ORDER is load-bearing: the sidecar row lands BEFORE the data.
    * A crash between the two leaves the sketch counting rows that never
    * arrived — an OVER-count, which the est ≥ true contract absorbs.
    * The reverse order would leave arrived rows uncounted: a silent
    * UNDER-count that breaks every probe's guarantee. A re-run after a
    * crash appends a second sidecar row for the partition (again
    * over-count only); a [[writeWithFreqIndex]] rebuild restores
    * tightness. `crashBeforeData` is the test hook proving the window.
    *
    * `df` is evaluated ONCE: the batch stages into an underscore-hidden
    * dir (invisible to parquet readers of the root), and BOTH the
    * sidecar sketch and the committed data read back those immutable
    * staged files. Sketching `df` and then re-evaluating it for the
    * data write would let a non-deterministic input (or a source
    * mutated between the two jobs) commit a sketch over a DIFFERENT
    * row set than the data — an UNDER-count the contract can't absorb.
    * Cost: one extra delta-sized write; deltas are batch-sized. */
  def appendPartition(df: DataFrame, path: String, partCol: String,
                      keyCol: String, crashBeforeData: Boolean = false): Unit = {
    val spark = df.sparkSession
    val root = liveRoot(spark, path)
    require(root == new Path(path).toString || !root.endsWith("_prev"),
      s"append refused: a crashed rebuild's swap is pending at $path " +
        "(live snapshot is the _prev backup; re-run the rebuild first, " +
        "or rows appended now would be deleted by its commit)")
    val header = spark.read.parquet(sidecarOf(root))
      .select(col("cms")).head().getAs[Array[Byte]](0)
    val dims = graft.functions.CmsAgg.fromBytes(header)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(root, "_append_stage")
    fs.delete(stage, true)
    df.write.mode("overwrite").partitionBy(partCol).parquet(stage.toString)
    // read back under df's OWN schema: partition-column type inference
    // would otherwise rewrite non-canonical values (string "007" becomes
    // int 7), splitting one logical partition across two directories and
    // mislabeling its sidecar row
    val staged = spark.read.schema(df.schema).parquet(stage.toString)
    sketchRows(staged, partCol, keyCol, dims.width, dims.depth)
      .write.mode("append").parquet(sidecarOf(root))
    if (crashBeforeData) throw AtomicSwap.CrashPoint(1)
    staged.write.mode("append").partitionBy(partCol).parquet(root)
    fs.delete(stage, true)
  }

  /** Estimated count of each probe key, per partition and globally —
    * reads ONLY the sidecar. Returns (key, part, est) rows with
    * part = "*" for the byte-merged global sketch. */
  def probe(spark: SparkSession, path: String,
            keys: Seq[String]): DataFrame = {
    import spark.implicits._
    // deserialize each sketch ONCE; per-key estimates then read the live
    // buffers (keys × partitions buffer probes, no repeated byte copying)
    val side = spark.read.parquet(sidecarOf(liveRoot(spark, path)))
      .select(col("part").cast("string"), col("cms"))
      .collect().map(r => r.getString(0) -> graft.functions.CmsAgg.fromBytes(r.getAs[Array[Byte]](1)))
    require(side.nonEmpty, s"empty _freq_index at $path")
    val global = {
      val (d0, w0) = (side.head._2.depth, side.head._2.width)
      require(side.forall { case (_, b) => b.depth == d0 && b.width == w0 },
        s"corrupt _freq_index at $path: mixed sketch dimensions")
      val g = new graft.functions.CmsBuffer(d0, w0)
      side.foreach { case (_, b) => g.mergeFrom(b) }
      g
    }
    // hash exactly as the writer did: xxhash64 over the STRING form
    val keyHash = keys.toDF("key").select(col("key"), xxhash64(col("key")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val rows = for {
      (k, h) <- keyHash.toSeq
      (p, buf) <- side.toSeq :+ ("*" -> global)
    } yield (k, p, buf.estimate(h))
    rows.toDF("key", "part", "est").orderBy("key", "part")
  }
}
