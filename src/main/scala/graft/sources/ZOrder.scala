package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout (SURVEY.md §2.1 sink_zorder): the
  * multi-dimensional file-skipping lever. A 1-D sort (sink_sorted) gives
  * tight per-file min/max stats on ONE key — queries on any other key scan
  * every file. Interleaving the bits of two bucketed keys into one Morton
  * code and range-partitioning on it keeps files tight on BOTH dimensions
  * (each file covers a small rectangle of the key space), so min/max
  * pruning works for either predicate — the Spark-native analog of the
  * reference warehouse's composite/secondary indexes, and of Z-ORDER in
  * public lakehouse formats.
  *
  * Bucketing is equi-width over the observed min/max (one tiny aggregate);
  * heavily skewed keys would want equi-depth (quantile) boundaries — same
  * plan shape, boundary array from approxQuantile instead. 8 bits per
  * dimension (256×256 cells) is plenty to steer file-grain placement:
  * resolution only needs to exceed the file count.
  */
object ZOrder {

  /** Morton code: interleave the low 8 bits of two bucket ids (built as a
    * static expression tree — codegen'd, no UDF). */
  def morton8(x: Column, y: Column): Column =
    (0 until 8).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Write `df` laid out on the Morton curve of (colA, colB) into `nFiles`
    * range partitions, with a per-file min/max sidecar on both columns for
    * file skipping (`_minmax_index`). */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    nFiles: Int): Unit = {
    val b = df.agg(
      min(col(colA)).as("amin"), max(col(colA)).as("amax"),
      min(col(colB)).as("bmin"), max(col(colB)).as("bmax")).head()
    val (amin, amax) = (b.getAs[Number]("amin").doubleValue(), b.getAs[Number]("amax").doubleValue())
    val (bmin, bmax) = (b.getAs[Number]("bmin").doubleValue(), b.getAs[Number]("bmax").doubleValue())
    def bucket(c: Column, lo: Double, hi: Double): Column =
      least(lit(255), floor((c.cast("double") - lit(lo)) / lit((hi - lo) / 256.0 + 1e-12)))
        .cast("long")
    val z = morton8(bucket(col(colA), amin, amax), bucket(col(colB), bmin, bmax))
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
    writeMinMaxIndex(df.sparkSession, path, colA, colB)
  }

  /** 1-D comparison layout: range-partition + sort on colA only, same
    * sidecar (what sink_sorted produces; the baseline z-order beats on
    * colB predicates). */
  def writeSortedBy(df: DataFrame, path: String, colA: String, colB: String,
                    nFiles: Int): Unit = {
    df.repartitionByRange(nFiles, col(colA)).sortWithinPartitions(colA)
      .write.mode("overwrite").parquet(path)
    writeMinMaxIndex(df.sparkSession, path, colA, colB)
  }

  private def writeMinMaxIndex(spark: SparkSession, path: String,
                               colA: String, colB: String): Unit =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("amin"), max(col(colA)).as("amax"),
        min(col(colB)).as("bmin"), max(col(colB)).as("bmax"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_minmax_index")

  /** Range scan `lo <= which <= hi` via the sidecar: scan only files whose
    * [min,max] interval on `which` (colA or colB position recorded at
    * write) overlaps. Returns (rows, files scanned) so specs can observe
    * the skipping. Sidecar size = file count — driver-safe by
    * construction. */
  def rangeLookup(spark: SparkSession, path: String, which: String,
                  whichPos: Int, lo: Double, hi: Double): (DataFrame, Seq[String]) = {
    val (mn, mx) = if (whichPos == 0) ("amin", "amax") else ("bmin", "bmax")
    val files = spark.read.parquet(s"$path/_minmax_index")
      .filter(col(mx).cast("double") >= lo && col(mn).cast("double") <= hi)
      .collect().map(_.getAs[String]("file")).toSeq
    val df =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*)
        .filter(col(which).cast("double").between(lo, hi))
    (df, files)
  }
}
