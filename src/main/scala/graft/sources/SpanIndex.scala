package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted SPAN-DECONTAMINATION index: the distinct L-byte rolling
  * window hashes of the benchmark suite ([[graft.functions.RollingHash]]
  * — the q_span_decontam machinery's eval side, frozen to parquet). A
  * benchmark suite is published once; every later crawl screens against
  * this artifact without re-hashing the suite. Benchmark-sized by
  * construction (≤ one row per suite byte), so the screen side
  * BROADCASTS and an arriving corpus never shuffles — the decontam
  * orientation of [[graft.ops.Dedup.NearDupIndex.screen]] carried down
  * to the span level.
  *
  * Screening is PER-DOC against the frozen hash set (no batch↔batch
  * state), so it is compositional: micro-batching never changes a doc's
  * spans — the streaming sink ([[graft.streaming.StreamingOps
  * .spanScreenSink]]) unions to exactly the one-shot screen. */
object SpanIndex {

  /** Window length is part of the layout (a screen must hash with the
    * SAME L the index was built with — a mismatch finds nothing and
    * would read as "no leaks"): persisted in the dir name's sidecar. */
  private def metaPath(path: String) = s"$path/_span_l"

  def build(bench: DataFrame, path: String, l: Int = 50): Unit = {
    val spark = bench.sparkSession
    bench
      .select(explode(graft.functions.RollingHash(col("text"), l)).as("hh"))
      .distinct()
      .write.mode("overwrite").parquet(s"$path/hashes")
    val p = new org.apache.hadoop.fs.Path(metaPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(l.toString.getBytes("UTF-8")) finally out.close()
  }

  def windowLength(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(metaPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8).trim.toInt
    finally in.close()
  }

  /** Per-doc leaked-span report of `batch` against the frozen hash set —
    * (doc_id, n_leaked_spans, leaked_bytes, leaked_frac), every batch
    * doc reporting (zeros when clean). `hashes` may be pre-read and
    * persisted by the caller (the streaming sink does, via FrozenSides);
    * pass None to read fresh from the index. */
  def screen(spark: SparkSession, path: String, batch: DataFrame,
             hashes: Option[DataFrame] = None): DataFrame = {
    val spans = extents(spark, path, batch, hashes)
    val agg = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_leaked_spans"),
        sum(col("e") - col("s")).cast("long").as("leaked_bytes"))
    batch.select(col("doc_id"), octet_length(col("text")).as("nlen"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_leaked_spans"), lit(0L)).as("n_leaked_spans"),
        coalesce(col("leaked_bytes"), lit(0L)).as("leaked_bytes"),
        round(coalesce(col("leaked_bytes"), lit(0L)).cast("double") /
          col("nlen").cast("double"), 6).as("leaked_frac"))
  }

  /** The leaked-span EXTENTS themselves — (doc_id, s, e) maximal byte
    * ranges (0-based, end exclusive) of `batch` docs that verbatim-occur
    * in the indexed suite; the strip sink's input ([[screen]] is the
    * per-doc aggregate view of the same spans). Islands are disjoint by
    * construction, which is what lets the surgery cut them with plain
    * segment concatenation. */
  def extents(spark: SparkSession, path: String, batch: DataFrame,
              hashes: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = windowLength(spark, path)
    val idx = hashes.getOrElse(spark.read.parquet(s"$path/hashes"))
    val hit = batch
      .select(col("doc_id"), posexplode(graft.functions.RollingHash(col("text"), l)).as(Seq("p", "h")))
      .join(broadcast(idx.select(col("hh").as("h"))), "h")
      .select("doc_id", "p")
    val wDoc = Window.partitionBy("doc_id").orderBy("p")
    hit
      .withColumn("prev", lag(col("p"), 1).over(wDoc))
      .withColumn("island",
        sum(when(col("prev").isNull || col("p") - col("prev") > l, 1).otherwise(0)).over(wDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("p")).as("s"), (max(col("p")) + l).as("e"))
      .select("doc_id", "s", "e")
  }
}
