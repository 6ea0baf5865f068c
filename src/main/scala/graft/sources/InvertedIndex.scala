package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted term index (SURVEY.md §2.1 sink_inverted): the data-lake
  * analog of the reference's MySQL full-text/secondary indexes serving
  * `tcrd_app.py` search — term-keyed posting lists persisted as parquet,
  * so a serving lookup reads O(query terms) index rows instead of
  * scanning the corpus.
  *
  * Layout: one row per term — (term, df, postings[(doc_id, tf)]) — sorted
  * by term within term-hash buckets, so a term lookup is a pushed-down
  * parquet equality filter over tight, sorted files (row-group pruning on
  * the term column does the skipping; pair with sink_bloom_index for
  * point-lookup file skipping at huge vocabularies).
  *
  * Scale: the index build is ONE shuffle keyed on term (uniform by
  * construction after hashing); posting lists are per-term arrays —
  * bounded by document frequency. A pathological stop-word term would
  * make one giant row: production indexes cap or split postings (the
  * df column makes the cap decision queryable); the serving path below
  * explodes postings BEFORE any join, so even a capped-list layout keeps
  * the same plan shape.
  */
object InvertedIndex {

  /** Build the inverted index for `docs` (doc_id, text) at `path`. */
  def write(docs: DataFrame, path: String, nBuckets: Int = 8): Unit =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("postings"))
      .repartition(nBuckets, col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(path)

  /** AND-semantics lookup: documents containing ALL `terms`, with the
    * summed term frequency. Reads only the probed index rows (equality
    * filter pushed to the parquet scan) of the base index AND any
    * uncompacted delta regions, explodes their postings, and intersects
    * via a count-of-terms aggregate — no corpus scan. Region union is
    * transparent here because the aggregate is per doc: a term split
    * across base and delta rows still lands on the same doc keys. */
  def lookupAll(spark: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    val hits = readRegions(spark, path)
      .filter(col("term").isin(terms: _*))
      .select(col("term"), explode(col("postings")).as("p"))
      .select(col("term"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
    hits.groupBy("doc_id")
      .agg(countDistinct(col("term")).as("nt"), sum(col("tf")).cast("long").as("n_hits"))
      .filter(col("nt") === terms.distinct.size)
      .select("doc_id", "n_hits")
  }

  private def hfs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def deltaDirs(spark: SparkSession, path: String): Seq[String] = {
    val fs = hfs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path + "_delta")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.toString).sorted.toSeq
  }

  /** Base + delta regions as one relation. */
  def readRegions(spark: SparkSession, path: String): DataFrame = {
    val all = path +: deltaDirs(spark, path)
    all.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  /** Incremental maintenance for NEW documents: index only the delta
    * batch (its own term aggregation — cost O(delta), the corpus is
    * never re-scanned) into a fresh region under `<path>_delta/`. Terms
    * the delta shares with the base simply exist in two regions until
    * [[compact]] folds them; every read path merges per doc, so queries
    * are correct throughout. Updates/deletes of already-indexed docs are
    * NOT expressible by appending (postings would need tombstones) —
    * route those through a rebuild or a versioned snapshot
    * ([[Versioned]]). Same region discipline as the ANN index's streamed
    * appends (AnnIndex.scala). */
  def appendDelta(spark: SparkSession, path: String, deltaDocs: DataFrame,
                  nBuckets: Int = 8): String = {
    val n = deltaDirs(spark, path).size + 1
    val region = f"${path}_delta/r$n%05d"
    write(deltaDocs, region, nBuckets)
    region
  }

  /** Fold all delta regions into the base: one term-keyed re-aggregation
    * of base+deltas (df sums, posting lists concatenate sorted), staged
    * next to the live index and swapped via rename-to-backup — readers
    * see the old or the new index, never a half-written one. */
  def compact(spark: SparkSession, path: String, nBuckets: Int = 8): Unit = {
    if (deltaDirs(spark, path).isEmpty) return
    val merged = readRegions(spark, path)
      .select(col("term"), explode(col("postings")).as("p"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sort_array(collect_list(col("p"))).as("postings"))
      .repartition(nBuckets, col("term"))
      .sortWithinPartitions("term")
      .localCheckpoint(true)
    val fs = hfs(spark, path)
    val cur = new org.apache.hadoop.fs.Path(path)
    val prev = new org.apache.hadoop.fs.Path(path + "_prevc")
    val next = new org.apache.hadoop.fs.Path(path + "_nextc")
    merged.write.mode("overwrite").parquet(next.toString)
    fs.delete(prev, true)
    if (fs.exists(cur)) { fs.rename(cur, prev); () }
    require(fs.rename(next, cur), s"compaction swap failed for $path")
    fs.delete(prev, true)
    fs.delete(new org.apache.hadoop.fs.Path(path + "_delta"), true)
    ()
  }
}
