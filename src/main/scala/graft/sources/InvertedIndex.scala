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
    * filter pushed to the parquet scan), explodes their postings, and
    * intersects via a count-of-terms aggregate — no corpus scan. */
  def lookupAll(spark: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    val hits = spark.read.parquet(path)
      .filter(col("term").isin(terms: _*))
      .select(col("term"), explode(col("postings")).as("p"))
      .select(col("term"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
    hits.groupBy("doc_id")
      .agg(countDistinct(col("term")).as("nt"), sum(col("tf")).cast("long").as("n_hits"))
      .filter(col("nt") === terms.distinct.size)
      .select("doc_id", "n_hits")
  }
}
