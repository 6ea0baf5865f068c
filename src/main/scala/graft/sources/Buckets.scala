package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffled storage so repeated joins/aggregations on
  * the bucket key are exchange-free (SURVEY.md §4 "co-located joins").
  *
  * On a 100 TB warehouse the fact tables would be written bucketed by
  * their join keys once at ingest; every downstream join between
  * same-bucketed tables then plans as SortMergeJoin over pre-clustered
  * scans with NO Exchange — the single biggest repeated-shuffle saving
  * available to a pipeline that joins the same keys round after round.
  */
object Buckets {

  /** Write `df` as a bucketed managed table (requires a warehouse dir). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortBy: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key)
    sortBy.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
