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

  /** External-table variant: files land at `path` (plain parquet, readable
    * path-wise by any engine), bucket metadata under `table` in the
    * catalog. Sizing at 100 TB: pick `buckets` so one bucket of the BIG
    * side fits a task (e.g. ~4 GB/bucket ≈ 25k buckets); both join sides
    * need the SAME count and key or the mismatched side shuffles. */
  def writeBucketedExternal(df: DataFrame, table: String, path: String,
                            key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket key — must plan
    * with no Exchange on either side (asserted by BucketingSpec). */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
                 key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
