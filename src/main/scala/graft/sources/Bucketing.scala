package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the pre-shuffle co-location lever for the
  * repeated fact⋈fact joins a warehouse runs every day. Writing both
  * sides `bucketBy(n, key)` pays the partitioning shuffle ONCE at write
  * time; every later equi-join or aggregation on the bucket key then
  * plans with NO exchange on either side — at 100 TB that turns the
  * nightly lineitem⋈orders from two multi-TB shuffles into a local
  * merge per bucket pair.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable` with an
  * explicit `path` → external table; the parquet files are plain parquet
  * and remain readable path-wise by any engine, just without the bucket
  * guarantee). On a cluster the catalog is the shared metastore, so the
  * layout contract outlives the writing job.
  *
  * Sizing: choose `nBuckets` so one bucket of the BIG side fits a task
  * comfortably (e.g. 100 TB / 4 GB-per-bucket-file ≈ 25k buckets); both
  * join sides must use the SAME bucket count and key, or Spark falls
  * back to shuffling the mismatched side.
  *
  * Reference analog: MySQL's clustered PK makes TCRD's repeated
  * target⋈protein⋈tdl_info joins index-colocated
  * (schema/tcrd.sql PRIMARY KEYs); bucketing is the distributed
  * equivalent of that standing layout decision. */
object Bucketing {

  /** Write `df` as an external bucketed table: files at `path`, bucket
    * metadata under `tableName` in the session catalog. `sortBy(key)`
    * additionally orders rows inside each bucket file, so bucket-local
    * merge joins skip their sort when files-per-bucket is 1 (use
    * `df.repartition(nBuckets, col(key))` upstream to get there). */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    key: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(tableName)

  /** Equi-join two same-bucketed tables on their bucket key. The plan
    * must show no Exchange on either side — asserted by BucketingSpec;
    * if it ever does, the bucket contract (same count, same key) broke. */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
                 key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
