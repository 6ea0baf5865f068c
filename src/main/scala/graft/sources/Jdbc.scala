package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the reference's entire warehouse surface is a MySQL
  * database read and written row-at-a-time (loaders/TCRD.py:12 `import
  * MySQLdb`, every loader's ins_* and upd_* cursor loops). The Spark-native
  * counterpart:
  *
  *  - READS are predicate-partitioned: `numPartitions` executors each pull
  *    one stride of `partitionColumn` concurrently, so ingest bandwidth
  *    scales with the cluster instead of a single cursor. Catalyst pushes
  *    filters and column pruning into the generated SQL (check explain:
  *    PushedFilters appear in the JDBC relation).
  *  - WRITES are batched inserts (`batchsize` rows per round trip) from
  *    every partition in parallel — the bulk-load shape, not per-row
  *    upserts. Keyed merge semantics stay in [[graft.operators.MergeOps]]:
  *    compute the merged snapshot in Spark, then overwrite/append the
  *    result table here.
  *
  * Specs run against embedded Derby (in /opt/spark/jars) — same code path
  * as MySQL/Postgres, no server needed.
  */
object Jdbc {

  private def props(user: Option[String], password: Option[String],
                    driver: Option[String]): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    driver.foreach(p.setProperty("driver", _))
    p
  }

  /** Stride-partitioned parallel read: rows with `partitionColumn` in
    * [lowerBound, upperBound] split into `numPartitions` range predicates,
    * one per task. Rows outside the bounds are still read (they land in the
    * first/last stride) — bounds shape parallelism, not a filter. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int,
                      user: Option[String] = None, password: Option[String] = None,
                      driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(user, password, driver))

  /** Single-cursor read (small dimension tables / pushdown-heavy queries).
    * `table` may be a subquery alias: "(SELECT …) t". */
  def read(spark: SparkSession, url: String, table: String,
           user: Option[String] = None, password: Option[String] = None,
           driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, props(user, password, driver))

  /** Batched parallel write: every partition inserts `batchSize` rows per
    * round trip. Size partitions upstream (repartition) to bound concurrent
    * connections — at 1000 executors an unthrottled write IS a DDoS on the
    * warehouse. */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Overwrite, batchSize: Int = 1000,
            user: Option[String] = None, password: Option[String] = None,
            driver: Option[String] = None): Unit =
    df.write.mode(mode)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props(user, password, driver))
}
