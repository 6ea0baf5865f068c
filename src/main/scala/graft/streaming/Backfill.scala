package graft.streaming

import graft.Q
import graft.functions.Exact.{dbl, dec2}
import graft.sources.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Late-data backfill reconciliation for a PUBLISHED window table
  * (SURVEY.md §2.1 stream_backfill): events that arrive after their
  * window was published don't invalidate the table — they patch it.
  *
  * The published layout is partitioned by window start
  * (`dir/win=<start_us>/`), and the aggregates are MERGEABLE (counts +
  * exact decimal sums), which is the whole design: reconciliation never
  * re-reads the base events. The late batch aggregates map-side into
  * per-(window, key) partials, ONLY the affected window partitions are
  * read back (partition pruning on `win`), merged additively, and
  * rewritten via dynamic partition overwrite — untouched windows keep
  * their exact bytes. At 100 TB a day of late data touches a handful of
  * partitions; the published table's size never enters the cost.
  *
  * This is the batch half of the streaming story: stream_mv publishes
  * windows as they close; this op repairs them when the watermark was
  * wrong about the world (a replayed upstream, a recovered region, a
  * backfilled source). The reference's analog is re-running a loader
  * month and re-deriving its rollups; here the repair is O(late data).
  */
object Backfill {

  /** Mergeable per-(window, event_type) aggregate of an event batch:
    * count + exact DECIMAL sum (additive, so late partials fold in
    * without re-reading anything). */
  def aggregateWindows(events: DataFrame, windowUs: Long): DataFrame =
    events
      .select(expr(s"unix_micros(ts) div $windowUs * $windowUs").as("win"),
        col("event_type"), dec2(col("value")).as("v"))
      .groupBy("win", "event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))

  /** The published layout's schema (partition column included). Pinned
    * explicitly so empty tables stay readable: sum(DECIMAL(12,2)) widens
    * to DECIMAL(22,2). */
  val publishedSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sum_v",
        org.apache.spark.sql.types.DecimalType(22, 2)),
      org.apache.spark.sql.types.StructField("win",
        org.apache.spark.sql.types.LongType)))

  /** Publish the windowed aggregate of `events`, partitioned by window
    * start — the layout reconciliation patches in place. */
  def publish(events: DataFrame, dir: String, windowUs: Long): Unit =
    aggregateWindows(events, windowUs)
      .write.mode("overwrite").partitionBy("win").parquet(dir)

  /** Fold a late batch into the published table. Returns the repair
    * report: one row per patched (window, event_type) with the published
    * and repaired counts. Only the partitions of affected windows are
    * read or written; every other partition's bytes are untouched
    * (BackfillSpec pins this file-by-file). If `provDir` is given, one
    * ledger row records the repair (dataset = the table dir's name). */
  def reconcileLate(spark: SparkSession, dir: String, late: DataFrame,
                    windowUs: Long, provDir: Option[String] = None,
                    loadedAtUs: Long = 0L): DataFrame = {
    val latePartials = aggregateWindows(late, windowUs)
      .select(col("win"), col("event_type"),
        col("cnt").as("late_cnt"), col("sum_v").as("late_sum"))
      .localCheckpoint(true) // affected-window list + merge both read this
    val affected = latePartials.select("win").distinct()
      .collect().map(_.getLong(0))
    if (affected.isEmpty) return spark.emptyDataFrame

    // partition pruning: only the affected win=... dirs are scanned.
    // Explicit schema: a published table with ZERO windows (an empty
    // on-time carve) has no files to infer from, and the first late
    // batch must still be able to create it.
    val published = spark.read.schema(publishedSchema).parquet(dir)
      .filter(col("win").isin(affected.toSeq: _*))
      // partition-value inference may narrow `win` to int on small demo
      // timestamps; the layout contract is long microseconds
      .select(col("win").cast("long").as("win"), col("event_type"),
        col("cnt").as("old_cnt"), col("sum_v").as("old_sum"))
    val merged = published
      .join(latePartials, Seq("win", "event_type"), "full_outer")
      .select(col("win"), col("event_type"),
        (coalesce(col("old_cnt"), lit(0L)) + coalesce(col("late_cnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("old_sum"), lit(0).cast("decimal(12,2)")) +
          coalesce(col("late_sum"), lit(0).cast("decimal(12,2)")))
          .cast(published.schema("old_sum").dataType).as("sum_v"),
        coalesce(col("old_cnt"), lit(0L)).as("old_cnt"),
        coalesce(col("late_cnt"), lit(0L)).as("late_cnt"))
      .localCheckpoint(true) // written below, then returned as the report

    // dynamic partition overwrite: ONLY the windows present in `merged`
    // are replaced; the rest of the table is not touched
    merged.select("win", "event_type", "cnt", "sum_v")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("win").parquet(dir)

    provDir.foreach { p =>
      graft.operators.ProvenanceOps.record(
        merged, concat_ws("", col("win"), col("event_type"),
          col("cnt"), col("sum_v")),
        dataset = new org.apache.hadoop.fs.Path(dir).getName,
        source = s"backfill@$loadedAtUs", loadedAtUs = loadedAtUs, provDir = p)
    }

    merged.select(col("win"), col("event_type"), col("old_cnt"),
      col("late_cnt"), col("cnt").as("new_cnt"))
      .orderBy("win", "event_type")
  }

  /** End-to-end demo as an oracled query: publish the on-time carve of
    * `events` (6/7 of rows, daily windows), reconcile the late 1/7, and
    * read the WHOLE repaired table back — it must equal the one-shot
    * aggregate over all events, which is exactly what the oracle
    * computes. The repair path and the recompute path share no code, so
    * the hash match is a real equivalence check. */
  val qBackfill: Q = {
    val DayUs = 86400L * 1000 * 1000
    Q(
      "q_backfill",
      """SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS win,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY win, event_type""".stripMargin) { (s, d) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_backfill")
        .toFile.getAbsolutePath
      val ev = T.events(s, d)
      publish(ev.filter(col("event_id") % 7 =!= 0), s"$tmp/pub", DayUs)
      reconcileLate(s, s"$tmp/pub", ev.filter(col("event_id") % 7 === 0),
        DayUs).count() // materialize the repair
      s.read.schema(publishedSchema).parquet(s"$tmp/pub")
        .select(col("win").cast("long").as("win"), col("event_type"),
          col("cnt"), dbl(col("sum_v")).as("sum_value"))
        .orderBy("win", "event_type")
    }
  }

  val all: Seq[Q] = Seq(qBackfill)
}
