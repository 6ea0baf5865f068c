package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming training-mix monitor (SURVEY.md §2.1 stream_mix_monitor):
  * watch the per-source token share of an ingest stream against a
  * configured target mixture and raise an alert only after K
  * CONSECUTIVE closed windows out of tolerance — one noisy window is
  * ingest weather; K windows is a mixture problem (a stuck crawler, a
  * dead source, a misrouted feed).
  *
  * Batch twin: [[graft.ops.PipelineOps.qMixPlan]] plans a mixture,
  * [[graft.ops.PipelineOps.qMixReweight]] chooses one — this op guards
  * one while it is being ingested.
  *
  * Shape: a `foreachBatch` maintenance sink in the repo's streaming-
  * sidecar family (upsertSink / indexedAppendSink). Per micro-batch:
  * map-side window/source partial sums merge into a PENDING state
  * (open windows only), windows older than the batch's max event time
  * (minus `closeDelayUs`, the watermark stand-in) CLOSE — shares are
  * computed per closed window, drift runs extend per-source CONSEC
  * counters, and one alert row per (window, source) lands in an
  * overwrite-idempotent `alerts/batch_id=N` dir.
  *
  * Crash/replay safety: alerts are recomputed from the PRE-merge state
  * and overwritten (idempotent); the state tree (pending + consec + the
  * applied batch id) swaps as ONE directory rename after alerts are
  * down, so a replayed batch either re-derives identical alerts (state
  * not yet swapped) or is skipped entirely (marker says applied).
  *
  * Scale: state is open-windows × active-sources plus one counter per
  * source — mixture-sized, bounded at any stream length. The only
  * per-event work is the map-side partial sum; everything after runs on
  * window/source aggregates.
  */
object MixMonitor {

  /** Per-(window, source) share row for one CLOSED window. `consec` is
    * the length of the drift run ending at this window; `alert` fires
    * at `consec >= kConsec`. */
  private val AlertCols = Seq("win_start_us", "source", "tokens",
    "share_ppm", "target_ppm", "drift", "consec", "alert")

  private def fsOf(df: DataFrame, dir: String) =
    new Path(dir).getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)

  private def readIfExists(df: DataFrame, path: String, empty: => DataFrame): DataFrame = {
    val fs = fsOf(df, path)
    if (fs.exists(new Path(path))) df.sparkSession.read.parquet(path) else empty
  }

  private def readLong(df: DataFrame, path: String, dflt: Long): Long = {
    val fs = fsOf(df, path)
    val p = new Path(path)
    if (!fs.exists(p)) dflt
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def readMarker(df: DataFrame, stateDir: String): Long =
    readLong(df, s"$stateDir/applied_bid", -1L)

  private def writeLong(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                        v: Long): Unit = {
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Apply one micro-batch. `batch` columns: ts (timestamp), source
    * (string), tokens (long). Idempotent per `bid` — replays are
    * detected via the state marker and skipped. */
  def mixMonitorBatch(batch: DataFrame, bid: Long, monitorDir: String,
                      targetPpm: Map[String, Long],
                      tolPpm: Long = 100000L, kConsec: Int = 3,
                      windowUs: Long = 3600L * 1000 * 1000,
                      closeDelayUs: Long = 0L): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fs = fsOf(batch, monitorDir)
    val stateDir = s"$monitorDir/state"

    // resolve the live state tree (the swap backup is the recovery point
    // if a commit died between renames)
    val liveDir = graft.sources.AtomicSwap
      .live(fs, new Path(stateDir)).map(_.toString)
    if (liveDir.exists(d => readMarker(batch, d) >= bid)) return // replayed, applied

    val emptyPending = Seq.empty[(Long, String, Long)]
      .toDF("win", "source", "tokens")
    val emptyConsec = Seq.empty[(String, Long)].toDF("source", "consec")
    val pending = liveDir.map(d => readIfExists(batch, s"$d/pending", emptyPending))
      .getOrElse(emptyPending)
    val oldConsec = liveDir.map(d => readIfExists(batch, s"$d/consec", emptyConsec))
      .getOrElse(emptyConsec)
    val storedBound = liveDir.map(d => readLong(batch, s"$d/closed_bound",
      Long.MinValue)).getOrElse(Long.MinValue)

    // map-side partial sums for this batch. Stragglers for windows the
    // monitor ALREADY closed and reported are dropped, never re-closed:
    // re-admitting one would re-close its window with only the late
    // tokens — spurious all-source drift and a corrupted run sequence.
    // (A production deployment would side-channel them to a late-data
    // audit; the closed-set decision is this high-watermark, monotone
    // across batches.)
    val partials = batch
      .select(expr(s"unix_micros(ts) div $windowUs * $windowUs").as("win"),
        col("source"), col("tokens"))
      .groupBy("win", "source").agg(sum("tokens").as("tokens"))
      .filter(col("win") + windowUs > storedBound)
    val merged = pending.unionByName(partials)
      .groupBy("win", "source").agg(sum("tokens").as("tokens"))
      .localCheckpoint(true) // state + batch folded once; read many below

    // watermark stand-in: windows fully behind the max observed event
    // time (minus the allowed lateness) close now; the bound only moves
    // FORWARD so an all-late batch cannot reopen the past
    val maxUs = batch.agg(max(unix_micros(col("ts")))).collect().head
    val closeBound = math.max(storedBound,
      if (maxUs.isNullAt(0)) Long.MinValue else maxUs.getLong(0) - closeDelayUs)
    val closed = merged.filter(col("win") + windowUs <= closeBound)
    val open = merged.filter(col("win") + windowUs > closeBound)

    // closed-window share grid: every configured source appears in every
    // closed window (a SILENT source is the loudest drift of all), plus
    // any observed source outside the configured mixture (target 0)
    val targets = targetPpm.toSeq.toDF("source", "target_ppm")
    val gridSources = targets.select("source")
      .union(closed.select("source")).distinct()
    val wins = closed.select("win").distinct()
    val totals = closed.groupBy("win").agg(sum("tokens").as("total"))
    val shares = wins.crossJoin(broadcast(gridSources))
      .join(closed, Seq("win", "source"), "left")
      .na.fill(0L, Seq("tokens"))
      .join(broadcast(totals), Seq("win"))
      .join(broadcast(targets), Seq("source"), "left")
      .na.fill(0L, Seq("target_ppm"))
      // a closed window whose rows all carried zero tokens has no shares
      // to compare — share 0 for everyone, judged against targets as-is
      // (div-by-zero must not null out `drift`: null would silently skip
      // the run-length arithmetic below)
      .withColumn("share_ppm",
        when(col("total") > 0, expr("tokens * 1000000 div total"))
          .otherwise(lit(0L)))
      .withColumn("drift",
        abs(col("share_ppm") - col("target_ppm")) > tolPpm)

    // drift-run lengths per source across the closed windows, in window
    // order; a run starting at the source's FIRST closed window extends
    // the trailing run carried in from the previous batches
    val byWin = Window.partitionBy("source").orderBy("win")
    val upToHere = byWin.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = shares
      .withColumn("idx", row_number().over(byWin))
      .withColumn("last_ok_idx",
        max(when(!col("drift"), col("idx"))).over(upToHere))
      .join(broadcast(oldConsec), Seq("source"), "left")
      .na.fill(0L, Seq("consec"))
      .withColumn("carried",
        when(col("last_ok_idx").isNull, col("consec")).otherwise(lit(0L)))
      .withColumn("run_pos",
        col("idx") - coalesce(col("last_ok_idx"), lit(0L)))
      .withColumn("consec_now",
        when(col("drift"), col("run_pos") + col("carried")).otherwise(lit(0L)))
      .withColumn("alert", col("drift") && col("consec_now") >= kConsec)
      .localCheckpoint(true) // alerts write + state fold both read this

    // 1) alerts land first, overwrite-idempotent per batch
    scored.select(col("win").as("win_start_us"), col("source"), col("tokens"),
        col("share_ppm"), col("target_ppm"), col("drift"),
        col("consec_now").as("consec"), col("alert"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$monitorDir/alerts/batch_id=$bid")

    // 2) fold the new trailing runs into the consec state: sources with
    // closed windows this batch take their LAST window's run; silent-in-
    // state sources keep their counter (no new evidence either way)
    val lastRun = scored
      .withColumn("rn", row_number().over(Window.partitionBy("source")
        .orderBy(col("win").desc)))
      .filter(col("rn") === 1)
      .select(col("source"), col("consec_now").as("new_consec"))
    val newConsec = oldConsec.join(lastRun, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("new_consec"), col("consec"), lit(0L)).as("consec"))

    // 3) state commit: pending + consec + closed bound + applied marker
    // staged as one tree, swapped by the SHARED crash-point-proven
    // protocol (a hand-rolled delete-prev-first order here would have
    // exactly the stranded-last-copy window AtomicSwap exists to close)
    val statePath = new Path(stateDir)
    val nextDir = graft.sources.AtomicSwap.nextOf(statePath).toString
    fs.delete(new Path(nextDir), true)
    open.coalesce(1).write.mode("overwrite").parquet(s"$nextDir/pending")
    newConsec.coalesce(1).write.mode("overwrite").parquet(s"$nextDir/consec")
    writeLong(fs, new Path(nextDir, "closed_bound"), closeBound)
    writeLong(fs, new Path(nextDir, "applied_bid"), bid)
    graft.sources.AtomicSwap.commit(fs, statePath)
  }

  /** The monitor as a stream sink, ready to `.start()`. */
  def mixMonitorSink(events: DataFrame, monitorDir: String,
                     targetPpm: Map[String, Long],
                     tolPpm: Long = 100000L, kConsec: Int = 3,
                     windowUs: Long = 3600L * 1000 * 1000,
                     closeDelayUs: Long = 0L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        mixMonitorBatch(batch, bid, monitorDir, targetPpm, tolPpm, kConsec,
          windowUs, closeDelayUs)
      }

  /** The monitor's full arithmetic end-to-end as an oracled query: one
    * batch of the events table (source = event_type, one token per
    * event, daily windows, uniform 5-way target), alerts read back and
    * hash-matched against a SQL mirror of the whole pipeline — closed-
    * window selection, silent-source grid, integer shares, drift
    * run-lengths, K-threshold alerts. The monitor shares NO code with
    * the oracle, so the match is a real equivalence check of the
    * alerting math. */
  val qMixMonitor: graft.Q = {
    val DayUs = 86400000000L
    val Sources = Seq("click", "error", "purchase", "signup", "view")
    graft.Q(
      "q_mix_monitor",
      s"""WITH b AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
         |cnts AS (
         |  SELECT (epoch_us(ts) // $DayUs) * $DayUs AS win,
         |    event_type AS source, COUNT(*) AS tokens
         |  FROM events GROUP BY 1, 2),
         |closedw AS (SELECT DISTINCT win FROM cnts, b WHERE win + $DayUs <= mx),
         |grid AS (
         |  SELECT w.win, s.source FROM closedw w
         |  CROSS JOIN (VALUES ${Sources.map(s => s"('$s')").mkString(", ")}) s(source)),
         |j AS (
         |  SELECT g.win, g.source, CAST(COALESCE(c.tokens, 0) AS BIGINT) AS tokens
         |  FROM grid g LEFT JOIN cnts c ON g.win = c.win AND g.source = c.source),
         |tot AS (SELECT win, CAST(SUM(tokens) AS BIGINT) AS total FROM j GROUP BY win),
         |sh AS (
         |  SELECT j.win, j.source, j.tokens,
         |    CAST(CASE WHEN total > 0 THEN j.tokens * 1000000 // total ELSE 0 END AS BIGINT) AS share_ppm,
         |    CAST(200000 AS BIGINT) AS target_ppm
         |  FROM j JOIN tot ON j.win = tot.win),
         |d AS (
         |  SELECT *, abs(share_ppm - target_ppm) > 60000 AS drift,
         |    row_number() OVER (PARTITION BY source ORDER BY win) AS idx
         |  FROM sh),
         |r AS (
         |  SELECT *, MAX(CASE WHEN NOT drift THEN idx END)
         |    OVER (PARTITION BY source ORDER BY win ROWS UNBOUNDED PRECEDING) AS lok
         |  FROM d)
         |SELECT win AS win_start_us, source, tokens, share_ppm, target_ppm, drift,
         |  CAST(CASE WHEN drift THEN idx - COALESCE(lok, 0) ELSE 0 END AS BIGINT) AS consec,
         |  drift AND (idx - COALESCE(lok, 0)) >= 3 AS alert
         |FROM r ORDER BY win_start_us, source""".stripMargin) { (s, d) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_mixmon")
        .toFile.getAbsolutePath
      val ev = graft.sources.Tables.events(s, d)
        .select(col("ts"), col("event_type").as("source"),
          lit(1L).as("tokens"))
      mixMonitorBatch(ev, bid = 0, tmp,
        targetPpm = Sources.map(_ -> 200000L).toMap,
        tolPpm = 60000L, kConsec = 3, windowUs = DayUs)
      readAlerts(s, tmp)
        .select(col("win_start_us"), col("source"), col("tokens"),
          col("share_ppm"), col("target_ppm"), col("drift"), col("consec"),
          col("alert"))
        .orderBy("win_start_us", "source")
    }
  }

  val all: Seq[graft.Q] = Seq(qMixMonitor)

  /** Read back all alert rows (explicit batch-dir union — no partition
    * discovery assumptions), ordered for inspection. */
  def readAlerts(spark: org.apache.spark.sql.SparkSession,
                 monitorDir: String): DataFrame = {
    val fs = new Path(monitorDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val base = new Path(s"$monitorDir/alerts")
    if (!fs.exists(base)) spark.emptyDataFrame
    else {
      val dirs = fs.listStatus(base).filter(_.isDirectory)
        .map(_.getPath.toString).sorted
      dirs.map(spark.read.parquet(_)).reduce(_.unionByName(_))
        .orderBy("win_start_us", "source")
    }
  }
}
