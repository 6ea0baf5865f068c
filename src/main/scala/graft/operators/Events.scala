package graft.operators

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream capabilities (SURVEY.md §2.3): batch forms here; the
  * structured-streaming variants live in graft.streaming and share these
  * semantics (a streaming sessionization = mapGroupsWithState, a tumbling
  * window = window() + watermark).
  *
  * Timestamps are compared in exact integer microseconds (unix_micros /
  * epoch_us) — no double-seconds drift between engines.
  */
object Events {

  val SessionGapUs: Long = 1800L * 1000 * 1000 // 30 min

  /** Gaps-and-islands sessionization: break when gap > 30 min, session id
    * = running count of breaks per user. */
  val qSessionize: Q = Q(
    "q_sessionize",
    """WITH x AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |  se AS (SELECT user_id, event_id, tus,
      |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM x)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(event_id) AS first_event_id,
      |  MAX(tus) - MIN(tus) AS duration_us
      |FROM se GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val run = Window.partitionBy("user_id").orderBy("tus", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("brk",
        when(col("tus") - lag(col("tus"), 1).over(w) > SessionGapUs || lag(col("tus"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"),
        (max(col("tus")) - min(col("tus"))).as("duration_us"))
      .orderBy("user_id", "session_id")
  }

  /** Event-time tumbling window aggregation (batch form). */
  val qTumblingWindow: Q = Q(
    "q_tumbling_window",
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
      |  COUNT(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin) { (s, d) =>
    T.events(s, d)
      .groupBy(date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sumDbl(dec2(col("value"))).as("sum_value"))
      .orderBy("day", "event_type")
  }

  /** Event-time sliding window (1 day, sliding 6 h): each event lands in
    * exactly windowDur/slide = 4 windows. Spark's window() generates the
    * window set map-side; the oracle replicates each event across the 4
    * epoch-aligned starts. Streaming twin: StreamingOps.slidingCounts. */
  val qSlidingWindow: Q = Q(
    "q_sliding_window",
    """SELECT ws AS window_start_us, event_type, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM (SELECT (epoch_us(ts) // 21600000000 - k) * 21600000000 AS ws,
      |             event_type, value
      |      FROM events CROSS JOIN range(0, 4) t(k))
      |GROUP BY ws, event_type
      |ORDER BY window_start_us, event_type""".stripMargin) { (s, d) =>
    T.events(s, d)
      .groupBy(window(col("ts"), "1 day", "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sumDbl(dec2(col("value"))).as("sum_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy("window_start_us", "event_type")
  }

  val all: Seq[Q] = Seq(qSessionize, qTumblingWindow, qSlidingWindow)
}
