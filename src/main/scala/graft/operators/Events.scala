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

  /** Ordered funnel analysis: per user, the first time of each funnel
    * stage; a stage counts only if it happens at-or-after the previous
    * stage's first time. One shuffle (user aggregation) computes every
    * stage's first-timestamp via conditional min — no per-stage scan or
    * self-join. */
  val qFunnel: Q = Q(
    "q_funnel",
    """WITH f AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t1,
      |    MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t2,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t3
      |  FROM events GROUP BY user_id)
      |SELECT
      |  CAST(COUNT(CASE WHEN t1 IS NOT NULL THEN 1 END) AS BIGINT) AS n_signup,
      |  CAST(COUNT(CASE WHEN t1 IS NOT NULL AND t2 >= t1 THEN 1 END) AS BIGINT) AS n_click,
      |  CAST(COUNT(CASE WHEN t1 IS NOT NULL AND t2 >= t1 AND t3 >= t2 THEN 1 END) AS BIGINT) AS n_purchase
      |FROM f""".stripMargin) { (s, d) =>
    val f = T.events(s, d)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("t1"),
        min(when(col("event_type") === "click", unix_micros(col("ts")))).as("t2"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t3"))
    f.agg(
      lng(count(when(col("t1").isNotNull, 1))).as("n_signup"),
      lng(count(when(col("t1").isNotNull && col("t2") >= col("t1"), 1))).as("n_click"),
      lng(count(when(col("t1").isNotNull && col("t2") >= col("t1") && col("t3") >= col("t2"), 1)))
        .as("n_purchase"))
  }

  /** Cohort retention: users grouped by first-activity week, counted by
    * weeks-since-cohort for every active week. Two shuffles total (user
    * firsts, then cohort cells) — the classic retention matrix without a
    * per-cohort pass. Weeks are integer epoch-day divisions (engine-
    * independent; no WEEK() locale semantics). */
  val qRetention: Q = Q(
    "q_retention",
    """WITH act AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
      |  FROM events),
      |first AS (SELECT user_id, MIN(wk) AS cohort_wk FROM act GROUP BY user_id)
      |SELECT cohort_wk, CAST(act.wk - cohort_wk AS BIGINT) AS weeks_later,
      |  COUNT(*) AS n_users
      |FROM act JOIN first USING (user_id)
      |GROUP BY cohort_wk, weeks_later
      |ORDER BY cohort_wk, weeks_later""".stripMargin) { (s, d) =>
    val act = T.events(s, d)
      .select(col("user_id"), expr("unix_micros(ts) div 604800000000").as("wk"))
      .distinct()
    val first = act.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    act.join(first, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("weeks_later"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "weeks_later")
  }

  /** Top user journeys: each user's first five events (event-time order,
    * event_id tiebreak) joined into a path string, then the 20 most
    * common paths — the "how do users actually move" panel next to the
    * funnel's "do they reach the goal". One window shuffle on user_id
    * (rank + truncate), one path-keyed aggregation; path strings are
    * bounded (5 steps), so the aggregate key space is small no matter
    * the event volume. Fully deterministic: ties in event time break on
    * event_id, path ties in the top-20 break lexicographically. */
  val qUserPaths: Q = Q(
    "q_user_paths",
    """WITH ranked AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |paths AS (
      |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM ranked WHERE rn <= 5 GROUP BY user_id)
      |SELECT path, COUNT(*) AS n_users
      |FROM paths GROUP BY path
      |ORDER BY n_users DESC, path LIMIT 20""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
      .groupBy("user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("event_type")))),
        x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  val all: Seq[Q] = Seq(qSessionize, qTumblingWindow, qSlidingWindow,
    qFunnel, qRetention, qUserPaths)
}
