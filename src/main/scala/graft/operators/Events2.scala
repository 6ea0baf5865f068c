package graft.operators

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 time-series operators over the events stream: rolling windows,
  * attribution touches, volume-anomaly screens, inter-event gaps. The
  * reference analog is the year-series / trend passes
  * (loaders/load-GeneRIF_Years.py, doc/TCRD_Build_Notes.txt volume QC);
  * the shapes are the standard event-warehouse ones.
  *
  * Timestamps are compared in exact integer microseconds (unix_micros /
  * epoch_us); every derived double is fixed-shape from exact integer or
  * decimal sums (SURVEY.md §5).
  */
object Events2 {

  /** 7-day rolling mean/sum per event type over daily aggregates. Two
    * cheap shuffles (daily rollup, then a per-type window over ~days rows
    * — the windowed table is already reduced, so the window input is tiny
    * relative to the event stream no matter the scale). */
  val qRollingStats: Q = Q(
    "q_rolling_stats",
    """WITH daily AS (
      |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    COUNT(*) AS cnt, SUM(CAST(value AS DECIMAL(12,2))) AS dsum
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, cnt, CAST(dsum AS DOUBLE) AS sum_value,
      |  round(CAST(SUM(cnt) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE), 6) AS ma7_cnt,
      |  CAST(SUM(dsum) OVER w AS DOUBLE) AS sum7_value
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day""".stripMargin) { (s, d) =>
    val daily = T.events(s, d)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"), sum(dec2(col("value"))).as("dsum"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    daily
      .select(col("event_type"), col("day"), col("cnt"), dbl(col("dsum")).as("sum_value"),
        round(dbl(sum(col("cnt")).over(w)) / dbl(count(lit(1)).over(w)), 6).as("ma7_cnt"),
        dbl(sum(col("dsum")).over(w)).as("sum7_value"))
      .orderBy("event_type", "day")
  }

  /** First/last-touch attribution per user: the first and last event (by
    * time, event-id tie-break) plus totals, via two ranking passes in ONE
    * user-partitioned shuffle. */
  val qFirstLastTouch: Q = Q(
    "q_first_last_touch",
    """WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS ra,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rd
      |  FROM events)
      |SELECT user_id,
      |  MAX(CASE WHEN ra = 1 THEN event_type END) AS first_type,
      |  MAX(CASE WHEN ra = 1 THEN tus END) AS first_tus,
      |  MAX(CASE WHEN rd = 1 THEN event_type END) AS last_type,
      |  MAX(CASE WHEN rd = 1 THEN tus END) AS last_tus,
      |  COUNT(*) AS n_events
      |FROM o GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val ev = T.events(s, d).select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tus"), col("event_id"))
    val wa = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val wd = Window.partitionBy("user_id").orderBy(col("tus").desc, col("event_id").desc)
    ev.withColumn("ra", row_number().over(wa))
      .withColumn("rd", row_number().over(wd))
      .groupBy("user_id")
      .agg(max(when(col("ra") === 1, col("event_type"))).as("first_type"),
        max(when(col("ra") === 1, col("tus"))).as("first_tus"),
        max(when(col("rd") === 1, col("event_type"))).as("last_type"),
        max(when(col("rd") === 1, col("tus"))).as("last_tus"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Daily-volume anomaly screen: flag days whose count exceeds the
    * type's mean + 2·stddev. Mean/stddev come from exact integer sums
    * (Σc, Σc² as BIGINT), so the flag threshold is the identical double on
    * every engine — no streaming-variance float drift. */
  val qAnomalyDays: Q = Q(
    "q_anomaly_days",
    """WITH daily AS (SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) AS s,
      |  CAST(SUM(cnt * cnt) AS BIGINT) AS s2 FROM daily GROUP BY 1)
      |SELECT d.event_type, d.day, d.cnt,
      |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_cnt,
      |  round(sqrt(CAST(n * s2 - s * s AS DOUBLE)) / CAST(n AS DOUBLE), 4) AS sd_cnt,
      |  (CAST(d.cnt AS DOUBLE) > CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |    + 2.0 * (sqrt(CAST(n * s2 - s * s AS DOUBLE)) / CAST(n AS DOUBLE))) AS is_anomaly
      |FROM daily d JOIN st USING (event_type)
      |ORDER BY event_type, day""".stripMargin) { (s, d) =>
    val daily = T.events(s, d)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val st = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("s2"))
    val mean = dbl(col("s")) / dbl(col("n"))
    val sd = sqrt(dbl(col("n") * col("s2") - col("s") * col("s"))) / dbl(col("n"))
    daily.join(broadcast(st), "event_type")
      .select(col("event_type"), col("day"), col("cnt"),
        round(mean, 4).as("mean_cnt"), round(sd, 4).as("sd_cnt"),
        (dbl(col("cnt")) > mean + lit(2.0) * sd).as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Per-user inter-event gap statistics (lag diff in exact integer
    * micros, average as a final rounded double): the activity-cadence QC
    * used before sessionization thresholds are chosen. */
  val qGapStats: Q = Q(
    "q_gap_stats",
    """WITH g AS (SELECT user_id,
      |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events)
      |SELECT user_id, COUNT(gap) AS n_gaps, MIN(gap) AS min_gap_us, MAX(gap) AS max_gap_us,
      |  round(CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(gap) AS DOUBLE), 2) AS avg_gap_us
      |FROM g WHERE gap IS NOT NULL GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    T.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_id"))
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("user_id")
      .agg(count(col("gap")).as("n_gaps"), min(col("gap")).as("min_gap_us"),
        max(col("gap")).as("max_gap_us"),
        round(dbl(sum(col("gap"))) / dbl(count(col("gap"))), 2).as("avg_gap_us"))
      .orderBy("user_id")
  }

  /** Per-group OLS trend slope over the daily series, from exact integer
    * moments (n, Σx, Σy, Σxy, Σx²) — the closed-form fit as one
    * aggregation, no iterative solver. Reference analog: year-series
    * trends (loaders/load-GeneRIF_Years.py). The doubles are a fixed
    * final-scalar shape, so results are engine-identical. */
  val qTrendSlope: Q = Q(
    "q_trend_slope",
    """WITH daily AS (SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |x AS (SELECT event_type, cnt, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS xi FROM daily),
      |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(xi) AS BIGINT) AS sx,
      |  CAST(SUM(cnt) AS BIGINT) AS sy, CAST(SUM(xi * cnt) AS BIGINT) AS sxy, CAST(SUM(xi * xi) AS BIGINT) AS sxx
      |  FROM x GROUP BY 1)
      |SELECT event_type, n AS n_days,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE), 6) AS slope,
      |  round((CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
      |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
    val daily = T.events(s, d)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val x = daily.withColumn("xi",
      row_number().over(Window.partitionBy("event_type").orderBy("day")).cast("long"))
    val m = x.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("sx"), sum(col("cnt")).as("sy"),
        sum(col("xi") * col("cnt")).as("sxy"), sum(col("xi") * col("xi")).as("sxx"))
    // A single-day group has sxx·n == sx² (zero divisor): DuckDB's IEEE
    // division would yield inf while Spark's Divide yields NULL, so both
    // sides pin the degenerate case to NULL (when(n>1) here, NULLIF above).
    val slope = when(col("n") > 1,
      dbl(col("n") * col("sxy") - col("sx") * col("sy")) /
        dbl(col("n") * col("sxx") - col("sx") * col("sx")))
    m.select(col("event_type"), col("n").as("n_days"),
        round(slope, 6).as("slope"),
        round((dbl(col("sy")) - slope * dbl(col("sx"))) / dbl(col("n")), 6).as("intercept"))
      .orderBy("event_type")
  }


  /** Day-of-week seasonality per event type: volume share by ISO weekday
    * plus the chi-square deviation term against a uniform-week null —
    * the weekly-cadence QC a load-monitoring report runs (the reference's
    * build notes audit per-day load volumes). Weekday comes from pure
    * integer epoch-day arithmetic ((days + 3) mod 7 + 1 — 1970-01-01 was
    * a Thursday, isodow 4) so both engines agree without touching their
    * differing dayofweek conventions. One aggregation + a broadcast of
    * per-type totals. */
  val qSeasonality: Q = Q(
    "q_seasonality",
    """WITH e AS (SELECT event_type,
      |    (date_diff('day', TIMESTAMP '1970-01-01', ts) + 3) % 7 + 1 AS dow
      |  FROM events),
      |c AS (SELECT event_type, dow, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS total FROM c GROUP BY 1)
      |SELECT c.event_type, dow, cnt,
      |  round(CAST(cnt AS DOUBLE) / total, 6) AS share,
      |  round(pow(CAST(cnt AS DOUBLE) - total / 7.0, 2) / (total / 7.0), 6) AS chi2_term
      |FROM c JOIN t ON t.event_type = c.event_type
      |ORDER BY c.event_type, dow""".stripMargin) { (s, d) =>
    val e = T.events(s, d).select(col("event_type"),
      ((datediff(col("ts"), lit("1970-01-01").cast("timestamp")).cast("long")
        + 3) % 7 + 1).as("dow"))
    val c = e.groupBy("event_type", "dow").agg(count(lit(1)).as("cnt"))
    val t = c.groupBy(col("event_type").as("et"))
      .agg(sum(col("cnt")).cast("long").as("total"))
    c.join(broadcast(t), col("event_type") === col("et"))
      .select(col("event_type"), col("dow"), col("cnt"),
        round(dbl(col("cnt")) / col("total"), 6).as("share"),
        round(pow(dbl(col("cnt")) - col("total") / lit(7.0), 2)
          / (col("total") / lit(7.0)), 6).as("chi2_term"))
      .orderBy("event_type", "dow")
  }

  /** CUSUM changepoint screen over the daily volume series: the running
    * positive cumulative excess s_d = max(0, s_{d-1} + (cnt_d − mean))
    * flags sustained level shifts that single-day z-score screens
    * ([[qAnomalyDays]]) structurally miss — ten slightly-elevated days
    * trip CUSUM long before any one of them trips a z-test. The corpus
    * scan (events → daily counts) is distributed; the CUSUM fold is an
    * inherently sequential recurrence over the DAY series, which is
    * calendar-sized (365 rows/year) at ANY corpus size — folded on the
    * driver, the same documented posture as the BPE per-round argmax.
    * All arithmetic is micro-scaled exact integers; the oracle unrolls
    * the same recurrence with a recursive CTE. */
  val qChangepoint: Q = Q(
    "q_changepoint",
    """WITH daily AS (
      |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, COUNT(*) AS cnt
      |  FROM events GROUP BY 1),
      |m AS (SELECT CAST(SUM(cnt) * 1000000 // COUNT(*) AS BIGINT) AS mean_micro FROM daily),
      |d AS (SELECT row_number() OVER (ORDER BY day) AS rn, day, cnt FROM daily),
      |c AS (
      |  WITH RECURSIVE r AS (
      |    SELECT d.rn, d.day, d.cnt,
      |      GREATEST(CAST(0 AS BIGINT), d.cnt * 1000000 - m.mean_micro) AS s
      |    FROM d, m WHERE d.rn = 1
      |    UNION ALL
      |    SELECT d.rn, d.day, d.cnt,
      |      GREATEST(CAST(0 AS BIGINT), r.s + d.cnt * 1000000 - m.mean_micro)
      |    FROM r JOIN d ON d.rn = r.rn + 1, m)
      |  SELECT * FROM r)
      |SELECT day, cnt, s AS cusum_micro,
      |  s > 3 * (SELECT mean_micro FROM m) AS shifted
      |FROM c ORDER BY day""".stripMargin) { (s, d) =>
    import s.implicits._
    val daily = T.events(s, d)
      .groupBy(date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("day")
      .collect() // calendar-sized: #days rows, not corpus rows
    if (daily.isEmpty) {
      // an empty event stream has no series — the screen reports nothing,
      // it does not crash
      Seq.empty[(String, Long, Long, Boolean)]
        .toDF("day", "cnt", "cusum_micro", "shifted")
    } else {
      val meanMicro = daily.map(_.getAs[Long]("cnt")).sum * 1000000L / daily.length
      val folded = daily.scanLeft(("", 0L, 0L)) { case ((_, _, sPrev), r) =>
        val cnt = r.getAs[Long]("cnt")
        val sNew = math.max(0L, sPrev + cnt * 1000000L - meanMicro)
        (r.getAs[String]("day"), cnt, sNew)
      }.drop(1)
      folded.toSeq
        .map { case (day, cnt, cusum) =>
          (day, cnt, cusum, cusum > 3 * meanMicro) }
        .toDF("day", "cnt", "cusum_micro", "shifted")
        .orderBy("day")
    }
  }

  /** MULTI-TOUCH attribution — the credit models between
    * [[qFirstLastTouch]]'s extremes: journeys are segmented per user at
    * each purchase (journey id = count of PRECEDING purchases, one
    * cumulative window), the journey's click/view touches split the
    * conversion's credit LINEARLY (1/n each) and POSITION-BASED (the
    * U-shaped 40/20/40: first and last touch 0.4 each, middles share
    * 0.2; n=1 → 1.0, n=2 → 0.5/0.5), and credit aggregates per touch
    * type — the marketing-attribution table next to first/last touch.
    *
    * Per-journey exactly one purchase (the segmentation invariant), so
    * the touch⋈conversion join never fans out; journeys without a
    * closing purchase earn nothing (inner join). All windows are
    * user-partitioned (one shuffle); per-touch credits round to 6dp and
    * aggregate as DECIMAL(18,6) — order-invariant, SURVEY §5. */
  val qAttribution: Q = Q(
    "q_attribution",
    """WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id,
      |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid
      |  FROM events),
      |conv AS (SELECT user_id, jid FROM o WHERE event_type = 'purchase'),
      |tch AS (SELECT o.user_id, o.jid, o.tus, o.event_id, o.event_type
      |        FROM o JOIN conv USING (user_id, jid)
      |        WHERE o.event_type IN ('click', 'view')),
      |sized AS (SELECT event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, jid ORDER BY tus, event_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY user_id, jid) AS n
      |  FROM tch),
      |cr AS (SELECT event_type,
      |    CAST(round(1.0 / CAST(n AS DOUBLE), 6) AS DECIMAL(18,6)) AS lc,
      |    CAST(CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
      |              WHEN rk = 1 OR rk = n THEN 0.4
      |              ELSE round(0.2 / CAST(n - 2 AS DOUBLE), 6) END AS DECIMAL(18,6)) AS pc
      |  FROM sized)
      |SELECT event_type, COUNT(*) AS touches,
      |  CAST(SUM(lc) AS DOUBLE) AS linear_credit,
      |  CAST(SUM(pc) AS DOUBLE) AS position_credit
      |FROM cr GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val ev = T.events(s, d).select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tus"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withJ = ev.withColumn("jid",
      coalesce(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(w),
        lit(0L)))
    val conv = withJ.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("jid"))
    val touches = withJ.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("jid"), col("tus"), col("event_id"), col("event_type"))
    val wj = Window.partitionBy("user_id", "jid").orderBy(col("tus"), col("event_id"))
    val sized = touches.join(conv, Seq("user_id", "jid"))
      .withColumn("rk", row_number().over(wj))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id", "jid")))
    val linear = round(lit(1.0) / dbl(col("n")), 6)
    val position = when(col("n") === 1, lit(1.0))
      .when(col("n") === 2, lit(0.5))
      .when(col("rk") === 1 || col("rk") === col("n"), lit(0.4))
      .otherwise(round(lit(0.2) / dbl(col("n") - 2), 6))
    sized.select(col("event_type"),
        linear.cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("lc"),
        position.cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("pc"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("touches"),
        dbl(sum(col("lc"))).as("linear_credit"),
        dbl(sum(col("pc"))).as("position_credit"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(qRollingStats, qFirstLastTouch, qAnomalyDays, qGapStats,
    qTrendSlope, qSeasonality, qChangepoint, qAttribution)
}
