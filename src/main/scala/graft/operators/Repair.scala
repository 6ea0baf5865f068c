package graft.operators

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-repair and smoothing operators (SURVEY.md §2.2):
  *
  *  - [[qImpute]] — sentinel-aware missing-value imputation. The
  *    reference's loaders treat falsy fields ('' / 0) as absent
  *    everywhere (`if not row[x]` guards throughout the loader family) and
  *    substitute defaults at insert time; the warehouse-side twin is
  *    group-median imputation with an audit flag.
  *  - [[qEwma]] — exponentially-weighted moving average over the daily
  *    series (the smoothing pass a GeneRIF-year trend report runs;
  *    loaders/load-GeneRIF_Years.py builds exactly such series).
  */
object Repair {

  /** Per-type median imputation of the JSON `k` property, where k = 0 is
    * the missing sentinel (the loaders' falsy-skip convention). The
    * median is exact (percentile interpolation, same recipe as
    * q_percentile / q_mad_outliers) over the NON-missing values; imputed
    * rows carry was_imputed = 1 for lineage.
    *
    * Scale: one grouped exact-percentile pass over the fact table (at
    * 100 TB flip to percentile_approx — or enable
    * [[graft.plans.ApproxPercentileRewrite]] and leave the query
    * untouched), then a broadcast join of the type-sized median table.
    * JSON extraction is codegen'd get_json_object, no UDF. */
  val qImpute: Q = Q(
    "q_impute",
    """WITH e AS (SELECT event_id, event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events),
      |med AS (SELECT event_type, quantile_cont(CAST(k AS DOUBLE), 0.5) AS med
      |        FROM e WHERE k <> 0 GROUP BY 1)
      |SELECT event_id, event_type, k AS k_raw,
      |  round(CASE WHEN k = 0 THEN med ELSE CAST(k AS DOUBLE) END, 6) AS k_filled,
      |  CAST(CASE WHEN k = 0 THEN 1 ELSE 0 END AS INT) AS was_imputed
      |FROM e JOIN med USING (event_type)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val e = T.events(s, d).select(col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
    val med = e.filter(col("k") =!= 0).groupBy("event_type")
      .agg(percentile(col("k").cast("double"), lit(0.5)).as("med"))
    e.join(broadcast(med), "event_type")
      .select(col("event_id"), col("event_type"), col("k").as("k_raw"),
        round(when(col("k") === 0, col("med"))
          .otherwise(col("k").cast("double")), 6).as("k_filled"),
        when(col("k") === 0, 1).otherwise(0).as("was_imputed"))
      .orderBy("event_id")
  }

  /** EWMA (α = 0.5) over the per-type daily mean: weights α(1−α)^k for
    * lag k, truncated at 7 days and renormalized over the lags that
    * exist — so the series has no warm-up bias and the window frame stays
    * bounded (a true infinite-memory EWMA is a recursive scan; the
    * truncated form is windowable, and at α = 0.5 the dropped tail is
    * < 1% of the mass). Weight literals are exact binary doubles and the
    * term sum is built in fixed k-ascending order, so both engines fold
    * identical doubles.
    *
    * Scale: one daily pre-aggregation (fact-sized shuffle) + one
    * type-partitioned 7-row window — same budget as q_rolling_stats. */
  val qEwma: Q = {
    val weights = (0 to 6).map(k => 0.5 * math.pow(0.5, k)) // exact powers of 2
    val sqlTerms = weights.zipWithIndex.map { case (w, k) =>
      (s"COALESCE(CASE WHEN lag(x, $k) OVER w IS NOT NULL THEN $w * lag(x, $k) OVER w END, 0)",
        s"COALESCE(CASE WHEN lag(x, $k) OVER w IS NOT NULL THEN $w END, 0)")
    }
    Q(
      "q_ewma",
      s"""WITH daily AS (
         |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         |    round(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS x
         |  FROM events GROUP BY 1, 2)
         |SELECT event_type, day, x,
         |  round((${sqlTerms.map(_._1).mkString(" + ")}) /
         |        (${sqlTerms.map(_._2).mkString(" + ")}), 6) AS ewma
         |FROM daily
         |WINDOW w AS (PARTITION BY event_type ORDER BY day)
         |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val daily = T.events(s, d)
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(round(dbl(sum(dec2(col("value")))) / count(lit(1)), 6).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val lags = weights.zipWithIndex.map { case (wt, k) => (lag(col("x"), k).over(w), wt) }
      val num = lags.map { case (l, wt) =>
        coalesce(when(l.isNotNull, lit(wt) * l), lit(0.0)): Column
      }.reduce(_ + _)
      val den = lags.map { case (l, wt) =>
        coalesce(when(l.isNotNull, lit(wt)), lit(0.0)): Column
      }.reduce(_ + _)
      daily
        .select(col("event_type"), col("day"), col("x"),
          round(num / den, 6).as("ewma"))
        .orderBy("event_type", "day")
    }
  }

  /** Linear interpolation of sentinel-missing values (k = 0, the loaders'
    * falsy-skip convention) along each event_type's event_id axis:
    * missing points take pv + (nv − pv)·(id − pid)/(nid − pid) between
    * the nearest known neighbors; leading/trailing gaps clamp to the
    * nearest known value (pandas `interpolate(limit_direction='both')`
    * semantics — the gap-fill the reference's R series prep does before
    * smoothing, cf. qEwma).
    *
    * Scale: two IGNORE NULLS running-value windows (forward + backward)
    * partitioned by event_type — one shuffle on the series key, no
    * self-joins, no point-by-point lookups. The interpolation arithmetic
    * is structured identically in both engines (left-assoc * then /), so
    * doubles fold bit-equal. */
  val qInterpolate: Q = Q(
    "q_interpolate",
    """WITH e AS (SELECT event_id, event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events),
      |w AS (SELECT event_id, event_type, k,
      |  last_value(CASE WHEN k <> 0 THEN CAST(k AS DOUBLE) END IGNORE NULLS)
      |    OVER (PARTITION BY event_type ORDER BY event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |  last_value(CASE WHEN k <> 0 THEN event_id END IGNORE NULLS)
      |    OVER (PARTITION BY event_type ORDER BY event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid,
      |  first_value(CASE WHEN k <> 0 THEN CAST(k AS DOUBLE) END IGNORE NULLS)
      |    OVER (PARTITION BY event_type ORDER BY event_id
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |  first_value(CASE WHEN k <> 0 THEN event_id END IGNORE NULLS)
      |    OVER (PARTITION BY event_type ORDER BY event_id
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nid
      |  FROM e)
      |SELECT event_id, event_type, k AS k_raw,
      |  round(CASE WHEN k <> 0 THEN CAST(k AS DOUBLE)
      |       WHEN pv IS NOT NULL AND nv IS NOT NULL
      |         THEN pv + (nv - pv) * (event_id - pid) / (nid - pid)
      |       WHEN pv IS NOT NULL THEN pv ELSE nv END, 6) AS k_filled,
      |  CAST(CASE WHEN k = 0 THEN 1 ELSE 0 END AS INT) AS was_interpolated
      |FROM w ORDER BY event_id""".stripMargin) { (s, d) =>
    val e = T.events(s, d).select(col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
    val back = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val known = when(col("k") =!= 0, col("k").cast("double"))
    val knownId = when(col("k") =!= 0, col("event_id"))
    val w = e
      .withColumn("pv", last(known, ignoreNulls = true).over(back))
      .withColumn("pid", last(knownId, ignoreNulls = true).over(back))
      .withColumn("nv", first(known, ignoreNulls = true).over(fwd))
      .withColumn("nid", first(knownId, ignoreNulls = true).over(fwd))
    w.select(col("event_id"), col("event_type"), col("k").as("k_raw"),
      round(when(col("k") =!= 0, col("k").cast("double"))
        .when(col("pv").isNotNull && col("nv").isNotNull,
          col("pv") + (col("nv") - col("pv")) * (col("event_id") - col("pid"))
            / (col("nid") - col("pid")))
        .when(col("pv").isNotNull, col("pv"))
        .otherwise(col("nv")), 6).as("k_filled"),
      when(col("k") === 0, 1).otherwise(0).as("was_interpolated"))
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(qImpute, qEwma, qInterpolate)
}
