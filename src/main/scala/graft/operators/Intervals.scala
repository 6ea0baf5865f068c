package graft.operators

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** Interval analytics (SURVEY.md §2.2 q_interval_active): how many
  * validity intervals overlap each time window — the "active rows per
  * release window" question an SCD2 history answers (the reference's
  * MySQL ins/upd history in loaders/TCRD.py, sliced by load date).
  *
  * The scale lesson is the plan shape: the naive formulation is an
  * interval-vs-window THETA join (start <= we AND end >= ws — a
  * BroadcastNestedLoopJoin, O(rows × windows)). Instead each interval
  * REPLICATES to its covered week buckets map-side (explode of a
  * bounded sequence — interval length caps the fanout) and the overlap
  * count becomes a plain hash aggregation on the bucket id. Same move
  * as rule_range_join, done at the operator level: no join at all.
  */
object Intervals {

  /** Weekly concurrency of lineitem validity intervals
    * [l_shipdate, l_shipdate + l_quantity days]: per 7-day epoch bucket,
    * the number of active intervals and their mean duration (exact
    * integer sums, rounded at the edge). */
  val qIntervalActive: Q = Q(
    "q_interval_active",
    """WITH iv AS (
      |  SELECT date_diff('day', TIMESTAMP '1995-01-01', l_shipdate) AS dd,
      |         CAST(l_quantity AS BIGINT) AS dur
      |  FROM lineitem),
      |wk AS (SELECT dd // 7 AS start_wk, (dd + dur) // 7 AS end_wk, dur FROM iv),
      |act AS (SELECT unnest(generate_series(start_wk, end_wk)) AS wk, dur FROM wk)
      |SELECT wk, COUNT(*) AS n_active,
      |  round(CAST(SUM(dur) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_dur
      |FROM act GROUP BY 1 ORDER BY wk""".stripMargin) { (s, d) =>
    val iv = T.lineitem(s, d).select(
      datediff(col("l_shipdate"), lit("1995-01-01").cast("timestamp")).cast("long").as("dd"),
      col("l_quantity").cast("long").as("dur"))
    val wk = iv.select(expr("dd div 7").as("start_wk"),
      expr("(dd + dur) div 7").as("end_wk"), col("dur"))
    wk.select(explode(sequence(col("start_wk"), col("end_wk"))).as("wk"), col("dur"))
      .groupBy("wk")
      .agg(count(lit(1)).as("n_active"), sum(col("dur")).as("sdur"))
      .select(col("wk"), col("n_active"),
        round(dbl(col("sdur")) / dbl(col("n_active")), 6).as("avg_dur"))
      .orderBy("wk")
  }

  val all: Seq[Q] = Seq(qIntervalActive)
}
