package graft.operators

import graft.Q
import graft.sources.{Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest prior) time join (SURVEY.md §2.2 q_asof_join).
  *
  * Spark-first formulation: instead of a range join (which Catalyst would
  * plan as a broadcast-nested-loop or an exploding theta join), tag both
  * sides, union them, and carry the right side's latest value forward with
  * a running `last(..., ignoreNulls)` window. Cost at scale: ONE shuffle on
  * the join key — same as a plain equi-join — versus the quadratic blowup
  * of `l.ts >= r.ts` theta joins. The right side is pre-deduped to one row
  * per (key, ts) so the pick under timestamp ties is deterministic.
  */
object AsofJoin {

  /** Generic left as-of join.
    * @param left      probe rows
    * @param right     build rows, MUST be unique per (key, time)
    * @param key       equi-join key column name (both sides)
    * @param leftTime  event-time column on left (long, e.g. micros)
    * @param rightTime event-time column on right (long)
    * @param rightVals right columns to carry (beside key/time)
    * @return left rows + latest right row with rightTime <= leftTime
    */
  def leftAsof(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightVals: Seq[String]): DataFrame = {
    val l = left.withColumn("__t", col(leftTime)).withColumn("__src", lit(1))
    val r = right.withColumn("__t", col(rightTime)).withColumn("__src", lit(0))
    val lCols = left.columns.toSeq
    val u = r.select(Seq(col(key), col("__t"), col("__src")) ++
        rightVals.map(col) ++ lCols.filterNot(_ == key).map(c => lit(null).as(c)): _*)
      .unionByName(
        l.select(Seq(col(key), col("__t"), col("__src")) ++
          rightVals.map(c => lit(null).as(c)) ++ lCols.filterNot(_ == key).map(col): _*))
    // right rows sort before left rows at equal time => inclusive (<=) as-of
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(u) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(c), ignoreNulls = true).over(w))
    }.withColumn("__asof_t", last(when(col("__src") === 0, col("__t")), ignoreNulls = true).over(w))
    carried.filter(col("__src") === 1)
      .select(lCols.map(col) ++ rightVals.map(c => col(s"__asof_$c").as(c)) :+
        col("__asof_t").as("asof_time"): _*)
  }

  /** Each purchase event picks up the user's latest prior (or simultaneous)
    * click. Oracle uses DuckDB's native ASOF JOIN — different algorithm,
    * same semantics. */
  val qAsofJoin: Q = Q(
    "q_asof_join",
    """WITH clicks AS (
      |  SELECT user_id, epoch_us(ts) AS ctus, MAX(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (SELECT user_id, epoch_us(ts) AS ptus, event_id
      |      FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ptus,
      |  COALESCE(c.click_id, -1) AS last_click_id,
      |  COALESCE(p.ptus - c.ctus, -1) AS gap_us
      |FROM p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ptus >= c.ctus
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val ev = T.events(s, d).withColumn("tus", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("tus").as("ctus"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tus").as("ptus"))
    leftAsof(purchases, clicks, "user_id", "ptus", "ctus", Seq("click_id"))
      .select(col("event_id"), col("user_id"), col("ptus"),
        coalesce(col("click_id"), lit(-1L)).as("last_click_id"),
        coalesce(col("ptus") - col("asof_time"), lit(-1L)).as("gap_us"))
      .orderBy("event_id")
  }

  /** As-of join with a tolerance: a prior match only counts if it is
    * within 1 hour — stale context is dropped, the row survives with a
    * sentinel. Same single-shuffle plan; the tolerance is a post-carry
    * filter, not a different join. */
  val qAsofTolerance: Q = Q(
    "q_asof_tolerance",
    """WITH clicks AS (
      |  SELECT user_id, epoch_us(ts) AS ctus, MAX(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (SELECT user_id, epoch_us(ts) AS ptus, event_id
      |      FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ptus,
      |  CASE WHEN p.ptus - c.ctus <= 3600000000 THEN c.click_id ELSE -1 END AS last_click_id,
      |  CASE WHEN p.ptus - c.ctus <= 3600000000 THEN p.ptus - c.ctus ELSE -1 END AS gap_us
      |FROM p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ptus >= c.ctus
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val tolUs = 3600L * 1000 * 1000
    val ev = T.events(s, d).withColumn("tus", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("tus").as("ctus"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tus").as("ptus"))
    leftAsof(purchases, clicks, "user_id", "ptus", "ctus", Seq("click_id"))
      .withColumn("gap", col("ptus") - col("asof_time"))
      .select(col("event_id"), col("user_id"), col("ptus"),
        when(col("gap") <= tolUs, col("click_id")).otherwise(-1L).as("last_click_id"),
        when(col("gap") <= tolUs, col("gap")).otherwise(-1L).as("gap_us"))
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(qAsofJoin, qAsofTolerance)
}
