package graft

import graft.streaming.Backfill
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** stream_backfill: late data patches a published window table in place —
  * affected partitions merge additively and rewrite, untouched partitions
  * keep their exact bytes, and the repaired table equals a from-scratch
  * recompute (the mergeability guarantee doing its job). */
class BackfillSpec extends SparkSpec {

  private val DayUs = 86400L * 1000 * 1000
  // realistic epoch so partition values never narrow to int
  private val T0 = 1700000000L * 1000 * 1000 - (1700000000L * 1000 * 1000) % DayUs

  private def evDf(rows: Seq[(Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("us", "event_type", "value")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"),
        col("value"), monotonically_increasing_id().as("event_id"))
  }

  private def snapPartition(dir: String, win: Long): Map[String, (Long, Long)] = {
    val d = new java.io.File(s"$dir/win=$win")
    Option(d.listFiles()).getOrElse(Array.empty).filter(_.isFile)
      .map(f => f.getName -> (f.length, f.lastModified)).toMap
  }

  test("late rows repair only their windows; untouched partitions keep exact bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bf").toString + "/pub"
    // three days published: d0 and d2 will stay clean, d1 gets late data
    val base = evDf(Seq(
      (T0 + 1, "click", 1.00), (T0 + 2, "view", 2.00),
      (T0 + DayUs + 1, "click", 3.00), (T0 + DayUs + 2, "click", 4.00),
      (T0 + 2 * DayUs + 1, "view", 5.00)))
    Backfill.publish(base, dir, DayUs)
    val d0Before = snapPartition(dir, T0)
    val d2Before = snapPartition(dir, T0 + 2 * DayUs)
    assert(d0Before.nonEmpty && d2Before.nonEmpty)
    Thread.sleep(1100)

    // late: two more d1 clicks, one d1 view (new key in that window)
    val late = evDf(Seq(
      (T0 + DayUs + 3, "click", 10.00), (T0 + DayUs + 4, "click", 0.50),
      (T0 + DayUs + 5, "view", 7.25)))
    val report = Backfill.reconcileLate(spark, dir, late, DayUs).collect()

    // report: exactly the patched (window, key) rows with additive counts
    assert(report.forall(_.getAs[Long]("win") == T0 + DayUs))
    val click = report.find(_.getAs[String]("event_type") == "click").get
    assert(click.getAs[Long]("old_cnt") == 2L &&
      click.getAs[Long]("late_cnt") == 2L &&
      click.getAs[Long]("new_cnt") == 4L)
    val view = report.find(_.getAs[String]("event_type") == "view").get
    assert(view.getAs[Long]("old_cnt") == 0L && view.getAs[Long]("new_cnt") == 1L)

    // untouched partitions: identical names, lengths, mtimes
    assert(snapPartition(dir, T0) == d0Before, "d0 partition was rewritten")
    assert(snapPartition(dir, T0 + 2 * DayUs) == d2Before, "d2 partition was rewritten")

    // the repaired table equals a from-scratch aggregate over base+late
    val repaired = spark.read.parquet(dir)
      .select(col("win").cast("long"), col("event_type"), col("cnt"),
        col("sum_v").cast("double"))
      .collect().map(_.toSeq).toSet
    val fresh = Backfill.aggregateWindows(base.unionByName(late), DayUs)
      .select(col("win"), col("event_type"), col("cnt"),
        col("sum_v").cast("double"))
      .collect().map(_.toSeq).toSet
    assert(repaired == fresh, s"repair != recompute:\n$repaired\nvs\n$fresh")
  }

  test("a late batch for an unpublished window creates it from zero") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bf").toString + "/pub"
    Backfill.publish(evDf(Seq((T0 + 1, "click", 1.00))), dir, DayUs)
    val report = Backfill.reconcileLate(spark, dir,
      evDf(Seq((T0 + 5 * DayUs + 1, "view", 2.50))), DayUs).collect()
    assert(report.length == 1)
    assert(report.head.getAs[Long]("old_cnt") == 0L)
    assert(report.head.getAs[Long]("new_cnt") == 1L)
    val wins = spark.read.parquet(dir).select(col("win").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(wins == Set(T0, T0 + 5 * DayUs))
  }

  test("ledger row records the repair when a provenance dir is given") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bf").toString
    Backfill.publish(evDf(Seq((T0 + 1, "click", 1.00))), s"$tmp/pub", DayUs)
    Backfill.reconcileLate(spark, s"$tmp/pub",
      evDf(Seq((T0 + 2, "click", 2.00))), DayUs,
      provDir = Some(s"$tmp/prov"), loadedAtUs = 42L).count()
    val ledger = spark.read.parquet(s"$tmp/prov").collect()
    assert(ledger.length == 1)
    assert(ledger.head.getAs[String]("dataset") == "pub")
    assert(ledger.head.getAs[String]("source") == "backfill@42")
    assert(ledger.head.getAs[Long]("loaded_at_us") == 42L)
  }
}
