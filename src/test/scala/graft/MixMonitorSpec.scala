package graft

import graft.streaming.MixMonitor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** stream_mix_monitor: per-source share vs a target mixture over closed
  * event-time windows; K consecutive out-of-tolerance windows alert,
  * one noisy window does not; a silent configured source drifts; replay
  * of an applied batch is a no-op; the sink runs end-to-end. */
class MixMonitorSpec extends SparkSpec {

  private val H = 3600L * 1000 * 1000 // 1h window in us
  // uniform 4-source target, 10% tolerance, alert on 2 consecutive
  private val Target = Map("sA" -> 250000L, "sB" -> 250000L,
    "sC" -> 250000L, "sD" -> 250000L)

  private def ev(winIdx: Long, source: String, tokens: Long): (java.sql.Timestamp, String, Long) =
    (new java.sql.Timestamp(winIdx * 3600 * 1000), source, tokens)

  private def toDf(rows: Seq[(java.sql.Timestamp, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("ts", "source", "tokens")
  }

  private def alerts(dir: String): Array[org.apache.spark.sql.Row] =
    MixMonitor.readAlerts(spark, dir).collect()

  test("balanced windows stay quiet; K consecutive drifts alert; one drift does not") {
    val dir = java.nio.file.Files.createTempDirectory("mixmon").toString
    // batch 0: w0 balanced, w1 skewed toward sA; an event in w2 closes both
    MixMonitor.mixMonitorBatch(toDf(Seq(
      ev(0, "sA", 100), ev(0, "sB", 100), ev(0, "sC", 100), ev(0, "sD", 100),
      ev(1, "sA", 700), ev(1, "sB", 100), ev(1, "sC", 100), ev(1, "sD", 100),
      ev(2, "sA", 1))), bid = 0, dir, Target, tolPpm = 100000L, kConsec = 2,
      windowUs = H)
    val a0 = alerts(dir)
    val w0 = a0.filter(_.getAs[Long]("win_start_us") == 0L)
    assert(w0.length == 4 && w0.forall(!_.getAs[Boolean]("drift")),
      "balanced window drifted")
    val w1 = a0.filter(_.getAs[Long]("win_start_us") == H)
    // sA at 700/1000 = 700000 ppm vs 250000 target: drift; consec 1, no alert yet
    val w1a = w1.find(_.getAs[String]("source") == "sA").get
    assert(w1a.getAs[Boolean]("drift") && w1a.getAs[Long]("consec") == 1L)
    assert(a0.forall(!_.getAs[Boolean]("alert")), "alert before K windows")

    // batch 1: w2 skewed again (second consecutive drift for sA) + w3 closer
    MixMonitor.mixMonitorBatch(toDf(Seq(
      ev(2, "sA", 699), ev(2, "sB", 100), ev(2, "sC", 100), ev(2, "sD", 100),
      ev(3, "sA", 1))), bid = 1, dir, Target, tolPpm = 100000L, kConsec = 2,
      windowUs = H)
    val a1 = alerts(dir).filter(_.getAs[Long]("win_start_us") == 2 * H)
    val sA = a1.find(_.getAs[String]("source") == "sA").get
    assert(sA.getAs[Long]("consec") == 2L, s"carried run broke: $sA")
    assert(sA.getAs[Boolean]("alert"), "no alert after K consecutive drifts")
    // the other sources drifted low both windows too (sA ate their share)
    val sB = a1.find(_.getAs[String]("source") == "sB").get
    assert(sB.getAs[Boolean]("drift") && sB.getAs[Long]("consec") == 2L)
  }

  test("a silent configured source appears in every closed window with share 0") {
    val dir = java.nio.file.Files.createTempDirectory("mixmon").toString
    // sD never emits in w0
    MixMonitor.mixMonitorBatch(toDf(Seq(
      ev(0, "sA", 100), ev(0, "sB", 100), ev(0, "sC", 100),
      ev(1, "sA", 1))), bid = 0, dir, Target, tolPpm = 100000L, kConsec = 2,
      windowUs = H)
    val w0 = alerts(dir).filter(_.getAs[Long]("win_start_us") == 0L)
    val sD = w0.find(_.getAs[String]("source") == "sD")
    assert(sD.isDefined, "silent source missing from the grid")
    assert(sD.get.getAs[Long]("share_ppm") == 0L)
    assert(sD.get.getAs[Boolean]("drift"), "silence not flagged as drift")
  }

  test("a recovered window resets the run; replay of an applied batch is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("mixmon").toString
    MixMonitor.mixMonitorBatch(toDf(Seq(
      ev(0, "sA", 700), ev(0, "sB", 100), ev(0, "sC", 100), ev(0, "sD", 100),
      ev(1, "sA", 1))), bid = 0, dir, Target, tolPpm = 100000L, kConsec = 2,
      windowUs = H)
    // w1 balanced: runs reset before w2 drifts again -> consec back to 1
    MixMonitor.mixMonitorBatch(toDf(Seq(
      ev(1, "sA", 100), ev(1, "sB", 99), ev(1, "sC", 100), ev(1, "sD", 100),
      ev(2, "sA", 700), ev(2, "sB", 100), ev(2, "sC", 100), ev(2, "sD", 100),
      ev(3, "sA", 1))), bid = 1, dir, Target, tolPpm = 100000L, kConsec = 2,
      windowUs = H)
    val all1 = alerts(dir)
    val w2a = all1.find(r => r.getAs[Long]("win_start_us") == 2 * H &&
      r.getAs[String]("source") == "sA").get
    assert(w2a.getAs[Long]("consec") == 1L, s"recovered window did not reset: $w2a")
    assert(all1.forall(!_.getAs[Boolean]("alert")))

    // replay batch 1 with different (bogus) rows: applied marker wins
    val before = all1.map(_.toSeq).toSeq
    MixMonitor.mixMonitorBatch(toDf(Seq(ev(9, "sA", 12345))),
      bid = 1, dir, Target, tolPpm = 100000L, kConsec = 2, windowUs = H)
    assert(alerts(dir).map(_.toSeq).toSeq == before, "replayed batch mutated state")
    val consec = spark.read.parquet(s"$dir/state/consec").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("consec")).toMap
    assert(consec("sA") == 1L)
  }

  test("a straggler for an already-closed window is dropped, never re-closed") {
    val dir = java.nio.file.Files.createTempDirectory("mixmon").toString
    // batch 0 closes w0 (balanced, quiet)
    MixMonitor.mixMonitorBatch(toDf(Seq(
      ev(0, "sA", 100), ev(0, "sB", 100), ev(0, "sC", 100), ev(0, "sD", 100),
      ev(1, "sA", 1))), bid = 0, dir, Target, tolPpm = 100000L, kConsec = 2,
      windowUs = H)
    val w0Before = alerts(dir).filter(_.getAs[Long]("win_start_us") == 0L)
    assert(w0Before.length == 4 && w0Before.forall(!_.getAs[Boolean]("drift")))
    // batch 1 carries a late w0 event (out-of-order arrival) plus w1 data;
    // re-closing w0 with only the straggler would flag spurious all-source
    // drift for a window already reported and corrupt the run sequence
    MixMonitor.mixMonitorBatch(toDf(Seq(
      ev(0, "sA", 999), // the straggler
      ev(1, "sA", 100), ev(1, "sB", 100), ev(1, "sC", 100), ev(1, "sD", 100),
      ev(2, "sA", 1))), bid = 1, dir, Target, tolPpm = 100000L, kConsec = 2,
      windowUs = H)
    val all = alerts(dir)
    val w0Rows = all.filter(_.getAs[Long]("win_start_us") == 0L)
    assert(w0Rows.length == 4, s"closed window re-reported: ${w0Rows.length} rows")
    assert(w0Rows.forall(!_.getAs[Boolean]("drift")), "straggler re-closed w0")
    // w1 closed normally and quietly; runs unaffected
    val w1Rows = all.filter(_.getAs[Long]("win_start_us") == H)
    assert(w1Rows.length == 4 && w1Rows.forall(_.getAs[Long]("consec") == 0L))
  }

  test("runs end-to-end as a foreachBatch sink on a memory stream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mixmon").toString
    val ck = java.nio.file.Files.createTempDirectory("mixmon_ck").toString
    implicit val sq = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val events = mem.toDF()
      .select(timestamp_micros(col("_1")).as("ts"), col("_2").as("source"),
        col("_3").as("tokens"))
    val q = MixMonitor.mixMonitorSink(events, dir, Target,
        tolPpm = 100000L, kConsec = 2, windowUs = H)
      .option("checkpointLocation", ck).start()
    try {
      mem.addData((0L, "sA", 700L), (0L, "sB", 100L), (0L, "sC", 100L),
        (0L, "sD", 100L), (H, "sA", 1L))
      q.processAllAvailable()
      mem.addData((H, "sA", 699L), (H, "sB", 100L), (H, "sC", 100L),
        (H, "sD", 100L), (2 * H, "sA", 1L))
      q.processAllAvailable()
    } finally q.stop()
    val got = alerts(dir)
    val w1a = got.find(r => r.getAs[Long]("win_start_us") == H &&
      r.getAs[String]("source") == "sA").get
    assert(w1a.getAs[Boolean]("alert"),
      s"streamed monitor missed the 2-window drift: ${got.mkString("\n")}")
  }
}
