package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** The r9 O(delta) SCAN claims for the persisted near-dup index, pinned
  * against executed plans and task input metrics (not doc comments):
  *
  *  - query()'s verify read of the corpus-sized `profiles` table carries
  *    a PUSHED `id IN (candidate ids)` filter over the id-clustered
  *    layout — the heavy (vset) bytes read follow the candidate count,
  *    not the corpus;
  *  - the postings read is partition-pruned to the batch's touched
  *    `shb=` buckets and never shuffles (the batch side broadcasts);
  *  - auto-numbered append regions: successive default appends land in
  *    distinct dirs (the old fixed "delta" default silently overwrote
  *    the previous batch — review r9);
  *  - the staleness metric flags an ordering drifted enough to inflate
  *    candidate volume, and rebuildIfStale restores it.
  */
class NearDupIndexScaleSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, SmallDir)

  private def bytesReadDuring[A](f: => A): (A, Long) = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { bytes.addAndGet(m.inputMetrics.bytesRead); () }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      Thread.sleep(300)
      val b0 = bytes.get
      val r = f
      Thread.sleep(300) // listener bus drain
      (r, bytes.get - b0)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("query pushes the candidate-id filter into the profiles scan (plan + bytes)") {
    val idx = s"/tmp/graft_ndidx_scale_${System.nanoTime()}"
    val isBatch = col("doc_id") % 50 === 0 // a 2% batch
    Dedup.NearDupIndex.build(docs.filter(!isBatch), idx)
    withConf("spark.sql.parquet.pushdown.inFilterThreshold" -> "10000") {
      val pushed = Dedup.NearDupIndex.query(spark, idx, docs.filter(isBatch))
      // the executed plan's profiles scan carries the pushed In(id, ...)
      val plan = pushed.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [In(id"),
        s"no pushed id filter on the verify scan:\n${plan.take(4000)}")
      val (got, pushedBytes) = bytesReadDuring(
        pushed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      // same query with the pushdown disabled (maxPushIds = 0): the
      // verify join scans every profile row — the r8 shape
      val (want, fullBytes) = bytesReadDuring(
        Dedup.NearDupIndex.query(spark, idx, docs.filter(isBatch), maxPushIds = 0)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      assert(got == want, s"pushdown changed the pair set: " +
        s"missing=${want -- got} extra=${got -- want}")
      assert(pushedBytes < fullBytes * 0.85,
        s"pushed verify read $pushedBytes B vs full $fullBytes B — " +
          "the id filter is not skipping profile bytes")
    }
  }

  test("postings read prunes to the touched shb buckets; batch side broadcasts") {
    val idx = s"/tmp/graft_ndidx_shb_${System.nanoTime()}"
    val isBatch = col("doc_id") % 5 === 0
    Dedup.NearDupIndex.build(docs.filter(!isBatch), idx)
    // the candidate stage runs eagerly inside query() (it feeds the
    // collected id pushdown), so inspect its LAZY form directly
    val bprof = Dedup.NearDupIndex.batchProfile(spark, idx, docs.filter(isBatch))
      .localCheckpoint(true)
    val q = Dedup.NearDupIndex.candidateStage(spark, idx, bprof, 0.5)
    val plan = q.queryExecution.executedPlan.toString
    // partition pruning on the bucketed layout is visible as a
    // PartitionFilters entry on the postings scan
    assert(plan.contains("PartitionFilters: [shb"),
      s"postings scan not partition-pruned by shb:\n${plan.take(4000)}")
    // the candidate join broadcasts the (batch-sized) prefix side, so
    // the postings table itself never shuffles
    assert(plan.contains("BroadcastHashJoin"),
      "candidate join lost its broadcast — postings would shuffle per query")
  }

  test("successive default appends land in distinct regions (no silent overwrite)") {
    val idx = s"/tmp/graft_ndidx_regions_${System.nanoTime()}"
    val d = docs.localCheckpoint(true)
    val b1 = col("doc_id") % 5 === 0
    val b2 = col("doc_id") % 5 === 1
    Dedup.NearDupIndex.build(d.filter(!b1 && !b2), idx)
    Dedup.NearDupIndex.append(spark, idx, d.filter(b1)) // default region
    Dedup.NearDupIndex.append(spark, idx, d.filter(b2)) // default region again
    // the old fixed-"delta" default made this second append ERASE the
    // first batch's profiles+postings; querying batch-1 docs again must
    // still see every batch-1-touching pair
    val got = Dedup.NearDupIndex.query(spark, idx, d.filter(b1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth over the same doc set the index holds (base + b1 + b2)
    val want = Dedup.jaccardPairsPrefixAgainst(
        d, "doc_id", "text", 3, 0.5, col("id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"append overwrote a region: " +
      s"missing=${want -- got} extra=${got -- want}")
  }

  test("staleness metric ≈1 fresh, crosses threshold under drift, rebuild restores") {
    import spark.implicits._
    val idx = s"/tmp/graft_ndidx_stale_${System.nanoTime()}"
    val base = docs.localCheckpoint(true)
    Dedup.NearDupIndex.build(base, idx)
    val fresh = Dedup.NearDupIndex.stalenessMetric(spark, idx).head
    assert(math.abs(fresh.getDouble(3) - 1.0) < 0.2,
      s"fresh index should measure inflation ≈ 1, got ${fresh.getDouble(3)}")
    // drift: append a wave of docs sharing a TEMPLATE phrase absent from
    // the build vocab — its grams take frozen df 0 (rarest → prefix-
    // first) while their LIVE df is huge, the classic staleness shape;
    // the unique tail outnumbers the prefix length so the LIVE order
    // keeps every template gram out of the prefix
    val template = (1 to 16).map(k => s"template$k").mkString(" ")
    val wave = (100000L until 101000L).map(i =>
      (i, template + " " + (1 to 16).map(k => s"u${i}x$k").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.NearDupIndex.append(spark, idx, wave)
    val stale = Dedup.NearDupIndex.stalenessMetric(spark, idx).head
    assert(stale.getDouble(3) > 1.5,
      s"planted template drift must inflate candidate volume, got ${stale.getDouble(3)}")
    // the policy: rebuild triggers and restores the fresh-order volume
    val all = base.select("doc_id", "text").unionByName(wave)
    assert(Dedup.NearDupIndex.rebuildIfStale(spark, idx, all),
      "rebuildIfStale must fire above the threshold")
    val after = Dedup.NearDupIndex.stalenessMetric(spark, idx).head
    assert(after.getDouble(3) < 1.2,
      s"rebuild must restore inflation ≈ 1, got ${after.getDouble(3)}")
    assert(!Dedup.NearDupIndex.rebuildIfStale(spark, idx, all),
      "a fresh index must not re-trigger")
  }
}
