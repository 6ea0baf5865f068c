package graft

import graft.ops.{Dedup, DedupService}
import graft.sources.WriterLease
import org.apache.spark.sql.functions._

/** Multi-writer safety for the maintained dedup service (VERDICT r11
  * #8): two concurrent drivers — modeled as two SparkSessions, the
  * granularity the writer identity keys on — must not maintain the same
  * root. The second writer fails LOUD at entry; handover is an explicit
  * release (or breakLease after a confirmed crash). */
class DedupLeaseSpec extends SparkSpec {

  private def docsDf(s: org.apache.spark.sql.SparkSession, ids: Range) = {
    val rows = ids.map { i =>
      (i.toLong, s"the quick brown fox document number $i with shared words " +
        s"and some stable text body repeated across the corpus $i")
    }
    s.createDataFrame(rows).toDF("doc_id", "text")
  }

  test("a second driver's ingest and rebuildIfStale fail loud; release hands over") {
    val driverA = spark
    val driverB = spark.newSession()
    val path = s"/tmp/graft_lease/${System.nanoTime()}"
    val idx = s"$path/index"

    DedupService.init(docsDf(driverA, 0 until 8), path)
    DedupService.ingest(driverA, path, 1L, docsDf(driverA, 8 until 12))

    // driver B: ingest against the same service root → loud, named
    val eI = intercept[IllegalStateException] {
      DedupService.ingest(driverB, path, 2L, docsDf(driverB, 12 until 16))
    }
    assert(eI.getMessage.contains("writer lease") &&
      eI.getMessage.contains(WriterLease.owner(driverA)),
      s"second ingest must name the holder: ${eI.getMessage}")

    // driver B: rebuildIfStale against the index root → loud too (the
    // VERDICT scenario: one driver streams ingests, another runs the
    // rebuild cadence)
    val eR = intercept[IllegalStateException] {
      Dedup.NearDupIndex.rebuildIfStale(driverB, idx, docsDf(driverB, 0 until 12),
        maxInflation = 0.0) // force the rebuild arm
    }
    assert(eR.getMessage.contains("writer lease"),
      s"second rebuild must fail on the lease: ${eR.getMessage}")

    // driver A keeps working (re-entrant lease) and can hand over
    DedupService.ingest(driverA, path, 2L, docsDf(driverA, 12 until 16))
    WriterLease.release(driverA, path)
    WriterLease.release(driverA, idx)
    Dedup.NearDupIndex.rebuild(driverB, idx, docsDf(driverB, 0 until 16))
    assert(WriterLease.holder(driverB, idx).contains(WriterLease.owner(driverB)))

    // B cannot release A's lease... and A cannot release B's
    val eRel = intercept[IllegalStateException] {
      WriterLease.release(driverA, idx)
    }
    assert(eRel.getMessage.contains("cannot release"))

    // breakLease is the confirmed-dead takeover: after it, A proceeds
    WriterLease.breakLease(driverA, idx)
    WriterLease.breakLease(driverA, path)
    DedupService.ingest(driverA, path, 3L, docsDf(driverA, 16 until 18))
  }

  test("the lease survives a rebuild's root swap (sibling placement)") {
    val path = s"/tmp/graft_lease/swap_${System.nanoTime()}"
    Dedup.NearDupIndex.build(docsDf(spark, 0 until 8), path)
    Dedup.NearDupIndex.rebuild(spark, path, docsDf(spark, 0 until 8))
    assert(WriterLease.holder(spark, path).contains(WriterLease.owner(spark)),
      "the swap must not carry the lease away with the outgoing root")
    // and a second session is still excluded after the swap
    val b = spark.newSession()
    val e = intercept[IllegalStateException] {
      Dedup.NearDupIndex.rebuild(b, path, docsDf(b, 0 until 8))
    }
    assert(e.getMessage.contains("writer lease"))
  }
}
