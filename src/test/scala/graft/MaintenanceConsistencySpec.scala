package graft

import graft.sources.{AtomicSwap, FileIndex, InvertedIndex, SidecarLayout, ZoneIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Serving-read consistency under concurrent maintenance — the r7
  * verdict's matrix: reader mid-flight × {zone refresh, bloom refresh,
  * inverted compact} × every crash point, asserting each read resolves
  * ONE complete snapshot (never torn, never double-counting) and that a
  * plain re-run converges. upsertSink / compactSwap / AnnIndex.compact /
  * FreqIndex rebuild crash points are pinned by SwapConsistencySpec and
  * FreqIndexSpec; this spec covers the sidecar-replace and
  * folded-marker protocols added in r8. */
class MaintenanceConsistencySpec extends SparkSpec {

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmp(name: String): String =
    s"/tmp/graft_maint/${name}_${System.nanoTime()}"

  // one sweep of previous runs' fixtures, not per-test (unique suffixes
  // keep tests isolated within a run)
  override def beforeAll(): Unit = {
    super.beforeAll()
    fs("/tmp/graft_maint").delete(new Path("/tmp/graft_maint"), true)
    ()
  }

  // ---- zone-map refresh: staged sidecar swap ------------------------

  private def zoneFixture(dir: String): Unit = {
    import spark.implicits._
    val df = (1L to 400L).map(k => (k, s"p$k")).toDF("k", "payload")
    ZoneIndex.writeWithZoneIndex(df, dir, "k", 4)
    // streamed batch, statted
    (401L to 440L).map(k => (k, s"p$k")).toDF("k", "payload")
      .write.mode("overwrite").parquet(s"$dir/batch_id=0")
    ZoneIndex.refreshIncremental(spark, dir)
    // replay overwrites the batch dir with NEW file names -> the next
    // refresh has both stale rows to prune and fresh files to stat,
    // forcing the staged-replace path
    fs(dir).delete(new Path(s"$dir/batch_id=0"), true)
    (401L to 460L).map(k => (k, s"p$k")).toDF("k", "payload")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/batch_id=0")
  }

  private def zoneRead(dir: String): Seq[Long] =
    ZoneIndex.rangeLookup(spark, dir, "k", 390.0, 450.0)._1
      .select("k").collect().map(_.getLong(0)).sorted.toSeq

  for (crashAt <- 1 to 4)
    test(s"zone refresh crash point $crashAt: reads stay complete, re-run heals") {
      val dir = tmp(s"zone$crashAt")
      zoneFixture(dir)
      val before = zoneRead(dir)
      intercept[AtomicSwap.CrashPoint] {
        ZoneIndex.refreshIncremental(spark, dir, crashAfter = crashAt)
      }
      // reader mid-crash: must resolve a complete sidecar (old or new)
      val mid = zoneRead(dir)
      val (ndv, _) = ZoneIndex.estimateDistinctInRange(spark, dir, "k", 1.0, 460.0)
      assert(ndv > 0.0)
      // re-run converges: canonical layout, exact reads
      ZoneIndex.refreshIncremental(spark, dir)
      val after = zoneRead(dir)
      assert(mid == before || mid == after,
        s"crash-state read is neither old nor new snapshot (point $crashAt)")
      val expected = SidecarLayout.readData(spark, dir)
        .filter(col("k").between(390, 450))
        .select("k").collect().map(_.getLong(0)).sorted.toSeq
      assert(after == expected, "healed zone lookup diverges from full scan")
      assert(fs(dir).exists(new Path(s"$dir/_zone_index")))
      assert(!fs(dir).exists(new Path(s"$dir/_zone_index_prev")))
      assert(!fs(dir).exists(new Path(s"$dir/_zone_index_next")))
    }

  // ---- bloom refresh: staged sidecar swap ---------------------------

  private def bloomFixture(dir: String): Unit = {
    import spark.implicits._
    val df = (1L to 400L).map(k => (k, s"p$k")).toDF("k", "payload")
    FileIndex.writeWithBloomIndex(df, dir, "k", 4, expectedPerFile = 200L)
    (401L to 440L).map(k => (k, s"p$k")).toDF("k", "payload")
      .write.mode("overwrite").parquet(s"$dir/batch_id=0")
    FileIndex.refreshIncremental(spark, dir)
    fs(dir).delete(new Path(s"$dir/batch_id=0"), true)
    (401L to 460L).map(k => (k, s"p$k")).toDF("k", "payload")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/batch_id=0")
  }

  private def bloomRead(dir: String, v: Long): Long =
    FileIndex.pointLookup(spark, dir, "k", v)._1.count()

  for (crashAt <- 1 to 4)
    test(s"bloom refresh crash point $crashAt: reads stay complete, re-run heals") {
      val dir = tmp(s"bloom$crashAt")
      bloomFixture(dir)
      intercept[AtomicSwap.CrashPoint] {
        FileIndex.refreshIncremental(spark, dir, crashAfter = crashAt)
      }
      // mid-crash: lookups of long-lived keys never throw and never lose
      // rows (their files are indexed in BOTH old and new sidecars)
      assert(bloomRead(dir, 100L) == 1L, s"stable key lost at point $crashAt")
      FileIndex.refreshIncremental(spark, dir)
      assert(bloomRead(dir, 100L) == 1L)
      assert(bloomRead(dir, 455L) == 1L, "replayed-batch key missing after heal")
      assert(bloomRead(dir, 999L) == 0L)
      assert(fs(dir).exists(new Path(s"$dir/_bloom_index")))
      assert(!fs(dir).exists(new Path(s"$dir/_bloom_index_prev")))
      assert(!fs(dir).exists(new Path(s"$dir/_bloom_index_next")))
    }

  // ---- inverted-index compact: swap + folded marker -----------------

  private def invFixture(dir: String): Unit = {
    import spark.implicits._
    val base = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha delta"),
      (3L, "beta delta")).toDF("doc_id", "text")
    InvertedIndex.write(base, dir, nBuckets = 2)
    val delta = Seq((4L, "alpha beta"), (5L, "gamma gamma beta")).toDF("doc_id", "text")
    InvertedIndex.appendDelta(spark, dir, delta, nBuckets = 2)
  }

  private def invRead(dir: String): Seq[(Long, Long)] =
    InvertedIndex.lookupAll(spark, dir, Seq("alpha", "beta"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  // the logical corpus never changes across compact, so the lookup must
  // be IDENTICAL at every crash point — double-counting (delta served
  // twice) or loss (half-swap) both break this equality
  private val invExpected = Seq((1L, 2L), (4L, 2L)) // docs with alpha AND beta

  for (crashAt <- 1 to 5)
    test(s"inverted compact crash point $crashAt: no double counts, no loss, re-run converges") {
      val dir = tmp(s"inv$crashAt")
      invFixture(dir)
      assert(invRead(dir) == invExpected, "fixture sanity")
      intercept[AtomicSwap.CrashPoint] {
        InvertedIndex.compact(spark, dir, nBuckets = 2, crashAfter = crashAt)
      }
      assert(invRead(dir) == invExpected,
        s"crash-state lookup wrong at point $crashAt (torn or double-counted)")
      InvertedIndex.compact(spark, dir, nBuckets = 2)
      assert(invRead(dir) == invExpected, "post-heal lookup wrong")
      assert(fs(dir).exists(new Path(dir)), "base dir restored")
      assert(!fs(dir).exists(new Path(s"${dir}_prev")), "backup cleaned")
      assert(!fs(dir).exists(new Path(s"$dir/_folded")), "marker cleared")
      val deltaRoot = new Path(s"${dir}_delta")
      assert(!fs(dir).exists(deltaRoot) || fs(dir).listStatus(deltaRoot).isEmpty,
        "folded delta dirs deleted")
    }

  test("append after a crashed compact never reuses a folded region name") {
    import spark.implicits._
    val dir = tmp("invAppend")
    invFixture(dir)
    intercept[AtomicSwap.CrashPoint] {
      InvertedIndex.compact(spark, dir, nBuckets = 2, crashAfter = 5)
    }
    // r00001 is folded-but-present; the new region must take a new name
    val region = InvertedIndex.appendDelta(spark, dir,
      Seq((6L, "alpha beta epsilon")).toDF("doc_id", "text"), nBuckets = 2)
    assert(!region.endsWith("r00001"), s"reused folded region name: $region")
    assert(invRead(dir) == invExpected :+ ((6L, 2L)),
      "post-crash append not served (or folded region double-counted)")
  }
}
