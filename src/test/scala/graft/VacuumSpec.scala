package graft

import graft.sources.{AtomicSwap, SidecarLayout, ZoneIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Retention vacuum for streaming `batch_id=` layouts (sink_compact's
  * streaming sibling, r7 verdict #9): old batch dirs fold into the flat
  * indexed region under the AtomicSwap protocol, recent batches survive
  * byte-identically so crash-replays stay idempotent, and sidecar
  * lookups remain exact throughout — including at every crash point. */
class VacuumSpec extends SparkSpec {

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fixture(dir: String): Unit = {
    import spark.implicits._
    fs(dir).delete(new Path(dir), true)
    ZoneIndex.writeWithZoneIndex(
      (1L to 300L).map(k => (k, s"p$k")).toDF("k", "payload"), dir, "k", 3)
    // three streamed batches, statted as they land (indexedAppendSink's loop)
    for (b <- 0 to 2) {
      (301L + b * 50 to 350L + b * 50).map(k => (k, s"p$k")).toDF("k", "payload")
        .write.mode("overwrite").parquet(s"$dir/batch_id=$b")
      ZoneIndex.refreshIncremental(spark, dir)
    }
  }

  private def fullRead(dir: String): Seq[Long] =
    SidecarLayout.readData(spark, dir).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq

  private def rebuild(df: org.apache.spark.sql.DataFrame, out: String): Unit =
    ZoneIndex.writeWithZoneIndex(df, out, "k", 3)

  test("vacuum folds expired batches, keeps the replayable tail, reads identical") {
    val dir = s"/tmp/graft_vacuum/basic_${System.nanoTime()}"
    fixture(dir)
    val before = fullRead(dir)
    val n = SidecarLayout.vacuumBatches(spark, dir, keepLast = 1, rebuild,
      refresh = Seq(ZoneIndex.refreshIncremental(_, _)))
    assert(n == 2, s"expected 2 expired batches, got $n")
    assert(fullRead(dir) == before, "vacuum changed the data")
    // dead dirs gone, replayable tail intact, no stale swap dirs
    assert(!fs(dir).exists(new Path(s"$dir/batch_id=0")))
    assert(!fs(dir).exists(new Path(s"$dir/batch_id=1")))
    assert(fs(dir).exists(new Path(s"$dir/batch_id=2")))
    assert(!fs(dir).exists(new Path(s"${dir}_prev")))
    assert(!fs(dir).exists(new Path(s"${dir}_next")))
    // sidecar lookups stay exact over the folded + kept layout
    val (rows, _) = ZoneIndex.rangeLookup(spark, dir, "k", 290.0, 460.0)
    val got = rows.select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == before.filter(k => k >= 290 && k <= 460))
    // idempotent: nothing left to expire
    assert(SidecarLayout.vacuumBatches(spark, dir, 1, rebuild) == 0)
  }

  test("replay of the kept batch after vacuum stays idempotent") {
    import spark.implicits._
    val dir = s"/tmp/graft_vacuum/replay_${System.nanoTime()}"
    fixture(dir)
    val before = fullRead(dir)
    SidecarLayout.vacuumBatches(spark, dir, keepLast = 1, rebuild,
      refresh = Seq(ZoneIndex.refreshIncremental(_, _)))
    // the stream crashes and re-runs its last uncommitted batch: the
    // overwrite-idempotent batch dir absorbs the replay (new file names,
    // same rows); the refresh prunes the vanished files' sidecar rows
    (401L to 450L).map(k => (k, s"p$k")).toDF("k", "payload")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/batch_id=2")
    ZoneIndex.refreshIncremental(spark, dir)
    assert(fullRead(dir) == before, "replayed batch double-counted or lost")
    val (rows, _) = ZoneIndex.rangeLookup(spark, dir, "k", 401.0, 450.0)
    assert(rows.count() == 50L)
  }

  for (crashAt <- 1 to 4)
    test(s"vacuum crash point $crashAt: reads stay complete, re-run converges") {
      val dir = s"/tmp/graft_vacuum/crash${crashAt}_${System.nanoTime()}"
      fixture(dir)
      val before = fullRead(dir)
      intercept[AtomicSwap.CrashPoint] {
        SidecarLayout.vacuumBatches(spark, dir, keepLast = 1, rebuild,
          refresh = Seq(ZoneIndex.refreshIncremental(_, _)),
          crashAfter = crashAt)
      }
      // reader mid-crash resolves one complete snapshot
      assert(fullRead(dir) == before, s"torn read at crash point $crashAt")
      // ...and a complete SIDECAR with it: the refresh runs against the
      // staged dir BEFORE the commit, so whichever snapshot the reader
      // resolves (old at points 1-2, new at 3-4), its sidecar already
      // covers every row — including the kept batch — with no healing
      // re-run in between (review r9: the old post-commit refresh left
      // exactly this window lossy)
      val (midRows, _) = ZoneIndex.rangeLookup(spark, dir, "k", 401.0, 450.0)
      assert(midRows.count() == 50L,
        s"kept-batch rows missing from sidecar lookups MID-crash at point $crashAt")
      // plain re-run converges (vacuums or finishes cleanup)
      SidecarLayout.vacuumBatches(spark, dir, keepLast = 1, rebuild,
        refresh = Seq(ZoneIndex.refreshIncremental(_, _)))
      assert(fullRead(dir) == before)
      assert(!fs(dir).exists(new Path(s"$dir/batch_id=0")))
      assert(fs(dir).exists(new Path(s"$dir/batch_id=2")))
      assert(!fs(dir).exists(new Path(s"${dir}_prev")))
      // SIDECAR-served reads must also be whole after the heal: a
      // post-commit crash leaves the rebuilt sidecar covering only the
      // folded rows — the re-run's refresh has to pick up the kept
      // batch's files or range lookups silently lose rows (review r8)
      val (rows, _) = ZoneIndex.rangeLookup(spark, dir, "k", 401.0, 450.0)
      assert(rows.count() == 50L,
        s"kept-batch rows missing from sidecar lookups at crash point $crashAt")
    }
}
