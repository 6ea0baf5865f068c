package graft

import graft.sources.{AtomicSwap, GraphBundle, WriterLease}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Atomic republish for the kNN-graph bundle (VERDICT r12 #1 — the one
  * `weak` component): graph/ + vectors/ stage under one `_next` root and
  * land via AtomicSwap, so no reader — batch search or streaming serving
  * batch — can ever join a NEW graph against OLD vectors. Crash matrix:
  * at every commit crash point readers resolve one COMPLETE generation
  * and a re-run converges; mid-staging serving batches see the old
  * generation untouched; the build claims the root's WriterLease. */
class GraphBundleSwapSpec extends SparkSpec {

  /** Two generations with DISJOINT id spaces: any cross-generation mix
    * (gen2 neighbor ids against gen1 vectors or vice versa) is visible
    * as an id from the wrong space — or as a dropped/failed join. */
  private def gen(base: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (for (c <- 0 until 4; j <- 0 until 12) yield {
      val v = Array.fill(8)(0.0); v(c * 2) = 10.0; v(7) = 0.05 * (j + 1)
      (base + c * 12 + j, v.toSeq)
    }).toDF("vec_id", "v")
  }

  private def probesDf = {
    import spark.implicits._
    (0 until 4).map { c =>
      val v = Array.fill(8)(0.0); v(c * 2) = 10.0
      (5000L + c, v.toSeq)
    }.toDF("query_id", "qv")
  }

  private def served(path: String): Set[(Long, Long, Double, Long)] =
    GraphBundle.search(spark, path, probesDf, entries = 4, beam = 6, hops = 3, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("crash matrix: every commit crash point serves one complete generation; re-run converges") {
    val root = java.nio.file.Files.createTempDirectory("graft_gswap").toString
    val path = s"$root/bundle"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

    GraphBundle.build(gen(0L), path, k = 6, rounds = 2)
    val ans1 = served(path)
    assert(ans1.nonEmpty && ans1.forall(_._2 < 1000L))

    // the expected gen2 answer, computed once on a scratch path
    GraphBundle.build(gen(10000L), s"$root/ref2", k = 6, rounds = 2)
    val ans2 = served(s"$root/ref2")
    assert(ans2.nonEmpty && ans2.forall(_._2 >= 10000L))

    for (cp <- 1 to 4) {
      // fresh gen1 bundle, then a republish crashing at commit step cp
      fs.delete(new Path(path), true)
      fs.delete(AtomicSwap.prevOf(new Path(path)), true)
      fs.delete(AtomicSwap.nextOf(new Path(path)), true)
      GraphBundle.build(gen(0L), path, k = 6, rounds = 2)
      intercept[AtomicSwap.CrashPoint] {
        GraphBundle.build(gen(10000L), path, k = 6, rounds = 2, crashAfter = cp)
      }
      // a reader at the crash point serves gen1 OR gen2 — complete,
      // never mixed (disjoint id spaces make a mix visible)
      val mid = served(path)
      assert(mid == ans1 || mid == ans2,
        s"crash at step $cp served a torn generation: " +
          s"ids=${mid.map(_._2).toSeq.sorted.take(8)}")
      // re-run from the crashed state converges to gen2
      GraphBundle.build(gen(10000L), path, k = 6, rounds = 2)
      assert(served(path) == ans2, s"re-run after crash at $cp did not converge")
      assert(!fs.exists(AtomicSwap.nextOf(new Path(path))))
    }
  }

  test("a crash while STAGING leaves the live bundle untouched and the next build recovers") {
    val root = java.nio.file.Files.createTempDirectory("graft_gstage").toString
    val path = s"$root/bundle"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    GraphBundle.build(gen(0L), path, k = 6, rounds = 2)
    val ans1 = served(path)
    // simulate a build that died between the two staging writes: _next
    // holds a graph but no vectors
    gen(10000L).limit(5).select(col("vec_id").as("gsrc"), col("vec_id").as("gdst"))
      .write.parquet(s"${AtomicSwap.nextOf(new Path(path))}/graph")
    assert(served(path) == ans1, "partial staging must be invisible to readers")
    GraphBundle.build(gen(10000L), path, k = 6, rounds = 2)
    assert(served(path).forall(_._2 >= 10000L))
    assert(!fs.exists(AtomicSwap.nextOf(new Path(path))))
  }

  test("a mid-republish serving batch never mixes graph and vector generations") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.streaming.FrozenSides.clear()
    val root = java.nio.file.Files.createTempDirectory("graft_gmix").toString
    val path = s"$root/bundle"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    GraphBundle.build(gen(0L), path, k = 6, rounds = 2)
    val ans1 = served(path)

    val probes = probesDf.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val mem = MemoryStream[(Long, Seq[Double])]
    val out = s"$root/out"
    val q = graft.streaming.StreamingOps.graphSearchSink(
        mem.toDF().toDF("query_id", "qv"), path, out,
        entries = 4, beam = 6, hops = 3, topK = 5)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData(probes.take(1).toIndexedSeq: _*); q.processAllAvailable()

      // 1) republish staged but uncommitted: the serving batch reads gen1
      graft.ops.PipelineOps4.nnDescentGraph(gen(10000L), 6, 2)
        .select(col("src_id").as("gsrc"), col("dst_id").as("gdst"))
        .write.parquet(s"${AtomicSwap.nextOf(new Path(path))}/graph")
      mem.addData(probes(1)); q.processAllAvailable()

      // 2) commit crashed between the two renames (path gone, prev holds
      // gen1): the serving batch resolves the backup — still gen1
      gen(10000L).select(col("vec_id").as("node"), col("v").as("nv"))
        .write.parquet(s"${AtomicSwap.nextOf(new Path(path))}/vectors")
      graft.ops.PipelineOps4.pickEntries(
          spark.read.parquet(s"${AtomicSwap.nextOf(new Path(path))}/graph"),
          GraphBundle.EntryCandidates)
        .write.parquet(s"${AtomicSwap.nextOf(new Path(path))}/entries")
      intercept[AtomicSwap.CrashPoint] {
        AtomicSwap.commit(fs, new Path(path), crashAfter = 2)
      }
      mem.addData(probes(2)); q.processAllAvailable()
      val sofar = spark.read.parquet(out)
      assert(sofar.filter(col("neighbor_id") >= 10000L).count() == 0,
        "no serving batch may see gen2 rows before the swap lands")
      val byQ = sofar.select("query_id", "neighbor_id", "cos", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(byQ == ans1.filter(t => Set(5000L, 5001L, 5002L)(t._1)),
        "pre-swap batches must serve exactly the gen1 answers")

      // 3) complete the swap: the NEXT batch serves gen2 — both sides
      AtomicSwap.commit(fs, new Path(path))
      mem.addData(probes(3)); q.processAllAvailable()
      val after = spark.read.parquet(out).filter(col("query_id") === 5003L).collect()
      assert(after.nonEmpty && after.forall(_.getLong(1) >= 10000L),
        "post-swap batch must serve the new generation (graph AND vectors)")
    } finally q.stop()
  }

  test("refitIfStale: fresh corpus is a no-op, drifted corpus republishes atomically") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_grefit").toString
    val path = s"$root/bundle"
    GraphBundle.build(gen(0L), path, k = 6, rounds = 2)
    val before = served(path)
    // same corpus: no drift, no republish, generation untouched
    assert(!GraphBundle.refitIfStale(gen(0L), path, maxDrift = 0.1, k = 6, rounds = 2))
    assert(served(path) == before)
    // 25% of ids replaced: over the 0.1 drift floor → atomic republish,
    // and the new generation answers about the NEW ids
    val drifted = gen(0L).filter(col("vec_id") % 4 =!= 0L)
      .unionByName((for (j <- 0 until 12) yield {
        val v = Array.fill(8)(0.0); v(0) = 10.0; v(7) = 0.05 * (j + 1)
        (20000L + j, v.toSeq)
      }).toDF("vec_id", "v"))
    assert(GraphBundle.refitIfStale(drifted, path, maxDrift = 0.1, k = 6, rounds = 2))
    val after = served(path)
    assert(after != before)
    assert(after.exists(_._2 >= 20000L),
      "post-refit serving must reach the drifted-in vectors")
  }

  test("a second driver's republish fails loud on the writer lease; release hands over") {
    val driverB = spark.newSession()
    val root = java.nio.file.Files.createTempDirectory("graft_glease").toString
    val path = s"$root/bundle"
    GraphBundle.build(gen(0L), path, k = 6, rounds = 2)
    val rowsB = for (c <- 0 until 4; j <- 0 until 12) yield {
      val v = Array.fill(8)(0.0); v(c * 2) = 10.0; v(7) = 0.05 * (j + 1)
      (10000L + c * 12 + j, v.toSeq)
    }
    val genB = driverB.createDataFrame(rowsB).toDF("vec_id", "v")
    val e = intercept[IllegalStateException] {
      GraphBundle.build(genB, path, k = 6, rounds = 2)
    }
    assert(e.getMessage.contains("writer lease"))
    WriterLease.release(spark, path)
    // B can now claim the root
    WriterLease.ensure(driverB, path, "graph_bundle_build")
    assert(WriterLease.holder(driverB, path).contains(WriterLease.owner(driverB)))
  }

  test("AnnIndex.refit: a second driver fails loud on the lease (VERDICT r12 #8)") {
    import spark.implicits._
    val driverB = spark.newSession()
    val root = java.nio.file.Files.createTempDirectory("graft_annlease").toString
    val vecs = gen(0L).select(col("vec_id").as("id"), col("v"))
    graft.sources.AnnIndex.build(vecs, s"$root/ann", k = 4, pqM = 4, pqK = 8)
    graft.sources.AnnIndex.refit(spark, s"$root/ann", k = 4, pqM = 4, pqK = 8)
    val e = intercept[IllegalStateException] {
      graft.sources.AnnIndex.refit(driverB, s"$root/ann", k = 4, pqM = 4, pqK = 8)
    }
    assert(e.getMessage.contains("writer lease") &&
      e.getMessage.contains(WriterLease.owner(spark)))
    WriterLease.release(spark, s"$root/ann")
    graft.sources.AnnIndex.refit(driverB, s"$root/ann", k = 4, pqM = 4, pqK = 8)
    assert(WriterLease.holder(driverB, s"$root/ann")
      .contains(WriterLease.owner(driverB)))
  }

  test("an EMPTY lease file is corrupt state once STALE: loud named error, breakLease clears (ADVICE r12/r13)") {
    val root = java.nio.file.Files.createTempDirectory("graft_emptylease").toString
    val path = s"$root/bundle"
    val lp = new Path(s"$root/bundle_writer_lease")
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(lp, false).close() // zero-byte lease: crashed mid-claim

    // FRESH empty lease (ADVICE r13): a claimant paused inside the
    // create->write window must NOT be diagnosed as crashed — the error
    // names a probable live claim and never points at breakLease
    val eFresh = intercept[IllegalStateException] {
      WriterLease.ensure(spark, path, "graph_bundle_build")
    }
    assert(eFresh.getMessage.contains("empty") && !eFresh.getMessage.contains("breakLease"),
      s"a fresh empty lease is a probable live mid-claim: ${eFresh.getMessage}")

    // STALE empty lease: age the file past the mid-claim window — now it
    // is a crashed writer and the remedy is named
    val old = System.currentTimeMillis() - 120000L
    fs.setTimes(lp, old, old)
    val e = intercept[IllegalStateException] {
      WriterLease.ensure(spark, path, "graph_bundle_build")
    }
    assert(e.getMessage.contains("empty") && e.getMessage.contains("breakLease"),
      s"stale empty lease must fail loud with the remedy: ${e.getMessage}")
    WriterLease.breakLease(spark, path)
    WriterLease.ensure(spark, path, "graph_bundle_build")
    assert(WriterLease.holder(spark, path).contains(WriterLease.owner(spark)))
  }

  test("an UNKNOWN scheme must pass the create-exclusive capability probe (VERDICT r13 #8)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.sloppy.impl", classOf[SloppyFs].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_sloppy").toString
    val e = intercept[IllegalArgumentException] {
      WriterLease.ensure(spark, s"sloppy:$root/bundle", "graph_bundle_build")
    }
    assert(e.getMessage.contains("capability probe"),
      s"a silently-overwriting FS must fail the probe: ${e.getMessage}")
    // and the probe left nothing behind
    val kids = new java.io.File(root).list()
    assert(kids == null || kids.isEmpty, s"probe must clean up: ${kids.mkString(",")}")
  }
}

/** A FileSystem whose create(overwrite=false) silently overwrites — the
  * non-atomic-create store shape the WriterLease capability probe must
  * reject (everything else delegates to the local filesystem). */
class SloppyFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("sloppy:///")
  // both create chains Hadoop routes through: with and without permission
  override def create(f: Path, permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)
}
