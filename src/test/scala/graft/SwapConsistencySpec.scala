package graft

import graft.sources.{AtomicSwap, SidecarLayout, ZoneIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Serving-read consistency under maintenance crashes: every crash
  * point of the snapshot-swap protocol leaves (a) a readable, COMPLETE
  * snapshot for [[AtomicSwap.live]] readers — old or new, never torn,
  * never missing — and (b) a state from which a plain re-run converges.
  * The sweep is deterministic: crashes are injected after each protocol
  * step, no timing involved. */
class SwapConsistencySpec extends SparkSpec {

  import spark.implicits._

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def writeRows(dir: String, rows: Seq[Int]): Unit =
    rows.toDF("v").coalesce(1).write.mode("overwrite").parquet(dir)

  private def readRows(dir: Path): Set[Int] =
    spark.read.parquet(dir.toString).collect().map(_.getInt(0)).toSet

  private val A = Seq(1, 2, 3)
  private val B = Seq(4, 5)

  test("every crash point leaves live() serving a complete snapshot, and a re-run converges") {
    for (crashAt <- 1 to 4) {
      val base = java.nio.file.Files.createTempDirectory("swap").toString
      val cur = new Path(s"$base/snap")
      writeRows(cur.toString, A)
      writeRows(AtomicSwap.nextOf(cur).toString, B)
      val crashed = intercept[AtomicSwap.CrashPoint] {
        AtomicSwap.commit(fs, cur, crashAfter = crashAt)
      }
      assert(crashed.step == crashAt)
      // reader guarantee at the crash point
      val served = AtomicSwap.live(fs, cur)
      assert(served.isDefined, s"crash@$crashAt: nothing to serve")
      val got = readRows(served.get)
      assert(got == A.toSet || got == B.toSet,
        s"crash@$crashAt: torn snapshot $got")
      // re-run converges: re-stage (idempotent overwrite) + commit
      writeRows(AtomicSwap.nextOf(cur).toString, B)
      AtomicSwap.commit(fs, cur)
      assert(readRows(cur) == B.toSet, s"crash@$crashAt: re-run did not converge")
      assert(!fs.exists(AtomicSwap.prevOf(cur)),
        s"crash@$crashAt: backup not cleaned after converged commit")
    }
  }

  test("first-ever commit (no current snapshot) survives its crash points too") {
    for (crashAt <- 3 to 4) {
      val base = java.nio.file.Files.createTempDirectory("swap").toString
      val cur = new Path(s"$base/snap")
      writeRows(AtomicSwap.nextOf(cur).toString, B)
      intercept[AtomicSwap.CrashPoint] {
        AtomicSwap.commit(fs, cur, crashAfter = crashAt)
      }
      assert(AtomicSwap.live(fs, cur).map(readRows).contains(B.toSet))
    }
  }

  test("the half-swapped window (cur renamed away) cannot strand the last copy on re-run") {
    // crash at step 2: cur is gone, prev holds the ONLY copy of A
    val base = java.nio.file.Files.createTempDirectory("swap").toString
    val cur = new Path(s"$base/snap")
    writeRows(cur.toString, A)
    writeRows(AtomicSwap.nextOf(cur).toString, B)
    intercept[AtomicSwap.CrashPoint] {
      AtomicSwap.commit(fs, cur, crashAfter = 2)
    }
    assert(!fs.exists(cur) && fs.exists(AtomicSwap.prevOf(cur)))
    // a re-run in this state must NOT delete prev before the new snapshot
    // is in place — the step-order guard under test. Re-stage from the
    // live dir (what upsertSink's base resolution does) and commit.
    val baseRows = readRows(AtomicSwap.live(fs, cur).get)
    assert(baseRows == A.toSet)
    writeRows(AtomicSwap.nextOf(cur).toString, B)
    AtomicSwap.commit(fs, cur)
    assert(readRows(cur) == B.toSet)
  }

  test("ann-index compact: the post-swap pre-cleanup crash never double-serves or bakes duplicates in") {
    import graft.sources.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("swapann").toString
    val corpus = graft.sources.Tables.embeddings(spark, TinyDir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    AnnIndex.build(corpus, dir, k = 4)
    val n = AnnIndex.readIndex(spark, dir).count()
    // streamed appends of NEW vectors: these must COUNT (no read-side
    // dedup may eat live appends)
    AnnIndex.readIndex(spark, dir).limit(5)
      .withColumn("id", col("id") + 1000000L)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/index_stream")
    assert(AnnIndex.readIndex(spark, dir).count() == n + 5,
      "live streamed appends not served")
    // ...and with an active stream region, a probed-cell read must still
    // prune: no shuffle may sneak between the scans and the filter
    val someCell = AnnIndex.readIndex(spark, dir).select("cell").head().getInt(0)
    val pruned = AnnIndex.readIndex(spark, dir)
      .filter(col("cell") === someCell)
    assert(!pruned.queryExecution.executedPlan.toString.contains("Exchange"),
      "cell filter no longer prunes with a stream region present")

    // crash simulation: run the compact, then restore the stream region
    // byte-for-byte (same basenames) — exactly the state a crash between
    // the commit and the stream cleanup leaves behind
    val aside = java.nio.file.Files.createTempDirectory("swapann_aside").toString
    def copyTree(from: java.io.File, to: java.io.File): Unit = {
      if (from.isDirectory) {
        to.mkdirs()
        Option(from.listFiles()).getOrElse(Array.empty)
          .foreach(f => copyTree(f, new java.io.File(to, f.getName)))
      } else java.nio.file.Files.copy(from.toPath, to.toPath)
    }
    copyTree(new java.io.File(s"$dir/index_stream"), new java.io.File(s"$aside/index_stream"))
    AnnIndex.compact(spark, dir)
    assert(AnnIndex.readIndex(spark, dir).count() == n + 5)
    copyTree(new java.io.File(s"$aside/index_stream"), new java.io.File(s"$dir/index_stream"))
    // the folded-file marker excludes the restored duplicates
    assert(AnnIndex.readIndex(spark, dir).count() == n + 5,
      "crash window double-served folded stream rows")
    // plain re-run converges: same rows, stream gone, ids unique
    AnnIndex.compact(spark, dir)
    assert(AnnIndex.readIndex(spark, dir).count() == n + 5)
    assert(!new java.io.File(s"$dir/index_stream").exists())
    assert(AnnIndex.readIndex(spark, dir)
      .groupBy("id").count().filter(col("count") > 1).count() == 0,
      "re-run baked duplicates into the compacted index")
  }

  test("compactSwap: a crash between its renames leaves serving reads and the re-run whole") {
    val base = java.nio.file.Files.createTempDirectory("swapc").toString
    val dir = s"$base/li"
    val li = graft.sources.Tables.lineitem(spark, TinyDir)
      .select("l_orderkey", "l_suppkey", "l_quantity").limit(200)
    def rebuild(df: org.apache.spark.sql.DataFrame, out: String): Unit =
      ZoneIndex.writeWithZoneIndex(df, out, "l_orderkey", 4, Seq("l_suppkey"))
    rebuild(li, dir)
    val n = SidecarLayout.readData(spark, dir).count()
    // simulate the mid-swap crash state: cur renamed to prev, next staged
    fs.delete(new Path(dir + "_prev"), true)
    rebuild(SidecarLayout.readData(spark, dir), dir + "_next")
    fs.rename(new Path(dir), new Path(dir + "_prev"))
    // serving read: readData falls back to the backup, full row count
    assert(SidecarLayout.readData(spark, dir).count() == n,
      "serving read broke in the crash window")
    // plain re-run of the compact converges from this state
    val m = SidecarLayout.compactSwap(spark, dir, rebuild)
    assert(m == n)
    assert(SidecarLayout.readData(spark, dir).count() == n)
  }
}
