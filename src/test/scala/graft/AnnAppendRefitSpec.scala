package graft

import graft.sources.{AnnIndex, Tables => T}
import org.apache.spark.sql.functions._

/** The append × refit interleave matrix (VERDICT r9 #4): streaming
  * appends and the whole-root geometry refit compose without losing or
  * double-serving a row at ANY interleave point. The refit timeline has
  * three windows an append microbatch can land in:
  *
  *   W1 — append COMMITS before the refit's pre-read listing: the fold
  *        carries it; after the swap it serves from the new root's base
  *        index, exactly once.
  *   W2 — append commits INSIDE the refit window (after the read, before
  *        the root swap): the r10 guard re-lists the stream region at
  *        the commit point and ABORTS the refit (staged root deleted,
  *        live root untouched) — the append keeps serving from the old
  *        root; nothing vanishes, nothing doubles. A post-stop re-run
  *        folds it.
  *   W3 — append starts AFTER the swap: it encodes against the NEW
  *        codebook generation (appendStream resolves the live root at
  *        stream start) and serves exactly once alongside the refit
  *        rows.
  *
  * Plus the crash leg: the swap crash matrix re-run WITH an un-compacted
  * stream region present — every crash point still serves each appended
  * row exactly once.
  */
class AnnAppendRefitSpec extends SparkSpec {

  private def corpus = T.embeddings(spark, TinyDir)
    .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))

  private def freshDirs(): (String, String) = (
    java.nio.file.Files.createTempDirectory("annrefit").toString + "/idx",
    java.nio.file.Files.createTempDirectory("annrefit_ck").toString)

  private def newVecs(fromId: Long, n: Int): Array[(Long, Seq[Double])] =
    corpus.orderBy("id").limit(n).collect()
      .map(r => (r.getLong(0) + fromId, r.getSeq[Double](1)))

  private def servedIds(dir: String): Map[Long, Long] =
    AnnIndex.readIndex(spark, dir).groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("W1: append committed before refit folds into the new root exactly once") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val (dir, ckpt) = freshDirs()
    AnnIndex.build(corpus, dir, k = 8)
    val vecs = newVecs(1000000L, 3)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val q = AnnIndex.appendStream(mem.toDF().toDF("id", "v"), dir, ckpt)
    try { mem.addData(vecs.toIndexedSeq: _*); q.processAllAvailable() }
    finally q.stop()
    AnnIndex.refit(spark, dir, k = 8)
    val counts = servedIds(dir)
    vecs.foreach { case (id, _) =>
      assert(counts.get(id).contains(1L), s"appended $id served ${counts.get(id)} times")
    }
    assert(counts.size === corpus.count() + 3)
    // folded rows live in the new base — the stream region is gone from
    // the live root, so nothing can double-serve later
    assert(!new java.io.File(s"$dir/index_stream").exists(),
      "refit must not carry the already-folded stream region forward")
  }

  test("W2: append landing inside the refit window aborts the refit; nothing vanishes") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val (dir, ckpt) = freshDirs()
    AnnIndex.build(corpus, dir, k = 8)
    val early = newVecs(1000000L, 2)
    val late = newVecs(2000000L, 2)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val q = AnnIndex.appendStream(mem.toDF().toDF("id", "v"), dir, ckpt)
    try {
      mem.addData(early.toIndexedSeq: _*); q.processAllAvailable()
      val e = intercept[IllegalStateException] {
        AnnIndex.refit(spark, dir, k = 8, beforeCommit = () => {
          mem.addData(late.toIndexedSeq: _*); q.processAllAvailable()
        })
      }
      assert(e.getMessage.contains("Stop append streams"),
        s"abort must name the remedy: ${e.getMessage}")
    } finally q.stop()
    // live root untouched: base + BOTH appends serve exactly once
    val counts = servedIds(dir)
    (early ++ late).foreach { case (id, _) =>
      assert(counts.get(id).contains(1L), s"append $id served ${counts.get(id)} times")
    }
    assert(counts.size === corpus.count() + 4)
    // the staged next-root must not linger (a later refit re-stages)
    assert(!new java.io.File(s"${dir}_next").exists(), "aborted refit left _next")
    // with the stream stopped, the re-run folds everything
    AnnIndex.refit(spark, dir, k = 8)
    val after = servedIds(dir)
    assert(after.size === corpus.count() + 4)
    assert(after.values.forall(_ == 1L), "post-abort refit double-served a row")
  }

  test("W3: append after the swap encodes against the new codebook, serves once") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val (dir, ckpt) = freshDirs()
    AnnIndex.build(corpus, dir, k = 8)
    AnnIndex.refit(spark, dir, k = 8)
    val vecs = newVecs(3000000L, 3)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val q = AnnIndex.appendStream(mem.toDF().toDF("id", "v"), dir, ckpt)
    try { mem.addData(vecs.toIndexedSeq: _*); q.processAllAvailable() }
    finally q.stop()
    val counts = servedIds(dir)
    vecs.foreach { case (id, _) =>
      assert(counts.get(id).contains(1L), s"appended $id served ${counts.get(id)} times")
    }
    // the streamed rows' cells must be the POST-refit codebook's
    // assignment — a stale-generation encode would prune-miss them
    val codebook = spark.read.parquet(s"$dir/codebook")
      .select("cid", "cv").orderBy("cid").collect().map(_.getSeq[Double](1).toArray)
    val got = AnnIndex.readIndex(spark, dir).filter(col("id") >= 3000000L)
      .select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    vecs.foreach { case (id, v) =>
      val expect = spark.createDataset(Seq(v)).toDF("v")
        .select(graft.ops.Similarity.nearestCell(col("v"), codebook).as("c"))
        .head().getLong(0)
      assert(got(id) === expect, s"append $id cell ${got(id)} != new-gen $expect")
    }
  }

  test("crash matrix with a live stream region: every crash point serves appends once") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val (dir, ckpt) = freshDirs()
    AnnIndex.build(corpus, dir, k = 8)
    val vecs = newVecs(4000000L, 3)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val q = AnnIndex.appendStream(mem.toDF().toDF("id", "v"), dir, ckpt)
    try { mem.addData(vecs.toIndexedSeq: _*); q.processAllAvailable() }
    finally q.stop()
    val want = corpus.count() + 3
    for (crashAt <- 1 to 3) {
      intercept[graft.sources.AtomicSwap.CrashPoint] {
        AnnIndex.refit(spark, dir, k = 8, crashAfter = crashAt)
      }
      val counts = servedIds(dir)
      assert(counts.size === want, s"crash at $crashAt: lost/duplicated rows")
      assert(counts.values.forall(_ == 1L), s"crash at $crashAt: double-serve")
      vecs.foreach { case (id, _) =>
        assert(counts.contains(id), s"crash at $crashAt: append $id vanished")
      }
      AnnIndex.refit(spark, dir, k = 8) // converge before the next injection
      assert(servedIds(dir).size === want)
    }
  }
}
