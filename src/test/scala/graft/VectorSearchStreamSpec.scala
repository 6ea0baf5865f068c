package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** stream_vector_search: the frozen-index SERVING twin of the vector
  * store (compositionality + append visibility through FrozenSides). */
class VectorSearchStreamSpec extends SparkSpec {

  test("streamed query batches == one-shot; an appended vector is visible to the next batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.streaming.FrozenSides.clear()
    val root = java.nio.file.Files.createTempDirectory("graft_vsearch").toString

    // 4 well-separated clusters of 12 vectors in 8 dims
    val corpus = (for (c <- 0 until 4; j <- 0 until 12) yield {
      val v = Array.fill(8)(0.0)
      v(c * 2) = 10.0
      v(7) = 0.05 * (j + 1)
      ((c * 12 + j).toLong, v.toSeq)
    }).toDF("id", "v")
    graft.sources.AnnIndex.build(corpus, s"$root/idx", k = 8, pqM = 4, pqK = 8)

    val probes = (0 until 4).map { c =>
      val v = Array.fill(8)(0.0)
      v(c * 2) = 10.0
      (1000L + c, v.toSeq)
    }
    val oneShot = graft.sources.AnnIndex.query(spark,
        s"$root/idx", probes.toDF("query_id", "qv"), nProbe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    val mem = MemoryStream[(Long, Seq[Double])]
    val out = s"$root/out"
    val q = graft.streaming.StreamingOps.vectorSearchSink(
        mem.toDF().toDF("query_id", "qv"), s"$root/idx", out, nProbe = 2, topK = 5)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData(probes.take(2).toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(probes.drop(2).toIndexedSeq: _*); q.processAllAvailable()

      val streamed = spark.read.parquet(out)
        .select("query_id", "neighbor_id", "cos", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(streamed == oneShot,
        s"missing=${(oneShot -- streamed).take(3)} extra=${(streamed -- oneShot).take(3)}")
      assert(oneShot.nonEmpty)

      // a streamed APPEND lands under the same root: the serving cache's
      // identity (stream-dir mtime) must pick it up on the next batch
      val vNew = { val v = Array.fill(8)(0.0); v(0) = 10.0; v.toSeq }
      val memApp = MemoryStream[(Long, Seq[Double])]
      val qa = graft.sources.AnnIndex.appendStream(
        memApp.toDF().toDF("id", "v"), s"$root/idx", s"$root/appckpt")
      try {
        memApp.addData((9999L, vNew)); qa.processAllAvailable()
        mem.addData((2000L, probes.head._2)); q.processAllAvailable()
        val after = spark.read.parquet(out).filter(col("query_id") === 2000L)
          .orderBy("rnk", "neighbor_id").collect()
        assert(after.nonEmpty)
        assert(after.head.getLong(1) == 9999L,
          s"appended exact-match vector must rank first, got ${after.head.getLong(1)}")

        // STEADY-STATE append (ADVICE r11 high): this second batch lands
        // INSIDE the already-created cell=… dirs, so the index_stream
        // dir's own mtime does not move — only the _spark_metadata
        // commit identity does. It must still invalidate the serving
        // cache and be visible on the next serving batch.
        val vNew2 = { val v = Array.fill(8)(0.0); v(0) = 10.0; v(1) = 0.01; v.toSeq }
        memApp.addData((9998L, vNew2)); qa.processAllAvailable()
        mem.addData((2001L, probes.head._2)); q.processAllAvailable()
        val after2 = spark.read.parquet(out).filter(col("query_id") === 2001L)
          .orderBy("rnk", "neighbor_id").collect()
        assert(after2.nonEmpty)
        assert(after2.take(2).map(_.getLong(1)).toSet == Set(9999L, 9998L),
          s"steady-state appended vector must be served, got " +
            after2.take(3).map(_.getLong(1)).mkString(","))
      } finally qa.stop()
    } finally q.stop()
  }
}
