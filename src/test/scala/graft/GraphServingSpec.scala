package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** sink_knn_graph + stream_graph_search: the persisted kNN-graph bundle
  * and its ingest-time serving twin (compositionality + refit pickup
  * through FrozenSides). */
class GraphServingSpec extends SparkSpec {

  private def cluster(c: Int, j: Int): Seq[Double] = {
    val v = Array.fill(8)(0.0)
    v(c * 2) = 10.0
    v(7) = 0.05 * (j + 1)
    v.toSeq
  }

  test("streamed query batches == one-shot bundle search; a refit is picked up next batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.streaming.FrozenSides.clear()
    val root = java.nio.file.Files.createTempDirectory("graft_gserve").toString

    // 4 well-separated clusters of 16 vectors in 8 dims
    val corpus = (for (c <- 0 until 4; j <- 0 until 16)
      yield ((c * 16 + j).toLong, cluster(c, j))).toDF("vec_id", "v")
    graft.sources.GraphBundle.build(corpus, s"$root/bundle", k = 6, rounds = 2)

    val probes = (0 until 4).map { c =>
      val v = Array.fill(8)(0.0); v(c * 2) = 10.0
      (1000L + c, v.toSeq)
    }
    val oneShot = graft.sources.GraphBundle.search(spark, s"$root/bundle",
        probes.toDF("query_id", "qv"), entries = 4, beam = 6, hops = 3, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(oneShot.nonEmpty)

    val mem = MemoryStream[(Long, Seq[Double])]
    val out = s"$root/out"
    val q = graft.streaming.StreamingOps.graphSearchSink(
        mem.toDF().toDF("query_id", "qv"), s"$root/bundle", out,
        entries = 4, beam = 6, hops = 3, topK = 5)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData(probes.take(2).toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(probes.drop(2).toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .select("query_id", "neighbor_id", "cos", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(streamed == oneShot,
        s"missing=${(oneShot -- streamed).take(3)} extra=${(streamed -- oneShot).take(3)}")

      // REFIT: republish the bundle with an extra exact-match vector —
      // the frozen sides must invalidate (dir identity) and the next
      // serving batch must rank the new vector first
      val vNew = { val v = Array.fill(8)(0.0); v(0) = 10.0; v.toSeq }
      val corpus2 = (corpus.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
        :+ (9999L, vNew)).toSeq.toDF("vec_id", "v")
      graft.sources.GraphBundle.build(corpus2, s"$root/bundle", k = 6, rounds = 2)
      mem.addData((2000L, probes.head._2)); q.processAllAvailable()
      val after = spark.read.parquet(out).filter(col("query_id") === 2000L)
        .orderBy("rnk", "neighbor_id").collect()
      assert(after.nonEmpty)
      assert(after.head.getLong(1) == 9999L,
        s"refit vector must rank first, got ${after.head.getLong(1)}")
    } finally q.stop()
  }

  test("bundle search agrees with the in-memory graphSearch on the bench corpus shape") {
    val vecs = sources.Tables.embeddings(spark, TinyDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val root = java.nio.file.Files.createTempDirectory("graft_gserve2").toString
    graft.sources.GraphBundle.build(vecs, s"$root/bundle")
    val probes = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val viaBundle = graft.sources.GraphBundle.search(spark, s"$root/bundle", probes)
      .collect().toSeq
    val direct = SparkEntry.queries("q_graph_search")(spark, TinyDir).collect().toSeq
    assert(viaBundle == direct,
      "persisted-bundle search must equal the in-memory build+search")
  }
}
