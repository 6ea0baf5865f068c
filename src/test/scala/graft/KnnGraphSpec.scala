package graft

import graft.ops.{PipelineOps3, Similarity}
import org.apache.spark.sql.functions._

/** Semantics the DuckDB hash can't express for q_knn_graph and
  * q_epoch_shuffle: brute-force agreement, permutation laws, and
  * partition invariance. */
class KnnGraphSpec extends SparkSpec {

  test("knn graph matches brute-force top-4 per node; mutual flag is symmetric membership") {
    val vecs = graft.sources.Tables.embeddings(spark, TinyDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val topk: Map[Long, Seq[(Long, Double, Long)]] = vecs.keys.map { n =>
      n -> vecs.keys.filter(_ != n)
        .map(m => (m, cos(vecs(n), vecs(m)))).toSeq
        .sortBy { case (m, c) => (-c, m) }.take(4).zipWithIndex
        .map { case ((m, c), i) => (m, c, i + 1L) }
    }.toMap
    val expectedEdges = topk.flatMap { case (n, ms) => ms.map(t => (n, t._1, t._2, t._3)) }.toSet
    val got = Similarity.qKnnGraph.fn(spark, TinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSet == expectedEdges)
    // mutual(n, m) iff m lists n among ITS top-4 too
    got.foreach { case (n, m, _, _, mutual) =>
      assert(mutual == topk(m).exists(_._1 == n), s"mutual flag wrong for ($n,$m)")
    }
    // exactly k edges per node (corpus is larger than k)
    got.groupBy(_._1).foreach { case (n, es) => assert(es.length == 4, s"node $n") }
  }

  test("candidate-sourced knn graph: valid structure, exact-cosine edges, high-cos recall") {
    val emb = graft.sources.Tables.embeddings(spark, TinyDir)
    val exact = Similarity.qKnnGraph.fn(spark, TinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val got = Similarity.knnGraphFromCandidates(emb, "vec_id", "embedding", 4,
        Similarity.lshCandidatePairs(emb, "vec_id", "embedding", bands = 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // structure: <= k edges per node, contiguous ranks, cosines exact
    val exactCos = exact.map(t => (t._1, t._2) -> t._3).toMap
    got.groupBy(_._1).foreach { case (n, es) =>
      assert(es.length <= 4)
      assert(es.map(_._4).sorted.toSeq == (1L to es.length).toSeq, s"ranks at $n")
    }
    // every emitted edge in the exact graph's pair universe carries the
    // same exact cosine (candidates+verify never distorts scores)
    got.foreach { case (n, m, c, _) =>
      exactCos.get((n, m)).foreach(ec => assert(ec == c, s"cos mismatch ($n,$m)"))
    }
    // recall on the high-similarity edges (the near-dup signal the graph
    // exists for): 8x8-bit hyperplane banding keeps those
    val high = exact.filter(_._3 >= 0.8).map(t => (t._1, t._2)).toSet
    val gotEdges = got.map(t => (t._1, t._2)).toSet
    val hit = high.intersect(gotEdges).size.toDouble
    assert(high.isEmpty || hit / high.size >= 0.6,
      s"high-cos knn recall too low: $hit/${high.size}")
  }

  test("epoch shuffle: each epoch is a permutation of 0..n-1 and epochs disagree") {
    val out = PipelineOps3.qEpochShuffle.fn(spark, TinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.sources.Tables.documents(spark, TinyDir).count()
    for (ep <- Seq(0L, 1L)) {
      val rows = out.filter(_._1 == ep)
      assert(rows.length == nDocs.toInt)
      // positions are exactly 0..n-1 (a permutation, no gap/dup)
      assert(rows.map(_._3).sorted.toSeq == (0L until nDocs).toSeq)
      // shard is the fixed 64-cut of position
      rows.foreach { case (_, _, pos, shard) => assert(shard == pos / 64) }
    }
    // the two epochs order the corpus differently (that is the point)
    val p0 = out.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    val p1 = out.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    assert(p0.exists { case (doc, pos) => p1(doc) != pos })
  }
}
