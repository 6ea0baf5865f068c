package graft

import org.apache.spark.sql.functions._

/** q_nn_descent semantics (exact values oracle-pinned; this pins the
  * METHOD: convergence toward the true graph, degree, determinism). */
class NnDescentSpec extends SparkSpec {

  /** Brute-force exact top-k cosine neighbors, driver-side. */
  private def exactTopK(rows: Array[(Long, Array[Double])], k: Int): Map[Long, Set[Long]] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.map { case (id, v) =>
      id -> rows.filter(_._1 != id)
        .map { case (j, u) => (j, cos(v, u)) }
        .sortBy { case (j, c) => (-c, j) }.take(k).map(_._1).toSet
    }.toMap
  }

  test("2 rounds at k=14 recover most exact neighbors even on isotropic data (recall >= 0.85)") {
    val vecs = sources.Tables.embeddings(spark, TinyDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val rows = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray)
    val want = exactTopK(rows, 14)
    val got = SparkEntry.queries("q_nn_descent")(spark, TinyDir).collect()
      .groupBy(_.getLong(0)).map { case (s0, rs) => s0 -> rs.map(_.getLong(2)).toSet }
    assert(got.keySet == want.keySet, "every node must have a neighbor list")
    val hits = want.toSeq.map { case (id, w) => (got(id) & w).size }.sum
    val total = want.values.map(_.size).sum
    val recall = hits.toDouble / total
    assert(recall >= 0.85, s"recall $recall < 0.85 after 2 rounds ($hits/$total)")
  }

  test("planted clustered corpus: the graph is exactly the in-cluster brute-force graph") {
    import spark.implicits._
    // 4 well-separated clusters of 12 vectors in 8 dims; distinct
    // in-cluster similarities (varying off-axis component) so the exact
    // top-k is unambiguous
    val data = for (c <- 0 until 4; j <- 0 until 16) yield {
      val v = Array.fill(8)(0.0f)
      v(c * 2) = 10.0f
      v(7) = 0.05f * (j + 1) * (if (c % 2 == 0) 1 else -1)
      ((c * 16 + j).toLong, v, c)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_nnd").toString
    data.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = data.map { case (id, v, _) => id -> v.map(_.toDouble) }.toArray
    val want = exactTopK(rows, 14)
    val out = SparkEntry.queries("q_nn_descent")(spark, dir).collect()
    val got = out.groupBy(_.getLong(0)).map { case (s0, rs) => s0 -> rs.map(_.getLong(2)).toSet }
    assert(got == want, "planted-cluster graph must equal the exact graph")
    // and every recovered neighbor is in the same cluster
    out.foreach { r =>
      assert(r.getLong(0) / 16 == r.getLong(2) / 16,
        s"edge ${r.getLong(0)} -> ${r.getLong(2)} crosses clusters")
    }
  }

  test("degree is exactly k, ranks are 1..k, similarity non-increasing in rank") {
    val out = SparkEntry.queries("q_nn_descent")(spark, TinyDir).collect()
    out.groupBy(_.getLong(0)).foreach { case (s0, rs) =>
      assert(rs.length == 14, s"node $s0 has degree ${rs.length} != 14")
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to 14), s"node $s0 ranks not 1..14")
      val sims = byRank.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"node $s0 similarities not non-increasing: ${sims.mkString(",")}")
    }
  }

  test("planted hub: |B(p)| <= 2k and candidate volume <= n*(2k)^2 despite 10k in-degree") {
    import spark.implicits._
    val k = 14
    val n = 10050L
    // node 0 is a hub: nodes 1..10000 all list it as a neighbor (the
    // exact-duplicate-cluster shape); each node also carries k-1
    // ordinary edges so out-degree is realistic
    val hub = (1L until 10001L).map(i => (i, 0L))
    val rest = for (i <- 0L until n; m <- 1 until k) yield (i, (i + m * 7 + 1) % n)
    val edges = (hub ++ rest).filter { case (s, d) => s != d }
      .toDF("src", "dst").distinct()
    val bp = ops.PipelineOps4.boundedNeighborSets(edges, k)
    val sizes = bp.select(size(col("bp")).as("sz"))
    val maxB = sizes.agg(max(col("sz"))).head.getInt(0)
    assert(maxB <= 2 * k, s"max |B(p)| = $maxB exceeds 2k = ${2 * k}")
    // candidate volume of the local join = sum |B(p)|^2
    val cand = sizes.agg(sum(col("sz").cast("long") * col("sz"))).head.getLong(0)
    assert(cand <= n * (2 * k) * (2 * k),
      s"candidate volume $cand exceeds n*(2k)^2 = ${n * 4 * k * k}")
    // and the rho-sample is deterministic: same sets on rerun
    val again = ops.PipelineOps4.boundedNeighborSets(edges, k)
      .select(col("src"), array_sort(col("bp")).as("bp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val first = bp.select(col("src"), array_sort(col("bp")).as("bp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again == first, "rho-sample must be rerun-stable")
  }

  test("rerun-stable (deterministic init and tie-breaks)") {
    val a = SparkEntry.queries("q_nn_descent")(spark, TinyDir).collect().toSeq
    val b = SparkEntry.queries("q_nn_descent")(spark, TinyDir).collect().toSeq
    assert(a == b)
  }
}
