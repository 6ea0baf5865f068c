package graft

import org.apache.spark.sql.functions._

/** q_graph_search semantics (exact values oracle-pinned; this pins the
  * METHOD: recall vs exact, beam/degree bounds, determinism). */
class GraphSearchSpec extends SparkSpec {

  private def exactTopK(rows: Array[(Long, Array[Double])], probes: Set[Long],
                        k: Int): Map[Long, Set[Long]] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.filter(r => probes(r._1)).map { case (id, v) =>
      id -> rows.filter(_._1 != id)
        .map { case (j, u) => (j, cos(v, u)) }
        .sortBy { case (j, c) => (-c, j) }.take(k).map(_._1).toSet
    }.toMap
  }

  test("beam search over the kNN graph reaches recall >= 0.8 vs exact top-5") {
    val rows = sources.Tables.embeddings(spark, TinyDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val want = exactTopK(rows, rows.map(_._1).filter(_ < 10).toSet, 5)
    val got = SparkEntry.queries("q_graph_search")(spark, TinyDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    assert(got.keySet == want.keySet, "every probe must return results")
    val hits = want.toSeq.map { case (q, w) => (got(q) & w).size }.sum
    val total = want.values.map(_.size).sum
    val recall = hits.toDouble / total
    assert(recall >= 0.8, s"recall $recall < 0.8 ($hits/$total)")
  }

  test("per query: at most topK results, ranks contiguous from 1, cos non-increasing, no self") {
    val out = SparkEntry.queries("q_graph_search")(spark, TinyDir).collect()
    out.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.forall(_.getLong(1) != q), s"query $q returned itself")
      val byRank = rs.sortBy(r => (r.getLong(3), r.getLong(1)))
      assert(byRank.head.getLong(3) == 1L, s"query $q ranks must start at 1")
      val sims = byRank.map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"query $q cosine not non-increasing")
    }
  }

  test("rerun-stable (deterministic entries, beam tie-breaks, graph)") {
    val a = SparkEntry.queries("q_graph_search")(spark, TinyDir).collect().toSeq
    val b = SparkEntry.queries("q_graph_search")(spark, TinyDir).collect().toSeq
    assert(a == b)
  }

  test("adversarial plant: low ids share one cluster, probes sit in another — recall holds (VERDICT r12 #6)") {
    // 4 well-separated clusters of 16 nodes in CONTIGUOUS id blocks:
    // ids 0-15 are all cluster 0, so the retired lowest-id entry rule
    // started every walk inside cluster 0 and — the clusters being
    // separated, the kNN graph having no cross-cluster edges — could
    // never reach a cluster-3 probe. The degree-greedy, neighborhood-
    // excluded entries must land in distinct regions and keep recall.
    import spark.implicits._
    val corpus = (for (c <- 0 until 4; j <- 0 until 16) yield {
      val v = Array.fill(8)(0.0); v(c * 2) = 10.0; v(7) = 0.05 * (j + 1)
      ((c * 16 + j).toLong, v.toSeq)
    }).toDF("vec_id", "v")
    val graph = graft.ops.PipelineOps4
      .nnDescentGraph(corpus, 14, 2)
      .select(col("src_id").as("gsrc"), col("dst_id").as("gdst"))
      .localCheckpoint(true)
    val entries = graft.ops.PipelineOps4.pickEntries(graph, 4)
    val entryClusters = entries.select("node").collect()
      .map(_.getLong(0) / 16).toSet
    assert(entryClusters.size >= 3,
      s"greedy exclusion must spread entries across clusters, got $entryClusters")
    // probes: one per cluster INCLUDING the far cluster 3
    val probes = (0 until 4).map { c =>
      val v = Array.fill(8)(0.0); v(c * 2) = 10.0
      (9000L + c, v.toSeq)
    }.toDF("query_id", "qv")
    val got = graft.ops.PipelineOps4.searchWith(
        graph, corpus.select(col("vec_id").as("node"), col("v").as("nv")),
        probes, entries, beam = 8, hops = 3, topK = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    (0 until 4).foreach { c =>
      val want = (c * 16 until c * 16 + 16).map(_.toLong).toSet
      val hits = (got.getOrElse(9000L + c, Set.empty[Long]) & want).size
      assert(hits >= 4, // recall >= 0.8 of top-5
        s"cluster-$c probe found only $hits/5 in-cluster neighbors " +
          s"(got ${got.getOrElse(9000L + c, Set.empty[Long])})")
    }
  }
}
