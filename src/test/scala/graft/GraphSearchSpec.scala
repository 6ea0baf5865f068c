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
}
