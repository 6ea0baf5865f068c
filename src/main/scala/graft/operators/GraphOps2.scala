package graft.operators

import graft.Q
import graft.sources.{Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-2 graph analytics (SURVEY.md §2.3 additions): PageRank-style
  * importance propagation and connected components. Reference analogs: the
  * pathway/PPI graph passes (loaders/load-KEGGDistances.py,
  * load-BioPlexPPIs.py) and TIN-X-style bipartite importance
  * (python/TIN-X.py) iterated to a stationary score.
  *
  * Determinism: ranks are integer-scaled (1.0 -> 10^12) so every
  * per-iteration sum is an exact long reduction — order-independent, no
  * float drift between engines or partitionings. Damping 0.85 is the
  * integer computation (85 * s) div 100.
  */
object GraphOps2 {

  val PrScale: Long = 1000000000000L // rank 1.0
  val PrTeleport: Long = 150000000000L // 0.15

  /** Fixed-iteration integer PageRank over a directed edge list where every
    * node has outdegree >= 1 (symmetric graphs qualify). One shuffle per
    * iteration (the dst aggregation); the degree join reuses the edge
    * partitioning. At cluster scale: edges hash-partitioned by src once,
    * ranks co-partitioned, iterations reuse the same exchange. */
  def pagerankInt(edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val e = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    var pr = deg.select(col("src").as("node"), lit(PrScale).as("pr"))
    for (_ <- 1 to iters) {
      pr = e.join(pr, col("src") === col("node"))
        .select(col("dst"), expr("pr div d").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"),
          (lit(PrTeleport) + expr("(85 * s) div 100")).as("pr"))
    }
    pr
  }

  /** PageRank over the bipartite part<->supplier incidence graph — the
    * quadratic co-supply projection is never materialized (same trick as
    * coSupplyBfs); the graph is the distinct (part, supplier) list in both
    * directions. Oracle = the same three iterations unrolled in SQL. */
  val qPagerank: Q = Q(
    "q_pagerank",
    """WITH e AS (
      |  SELECT 'p:' || CAST(l_partkey AS VARCHAR) AS src,
      |         's:' || CAST(l_suppkey AS VARCHAR) AS dst
      |  FROM lineitem GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 's:' || CAST(l_suppkey AS VARCHAR),
      |         'p:' || CAST(l_partkey AS VARCHAR)
      |  FROM lineitem GROUP BY 1, 2),
      |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
      |p0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS pr FROM deg),
      |p1 AS (SELECT e.dst AS node, CAST(150000000000 + (85 * SUM(p0.pr // deg.d)) // 100 AS BIGINT) AS pr
      |       FROM e JOIN deg USING (src) JOIN p0 ON p0.node = e.src GROUP BY e.dst),
      |p2 AS (SELECT e.dst AS node, CAST(150000000000 + (85 * SUM(p1.pr // deg.d)) // 100 AS BIGINT) AS pr
      |       FROM e JOIN deg USING (src) JOIN p1 ON p1.node = e.src GROUP BY e.dst),
      |p3 AS (SELECT e.dst AS node, CAST(150000000000 + (85 * SUM(p2.pr // deg.d)) // 100 AS BIGINT) AS pr
      |       FROM e JOIN deg USING (src) JOIN p2 ON p2.node = e.src GROUP BY e.dst)
      |SELECT node, pr FROM p3 ORDER BY node""".stripMargin) { (s, d) =>
    val ps = T.lineitem(s, d)
      .select(concat(lit("p:"), col("l_partkey")).as("p"),
        concat(lit("s:"), col("l_suppkey")).as("sup"))
      .distinct()
    val edges = ps.select(col("p").as("src"), col("sup").as("dst"))
      .union(ps.select(col("sup").as("src"), col("p").as("dst")))
    pagerankInt(edges, 3).orderBy("node")
  }

  /** Min-label propagation connected components: labels start as node ids
    * and each round take the min over the neighborhood; converged when no
    * label changes (checked per round — at cluster scale you'd run
    * ceil(log2 diameter) fixed rounds of the pointer-doubling variant
    * instead). Edges must be symmetric. */
  def connectedComponents(edges: DataFrame, maxIters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var it = 0
    var changed = true
    while (changed && it < maxIters) {
      val nbrMin = e.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node2")).agg(min(col("lbl")).as("nlbl"))
      val next = labels.join(nbrMin, col("node") === col("node2"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.join(labels.withColumnRenamed("lbl", "old"), "node")
        .filter(col("lbl") =!= col("old")).limit(1).count() > 0
      labels = next
      it += 1
    }
    e.unpersist()
    labels
  }

  /** Near-duplicate clustering: connected components over the
    * embedding-cosine near-dup pair graph (Dedup.qDedupEmbed's edges) —
    * THE canonical corpus-dedup reduction: pick one survivor per component.
    * Docs in no pair are their own singleton cluster. */
  val qConnectedComponents: Q = Q(
    "q_connected_components",
    """WITH RECURSIVE ee AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |  n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM ee),
      |  pairs AS (
      |    SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |    FROM n a JOIN n b ON a.vec_id < b.vec_id
      |    WHERE round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.38),
      |  e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |        UNION SELECT id_b, id_a FROM pairs),
      |  reach(node, lbl) AS (
      |    SELECT DISTINCT src, src FROM e
      |    UNION
      |    SELECT e.dst, reach.lbl FROM reach JOIN e ON e.src = reach.node),
      |  comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
      |SELECT emb.vec_id, COALESCE(comp.component, emb.vec_id) AS component,
      |  COUNT(*) OVER (PARTITION BY COALESCE(comp.component, emb.vec_id)) AS cluster_size
      |FROM embeddings emb LEFT JOIN comp ON comp.node = emb.vec_id
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
    val pairs = a.join(b, col("id_a") < col("id_b"))
      .filter(round(graft.functions.VectorFunctions.cosineSim(col("va"), col("vb")), 6) >= 0.38)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = connectedComponents(pairs, 10)
    val w = Window.partitionBy("component")
    T.embeddings(s, d).select(col("vec_id"))
      .join(comp, col("vec_id") === col("node"), "left")
      .select(col("vec_id"), coalesce(col("lbl"), col("vec_id")).as("component"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .orderBy("vec_id")
  }

  val all: Seq[Q] = Seq(qPagerank, qConnectedComponents)
}
