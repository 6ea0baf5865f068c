package graft.ops

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2.4).
  *
  * Baseline: brute-force cosine top-k — the query side is tiny and
  * broadcast, so the plan is a broadcast-nested-loop against the corpus
  * scan with no corpus shuffle: exactly what you want when scoring a small
  * probe set against 100 TB of vectors. The r2 scale path buckets the
  * corpus with seeded random-hyperplane LSH so candidate generation is a
  * hash join instead of a full scan per query.
  */
object Similarity {

  /** Corpus with double vectors and precomputed norms. */
  def withNorms(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _)))

  /** Brute-force cosine top-k: probe ids < 10 against the full corpus. */
  val qAnnTopk: Q = Q(
    "q_ann_topk",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |  n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
      |  scored AS (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      round(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos
      |    FROM n q JOIN n c ON q.vec_id <> c.vec_id
      |    WHERE q.vec_id < 10)
      |SELECT query_id, neighbor_id, cos, rnk FROM (
      |  SELECT *, RANK() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
      |  FROM scored)
      |WHERE rnk <= 5 ORDER BY query_id, rnk, neighbor_id""".stripMargin) { (s, d) =>
    val corpus = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = corpus.select(col("vec_id").as("neighbor_id"), col("v").as("cv"))
      .join(broadcast(probes), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(graft.functions.VectorFunctions.cosineSim(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", lng(rank().over(w)))
      .filter(col("rnk") <= 5)
      .select("query_id", "neighbor_id", "cos", "rnk")
      .orderBy("query_id", "rnk", "neighbor_id")
  }

  val all: Seq[Q] = Seq(qAnnTopk)
}
