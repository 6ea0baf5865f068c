package graft.ops

import graft.Q
import graft.functions.Exact._
import graft.functions.{VecSumAgg, VectorFunctions}
import graft.sources.{Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-space QC over the labeled corpus (SURVEY.md §2.4): the
  * audits an embedding release runs before anything trains on it.
  *
  * Both queries are one-scan shapes: per-group centroids come from the
  * mergeable integer-scaled [[VecSumAgg]] (D+1 longs per group — nothing
  * vector-sized shuffles, bit-exact under any partition order), and the
  * second pass joins the model-sized centroid table back broadcast.
  */
object EmbedQC {

  private val Dim = 64

  /** Per-label centroid audit: cluster size, cohesion (mean cosine of
    * members to their own centroid), and the nearest OTHER label with its
    * centroid-cosine — the class-overlap / label-noise signal (two labels
    * whose centroids cosine ≈ cohesion are not separable clusters).
    * Centroids are exact: integer-scaled long sums (agg_vecsum) divided
    * once, so every downstream double is deterministic cross-engine. */
  val qLabelCentroid: Q = Q(
    "q_label_centroid",
    s"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT label, i, SUM(CAST(round(v[i]*1000000) AS BIGINT)) AS sx, COUNT(*) AS n
      |      FROM e, UNNEST(generate_series(1, len(v))) AS t(i) GROUP BY label, i),
      |c AS (SELECT label, MAX(n) AS n_vecs,
      |        list(CAST(sx AS DOUBLE) / (1000000.0 * CAST(n AS DOUBLE)) ORDER BY i) AS cent
      |      FROM s GROUP BY label),
      |coh AS (SELECT e.label,
      |        SUM(CAST(round(list_inner_product(e.v, c.cent)
      |          / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(c.cent, c.cent))), 6)
      |          AS DECIMAL(18,6))) AS cohsum
      |      FROM e JOIN c USING (label) GROUP BY e.label),
      |x AS (SELECT a.label AS label, b.label AS lb,
      |        round(list_inner_product(a.cent, b.cent)
      |          / (sqrt(list_inner_product(a.cent, a.cent)) * sqrt(list_inner_product(b.cent, b.cent))), 6) AS cc
      |      FROM c a JOIN c b ON a.label <> b.label),
      |near AS (SELECT label, lb, cc,
      |        ROW_NUMBER() OVER (PARTITION BY label ORDER BY cc DESC, lb) AS rn FROM x)
      |SELECT c.label, CAST(c.n_vecs AS BIGINT) AS n_vecs,
      |  round(CAST(coh.cohsum AS DOUBLE) / CAST(c.n_vecs AS DOUBLE), 6) AS cohesion,
      |  near.lb AS nearest_label, near.cc AS separation
      |FROM c JOIN coh USING (label) JOIN near USING (label)
      |WHERE near.rn = 1 ORDER BY c.label""".stripMargin) { (s, d) =>
    val e = T.embeddings(s, d)
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
    val cents = e.groupBy("label").agg(VecSumAgg(col("v"), Dim).as("m"))
      .select(col("label"), element_at(col("m"), 1).as("n_vecs"),
        transform(slice(col("m"), 2, Dim),
          x => dbl(x) / (lit(1000000.0) * dbl(element_at(col("m"), 1)))).as("cent"))
    val coh = e.join(broadcast(cents), "label")
      .select(col("label"),
        round(VectorFunctions.cosineSim(col("v"), col("cent")), 6).as("cos"))
      .groupBy("label").agg(sum(col("cos").cast(DecimalType(18, 6))).as("cohsum"))
    val wNear = Window.partitionBy("label").orderBy(col("cc").desc, col("lb"))
    val near = cents.select(col("label"), col("cent"))
      .join(broadcast(cents.select(col("label").as("lb"), col("cent").as("cb"))),
        col("label") =!= col("lb"))
      .select(col("label"), col("lb"),
        round(VectorFunctions.cosineSim(col("cent"), col("cb")), 6).as("cc"))
      .withColumn("rn", row_number().over(wNear))
      .filter(col("rn") === 1)
    cents.select(col("label"), col("n_vecs"))
      .join(coh, "label")
      .join(near.select(col("label"), col("lb"), col("cc")), "label")
      .select(col("label"), col("n_vecs"),
        round(dbl(col("cohsum")) / dbl(col("n_vecs")), 6).as("cohesion"),
        col("lb").as("nearest_label"), col("cc").as("separation"))
      .orderBy("label")
  }

  /** Embedding sanity audit: per label, the malformed-vector counts every
    * release gate checks (wrong dim, zero norm, NaN/Inf components) plus
    * the norm envelope (min/avg/max). Pure one-pass aggregation — at
    * 100 TB this is a single scan with map-side partials. */
  val qEmbedSanity: Q = Q(
    "q_embed_sanity",
    s"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT label, len(v) AS dim,
      |        CASE WHEN len(list_filter(v, x -> NOT isfinite(x))) > 0 THEN 1 ELSE 0 END AS bad,
      |        round(sqrt(list_inner_product(v, v)), 6) AS nrm
      |      FROM e)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(SUM(CASE WHEN dim <> $Dim THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_dim,
      |  CAST(SUM(bad) AS BIGINT) AS n_nonfinite,
      |  CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      |  MIN(nrm) AS min_norm,
      |  round(CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_norm,
      |  MAX(nrm) AS max_norm
      |FROM n GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
    val inf = lit(Double.PositiveInfinity)
    val n = T.embeddings(s, d)
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .select(col("label"), size(col("v")).as("dim"),
        when(exists(col("v"), x => isnan(x) || abs(x) === inf), 1).otherwise(0).as("bad"),
        round(sqrt(VectorFunctions.dotProduct(col("v"), col("v"))), 6).as("nrm"))
    n.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        lng(sum(when(col("dim") =!= Dim, 1).otherwise(0))).as("n_wrong_dim"),
        lng(sum(col("bad"))).as("n_nonfinite"),
        lng(sum(when(col("nrm") === 0, 1).otherwise(0))).as("n_zero"),
        min(col("nrm")).as("min_norm"),
        round(dbl(sum(col("nrm").cast(DecimalType(18, 6)))) / dbl(count(lit(1))), 6).as("avg_norm"),
        max(col("nrm")).as("max_norm"))
      .orderBy("label")
  }

  /** Mahalanobis outlier screen over the embedding corpus: ONE mergeable
    * Gramian pass ([[graft.functions.GramianAgg]], a ~17 KB moment
    * buffer) gives mean + covariance; the driver factors Σ + λI = L·Lᵀ
    * and broadcasts the whitening matrix A = L⁻¹ (model-sized, D×D);
    * a second map-side scan scores d²(x) = ‖A(x−μ)‖² per row with
    * builtin array HOFs (no Scala UDF in the corpus path). Unlike the
    * norm/duplicate checks of q_embed_sanity, Mahalanobis is
    * correlation-aware — a vector can have an ordinary norm yet sit far
    * outside the data ellipsoid. Top-20 by distance, ties to lowest id.
    * Rows-only: the 64×64 factorization isn't SQL-portable; the spec
    * plants an off-ellipsoid outlier with an ORDINARY norm and requires
    * it to rank first. */
  val qEmbedOutliers: Q = Q.rowsOnly("q_embed_outliers") { (s, d) =>
    import graft.functions.GramianAgg
    val vecs = T.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val dim = vecs.select(size(col("v"))).head.getInt(0)
    val moments = vecs.agg(GramianAgg(col("v"), dim).as("m"))
      .head.getSeq[Double](0).toArray
    val (mean, cov) = GramianAgg.covariance(moments, dim)
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val white = GramianAgg.triInverse(
      GramianAgg.cholesky(cov, ridge = 1e-9 * trace / dim + 1e-12))
    val muLit = lit(mean.toSeq.toArray)
    val aLit = lit(white.flatten) // row-major D*D
    val dimL = lit(dim)
    // xc = x - mu; z_i = Σ_j A[i*D+j]·xc_j; d2 = Σ_i z_i²  (all builtin HOFs)
    val xc = zip_with(col("v"), muLit, (x, m) => x - m)
    val d2 = aggregate(
      transform(sequence(lit(0), dimL - 1), i =>
        aggregate(
          zip_with(slice(aLit, i * dimL + 1, dimL), col("__xc"), (a, c) => a * c),
          lit(0.0), _ + _)),
      lit(0.0), (acc, z) => acc + z * z)
    vecs
      .withColumn("__xc", xc)
      .withColumn("maha2", round(d2, 6))
      .select(col("vec_id"), col("label"), col("maha2"))
      .orderBy(col("maha2").desc, col("vec_id"))
      .limit(20)
  }

  val all: Seq[Q] = Seq(qLabelCentroid, qEmbedSanity, qEmbedOutliers)
}
