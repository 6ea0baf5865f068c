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
    *
    * Fully oracled (r10): DuckDB computes the SAME Mahalanobis d² from
    * Σᵣ⁻¹ assembled column-by-column via 64 INDEPENDENT conjugate-
    * gradient solves (one per basis vector — independent recursive CTEs
    * don't chain, so the binder depth limit that forbids 100 chained
    * CTEs doesn't apply), where the engine side whitens through the
    * Cholesky factor. Algebraically identical; numerically within κ·ε
    * of each other at this covariance's tiny condition number, which the
    * 6dp rounding absorbs — again two independent algorithms agreeing
    * rather than a replay. The spec still plants an off-ellipsoid
    * outlier with an ORDINARY norm and requires it to rank first. */
  private def mahaOracleSql(dim: Int = 64, cgIters: Int = 128): String = {
    val head =
      s"""WITH RECURSIVE e AS MATERIALIZED (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |pos AS (SELECT unnest(range(1, $dim + 1)) AS i),
         |el AS (SELECT e.vec_id, pos.i, e.v[pos.i] AS x FROM e, pos),
         |mn AS (SELECT i, AVG(x) AS m FROM el GROUP BY i),
         |cp AS (SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) / (SELECT COUNT(*) FROM e) AS sxy
         |       FROM el a JOIN el b ON a.vec_id = b.vec_id GROUP BY 1, 2),
         |cov AS (SELECT cp.i AS i, cp.j AS j, cp.sxy - ma.m * mb.m AS c
         |        FROM cp JOIN mn ma ON ma.i = cp.i JOIN mn mb ON mb.i = cp.j),
         |rg AS (SELECT 1e-9 * SUM(c) / $dim + 1e-12 AS ridge FROM cov WHERE i = j),
         |arows AS (SELECT i, list(c + CASE WHEN i = j THEN (SELECT ridge FROM rg) ELSE 0.0 END ORDER BY j) AS row
         |          FROM cov GROUP BY i),
         |amat AS MATERIALIZED (SELECT list(row ORDER BY i) AS m FROM arows),
         |mx AS MATERIALIZED (SELECT list(m ORDER BY i) AS mv FROM mn),
         |""".stripMargin
    val cols = (1 to dim).map { c =>
      s"""cgc$c(k, x, r, p) AS (
         |  SELECT 0, list_transform(range(1, $dim + 1), q -> CAST(0.0 AS DOUBLE)),
         |    list_transform(range(1, $dim + 1), q -> CASE WHEN q = $c THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END),
         |    list_transform(range(1, $dim + 1), q -> CASE WHEN q = $c THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END)
         |  UNION ALL
         |  SELECT k + 1,
         |    CASE WHEN s.rr = 0 THEN s.x
         |         ELSE list_transform(range(1, $dim + 1), q -> s.x[q] + s.rr / s.pap * s.p[q]) END,
         |    CASE WHEN s.rr = 0 THEN s.r
         |         ELSE list_transform(range(1, $dim + 1), q -> s.r[q] - s.rr / s.pap * s.ap[q]) END,
         |    CASE WHEN s.rr = 0 THEN s.p
         |         ELSE list_transform(range(1, $dim + 1), q ->
         |           (s.r[q] - s.rr / s.pap * s.ap[q]) +
         |           (list_inner_product(
         |              list_transform(range(1, $dim + 1), t2 -> s.r[t2] - s.rr / s.pap * s.ap[t2]),
         |              list_transform(range(1, $dim + 1), t2 -> s.r[t2] - s.rr / s.pap * s.ap[t2]))
         |            / s.rr) * s.p[q]) END
         |  FROM (SELECT cgc$c.k AS k, cgc$c.x AS x, cgc$c.r AS r, cgc$c.p AS p,
         |          list_inner_product(cgc$c.r, cgc$c.r) AS rr,
         |          list_transform(range(1, $dim + 1),
         |            q -> list_inner_product(amat.m[q], cgc$c.p)) AS ap,
         |          list_inner_product(cgc$c.p,
         |            list_transform(range(1, $dim + 1),
         |              q -> list_inner_product(amat.m[q], cgc$c.p))) AS pap
         |        FROM cgc$c, amat WHERE cgc$c.k < $cgIters) s),
         |mc$c AS MATERIALIZED (SELECT x FROM cgc$c WHERE k = $cgIters),
         |""".stripMargin
    }.mkString
    val minvList = (1 to dim).map(c => s"(SELECT x FROM mc$c)").mkString(", ")
    val tail =
      s"""minv AS MATERIALIZED (SELECT [$minvList] AS m),
         |scored AS (
         |  SELECT e.vec_id, e.label,
         |    list_inner_product(
         |      list_transform(range(1, $dim + 1), q -> e.v[q] - mx.mv[q]),
         |      list_transform(range(1, $dim + 1), q ->
         |        list_inner_product(minv.m[q],
         |          list_transform(range(1, $dim + 1), t2 -> e.v[t2] - mx.mv[t2])))) AS d2
         |  FROM e, mx, minv)
         |SELECT vec_id, label, round(d2, 6) AS maha2
         |FROM scored
         |ORDER BY round(d2, 6) DESC, vec_id
         |LIMIT 20""".stripMargin
    head + cols + tail
  }

  val qEmbedOutliers: Q = Q("q_embed_outliers", mahaOracleSql()) { (s, d) =>
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
