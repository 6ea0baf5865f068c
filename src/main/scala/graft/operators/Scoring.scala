package graft.operators

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's domain scoring algorithms, re-expressed as declarative
  * Spark aggregation plans (SURVEY.md §2.3).
  *
  * Determinism notes: TIN-X-style reciprocal weights (1/n) are summed as
  * exact integers scaled by LCM(1..20)=232792560 — n is the per-group
  * cardinality and never exceeds 17 in this data — so the aggregate is
  * order-independent; the single division at the end is exact-input double
  * math. Tau sums its (at most 3) per-flag terms in a fixed expression
  * order via conditional aggregation rather than a row-order-dependent
  * SUM over doubles.
  */
object Scoring {

  /** LCM(1..20): every 1/n with n<=20 becomes an exact integer weight. */
  val RecipLcm = 232792560L

  /** Empirical CDF per group (loaders/load-HGramCDFs.py computes attr-count
    * CDFs per dataset): cume_dist of order-count within market segment. */
  val qCdf: Q = Q(
    "q_cdf",
    """SELECT c_custkey, c_mktsegment, cnt,
      |  round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY cnt), 6) AS cdf
      |FROM (SELECT c_custkey, c_mktsegment, COUNT(*) AS cnt
      |      FROM customer JOIN orders ON o_custkey = c_custkey
      |      GROUP BY c_custkey, c_mktsegment)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val counts = T.customer(s, d)
      .join(T.orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("c_mktsegment").orderBy("cnt")
    counts.withColumn("cdf", round(cume_dist().over(w), 6)).orderBy("c_custkey")
  }

  /** Consensus/mode aggregation with deterministic tie-break
    * (loaders/load-ConsensusExpressions.py calculate_consensus): the most
    * frequent order priority per customer, ties to the smallest value. */
  val qConsensusMode: Q = Q(
    "q_consensus_mode",
    """SELECT o_custkey, o_orderpriority AS consensus_priority, cnt FROM (
      |  SELECT o_custkey, o_orderpriority, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY cnt DESC, o_orderpriority) AS rn
      |  FROM (SELECT o_custkey, o_orderpriority, COUNT(*) AS cnt
      |        FROM orders GROUP BY 1, 2))
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val counts = T.orders(s, d)
      .groupBy("o_custkey", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("o_custkey").orderBy(col("cnt").desc, col("o_orderpriority"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderpriority").as("consensus_priority"), col("cnt"))
      .orderBy("o_custkey")
  }

  /** Tissue-specificity tau (R/hpa_tau.R, R/hpm_tau.R):
    * tau = sum_i(1 - x_i/max) / (n-1) over per-flag revenue "tissues".
    * Fixed 3-term expression keeps double addition order deterministic. */
  val qTau: Q = Q(
    "q_tau",
    """WITH x AS (
      |  SELECT l_suppkey,
      |    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS xa,
      |    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS xn,
      |    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS xr
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT l_suppkey,
      |  round(((1 - xa / greatest(xa, xn, xr)) + (1 - xn / greatest(xa, xn, xr)) + (1 - xr / greatest(xa, xn, xr))) / 2, 6) AS tau
      |FROM x ORDER BY l_suppkey""".stripMargin) { (s, d) =>
    def flagSum(f: String): Column =
      dbl(coalesce(sum(when(col("l_returnflag") === f, dec2(col("l_extendedprice")))), lit(0)))
    val x = T.lineitem(s, d).groupBy("l_suppkey")
      .agg(flagSum("A").as("xa"), flagSum("N").as("xn"), flagSum("R").as("xr"))
    val mx = greatest(col("xa"), col("xn"), col("xr"))
    x.select(col("l_suppkey"),
        round(((lit(1) - col("xa") / mx) + (lit(1) - col("xn") / mx) +
          (lit(1) - col("xr") / mx)) / 2, 6).as("tau"))
      .orderBy("l_suppkey")
  }

  /** Multiway rule classification (loaders/load-TDLs.py:90-160 assigns
    * Tclin/Tchem/Tbio/Tdark from activity evidence): customers classified
    * by order evidence, left joins keeping evidence-free rows (Tdark). */
  val qTdl: Q = Q(
    "q_tdl",
    """SELECT c_custkey,
      |  CASE WHEN max_price > 495000 THEN 'Tclin'
      |       WHEN n_orders >= 15 THEN 'Tchem'
      |       WHEN n_orders >= 1 THEN 'Tbio'
      |       ELSE 'Tdark' END AS tdl,
      |  n_orders, max_price
      |FROM (
      |  SELECT c_custkey,
      |    CAST(COALESCE(COUNT(o_orderkey), 0) AS BIGINT) AS n_orders,
      |    CAST(COALESCE(MAX(o_totalprice), 0) AS DOUBLE) AS max_price
      |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |  GROUP BY c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        lng(coalesce(count(col("o_orderkey")), lit(0))).as("n_orders"),
        dbl(coalesce(max(col("o_totalprice")), lit(0))).as("max_price"))
      .withColumn("tdl",
        when(col("max_price") > 495000, "Tclin")
          .when(col("n_orders") >= 15, "Tchem")
          .when(col("n_orders") >= 1, "Tbio")
          .otherwise("Tdark"))
      .select("c_custkey", "tdl", "n_orders", "max_price")
      .orderBy("c_custkey")
  }

  /** TIN-X novelty (python/TIN-X.py): novelty(target) = sum over
    * publications mentioning it of 1/|targets(pub)|. Here pub=order,
    * target=part. Exact integer weights via RecipLcm. */
  val qTinxNovelty: Q = Q(
    "q_tinx_novelty",
    """WITH mention AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |  pubsize AS (SELECT l_orderkey, COUNT(*) AS n FROM mention GROUP BY 1)
      |SELECT l_partkey,
      |  round(CAST(SUM(232792560 // n) AS DOUBLE) / 232792560, 6) AS novelty,
      |  COUNT(*) AS n_pubs
      |FROM mention JOIN pubsize USING (l_orderkey)
      |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin) { (s, d) =>
    val mention = T.lineitem(s, d).select("l_orderkey", "l_partkey").distinct()
    val pubsize = mention.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    mention.join(pubsize, "l_orderkey")
      .groupBy("l_partkey")
      .agg(
        round(dbl(sum(lit(RecipLcm) / col("n"))) / RecipLcm, 6).as("novelty"),
        count(lit(1)).as("n_pubs"))
      .orderBy("l_partkey")
  }

  /** TIN-X importance (python/TIN-X.py): importance(disease, target) =
    * sum over shared pubs of 1/(|targets(pub)|*|diseases(pub)|). Here
    * disease=customer (one per order), so the denominator is |parts|. */
  val qTinxImportance: Q = Q(
    "q_tinx_importance",
    """WITH mention AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |  pubsize AS (SELECT l_orderkey, COUNT(*) AS n FROM mention GROUP BY 1)
      |SELECT o_custkey, l_partkey,
      |  round(CAST(SUM(232792560 // n) AS DOUBLE) / 232792560, 6) AS importance,
      |  COUNT(*) AS n_shared_pubs
      |FROM mention
      |JOIN pubsize USING (l_orderkey)
      |JOIN orders ON o_orderkey = l_orderkey
      |GROUP BY o_custkey, l_partkey
      |ORDER BY o_custkey, l_partkey""".stripMargin) { (s, d) =>
    val mention = T.lineitem(s, d).select("l_orderkey", "l_partkey").distinct()
    val pubsize = mention.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    mention.join(pubsize, "l_orderkey")
      .join(T.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey", "l_partkey")
      .agg(
        round(dbl(sum(lit(RecipLcm) / col("n"))) / RecipLcm, 6).as("importance"),
        count(lit(1)).as("n_shared_pubs"))
      .orderBy("o_custkey", "l_partkey")
  }

  /** Weighted score per entity per year with running total
    * (loaders/load-JensenLabPubMedScores.py sums yearly scores and keeps a
    * cumulative per-protein total). Decimal window sum stays exact. */
  val qPubscore: Q = Q(
    "q_pubscore",
    """WITH yearly AS (
      |  SELECT l_suppkey, year(l_shipdate) AS yr,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS score_dec
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_suppkey, yr, CAST(score_dec AS DOUBLE) AS score,
      |  CAST(SUM(score_dec) OVER (PARTITION BY l_suppkey ORDER BY yr) AS DOUBLE) AS cum_score
      |FROM yearly ORDER BY l_suppkey, yr""".stripMargin) { (s, d) =>
    val yearly = T.lineitem(s, d)
      .groupBy(col("l_suppkey"), lng(year(col("l_shipdate"))).as("yr"))
      .agg(sum(discPrice(col("l_quantity"), col("l_discount"))).as("score_dec"))
    val w = Window.partitionBy("l_suppkey").orderBy("yr")
    yearly.select(col("l_suppkey"), col("yr"),
        dbl(col("score_dec")).as("score"),
        dbl(sum(col("score_dec")).over(w)).as("cum_score"))
      .orderBy("l_suppkey", "yr")
  }

  /** Parametric (Gaussian-ish) CDF, the reference's actual HGram formula:
    * loaders/load-HGramCDFs.py fits mean/std per attribute type and scores
    * each count with a normal CDF, falling back to the logistic
    * approximation 1/(1+exp(-1.702*z)) (line 124). Spark/DuckDB lack erf,
    * so the logistic form — the loader's own fallback — is what both
    * engines compute here. Mean/std come from exact decimal sums. */
  val qGaussianCdf: Q = Q(
    "q_gaussian_cdf",
    """WITH counts AS (
      |  SELECT c_custkey, c_mktsegment, COUNT(*) AS cnt
      |  FROM customer JOIN orders ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |stats AS (
      |  SELECT c_mktsegment,
      |    CAST(SUM(cnt) AS DOUBLE) AS s1,
      |    CAST(SUM(cnt * cnt) AS DOUBLE) AS s2,
      |    CAST(COUNT(*) AS DOUBLE) AS n
      |  FROM counts GROUP BY 1)
      |SELECT c_custkey, cnt,
      |  round(1.0 / (1.0 + exp(-(1.702 * ((cnt - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)))))), 6) AS attr_cdf
      |FROM counts JOIN stats USING (c_mktsegment)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val counts = T.customer(s, d)
      .join(T.orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.groupBy("c_mktsegment")
      .agg(dbl(sum(col("cnt"))).as("s1"),
        dbl(sum(col("cnt") * col("cnt"))).as("s2"),
        dbl(count(lit(1))).as("n"))
    val z = (col("cnt") - col("s1") / col("n")) /
      sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
    counts.join(broadcast(stats), "c_mktsegment")
      .select(col("c_custkey"), col("cnt"),
        round(lit(1.0) / (lit(1.0) + exp(-(lit(1.702) * z))), 6).as("attr_cdf"))
      .orderBy("c_custkey")
  }

  /** Sketch-based distinct counting (HyperLogLog via Apache DataSketches
    * builtins): the 100 TB answer to "how many distinct parts per
    * supplier" QC rollups — sketches merge associatively, so partial
    * aggregation and re-aggregation across days/partitions are exact
    * sketch merges instead of distinct-row shuffles. Fully oracled (r9)
    * via the exact-half + certificate recipe: exact distinct counts
    * hash-match DuckDB, and the HLL estimate rides `rel_err_le_5pct`
    * (well beyond lgK=12's ~1.6% RSE; deterministic for this fixed
    * dataset, empirically green at all three SFs) which the oracle pins
    * TRUE — an estimator regression becomes a hash mismatch. The raw
    * estimates stay spec-bounded (Round2OpsSpec). */
  val qSketchDistinct: Q = Q(
    "q_sketch_distinct",
    """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS rel_err_le_5pct
      |FROM lineitem GROUP BY 1 ORDER BY l_suppkey""".stripMargin) { (s, d) =>
    T.lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("__approx"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_suppkey"), col("exact_parts"),
        (abs(col("__approx") - col("exact_parts")) <=
          lit(0.05) * col("exact_parts")).as("rel_err_le_5pct"))
      .orderBy("l_suppkey")
  }

  /** Approximate per-group quantiles via percentile_approx (the mergeable
    * KLL-style sketch): the 100 TB path where the exact per-group sort of
    * q_percentile is unaffordable. Fully oracled (r9) via the exact-half +
    * provable-certificate recipe (q_join_size_est's): the exact median and
    * count hash-match DuckDB's quantile_cont (both engines interpolate at
    * (n-1)·p), and the sketch leg is bound by its rank guarantee — the
    * returned value is an observed element whose rank sits within
    * n/accuracy of the target rank. `rank_err_ok` re-ranks the sketch
    * value against the data (one certificate join) and the oracle pins it
    * TRUE, so a sketch regression becomes a hash mismatch instead of a
    * silent drift. */
  val qApproxQuantile: Q = Q(
    "q_approx_quantile",
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.5), 6) AS exact_median,
      |  COUNT(*) AS cnt, TRUE AS rank_err_ok
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = T.orders(s, d).select("o_orderpriority", "o_totalprice")
    val agg = o.groupBy("o_orderpriority")
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("__av"),
        round(percentile(col("o_totalprice"), lit(0.5)), 6).as("exact_median"),
        count(lit(1)).as("cnt"))
    // certificate: rank the sketch's answer within its group (groups-sized
    // broadcast, one extra scan — the price of a provable bound)
    val rk = o.join(broadcast(agg.select(col("o_orderpriority"), col("__av"))),
        Seq("o_orderpriority"))
      .groupBy("o_orderpriority")
      .agg(sum(when(col("o_totalprice") < col("__av"), 1L).otherwise(0L)).as("__lt"),
        sum(when(col("o_totalprice") <= col("__av"), 1L).otherwise(0L)).as("__le"))
    agg.join(rk, Seq("o_orderpriority"))
      .withColumn("rank_err_ok",
        (dbl(col("__lt")) <= lit(0.5) * dbl(col("cnt")) + dbl(col("cnt")) / 1000.0 + 1.0) &&
          (dbl(col("__le")) >= lit(0.5) * dbl(col("cnt")) - dbl(col("cnt")) / 1000.0 - 1.0))
      .select("o_orderpriority", "exact_median", "cnt", "rank_err_ok")
      .orderBy("o_orderpriority")
  }

  /** Quantile normalization across groups (R/gtex_process.R,
    * R/hpm_level.R: force every tissue's expression distribution onto the
    * common reference distribution): rank within group, reference value =
    * mean at that rank across groups, every value mapped to its rank's
    * reference. Two shuffles (group-rank window, rank aggregation) — the
    * rank join carries only (rank, value) pairs. Decimal-exact reference
    * means (SURVEY.md §5). */
  val qQuantileNorm: Q = Q(
    "q_quantile_norm",
    """WITH r AS (SELECT c_mktsegment AS seg, o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS p,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey) AS rnk
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |ref AS (SELECT rnk, round(CAST(SUM(p) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS qnorm
      |  FROM r GROUP BY rnk)
      |SELECT seg, o_orderkey, CAST(p AS DOUBLE) AS price, qnorm
      |FROM r JOIN ref USING (rnk) ORDER BY seg, rnk""".stripMargin) { (s, d) =>
    import graft.functions.Exact._
    val w = Window.partitionBy("seg").orderBy("o_totalprice", "o_orderkey")
    val r = T.orders(s, d)
      .join(broadcast(T.customer(s, d).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderkey"),
        col("o_totalprice"), dec2(col("o_totalprice")).as("p"))
      .withColumn("rnk", row_number().over(w).cast("long"))
    val ref = r.groupBy("rnk")
      .agg(round(dbl(sum(col("p"))) / dbl(count(lit(1))), 6).as("qnorm"))
    r.join(ref, "rnk")
      .select(col("seg"), col("o_orderkey"), dbl(col("p")).as("price"), col("qnorm"), col("rnk"))
      .orderBy("seg", "rnk")
      .drop("rnk")
  }


  /** Release-over-release TDL transition matrix: classify every customer
    * under the q_tdl rules twice — once on the orders visible before the
    * release cutoff, once on everything — and count each (from, to)
    * reclassification. This is the reference's flagship release report
    * (doc/TCRD_Build_Notes.txt tracks Tdark→Tbio/Tchem "graduations"
    * between TCRD versions; loaders/load-TDLs.py recomputes classes per
    * release). Two branch aggregations over one fact scan + a key-joined
    * transition count — the snapshot-diff shape of q_delta_detect applied
    * to derived classifications. */
  val qTdlTransition: Q = Q(
    "q_tdl_transition",
    """WITH r1 AS (
      |  SELECT c_custkey,
      |    CASE WHEN max_price > 495000 THEN 'Tclin'
      |         WHEN n_orders >= 15 THEN 'Tchem'
      |         WHEN n_orders >= 1 THEN 'Tbio'
      |         ELSE 'Tdark' END AS tdl
      |  FROM (
      |    SELECT c_custkey,
      |      CAST(COALESCE(COUNT(o_orderkey), 0) AS BIGINT) AS n_orders,
      |      CAST(COALESCE(MAX(o_totalprice), 0) AS DOUBLE) AS max_price
      |    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |      AND o_orderdate < TIMESTAMP '1997-01-01'
      |    GROUP BY c_custkey)),
      |r2 AS (
      |  SELECT c_custkey,
      |    CASE WHEN max_price > 495000 THEN 'Tclin'
      |         WHEN n_orders >= 15 THEN 'Tchem'
      |         WHEN n_orders >= 1 THEN 'Tbio'
      |         ELSE 'Tdark' END AS tdl
      |  FROM (
      |    SELECT c_custkey,
      |      CAST(COALESCE(COUNT(o_orderkey), 0) AS BIGINT) AS n_orders,
      |      CAST(COALESCE(MAX(o_totalprice), 0) AS DOUBLE) AS max_price
      |    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |    GROUP BY c_custkey))
      |SELECT r1.tdl AS tdl_from, r2.tdl AS tdl_to,
      |  COUNT(*) AS n_customers, MIN(r1.c_custkey) AS example_custkey
      |FROM r1 JOIN r2 USING (c_custkey)
      |GROUP BY 1, 2 ORDER BY tdl_from, tdl_to""".stripMargin) { (s, d) =>
    def classify(filtered: Boolean): org.apache.spark.sql.DataFrame = {
      val orders =
        if (filtered)
          T.orders(s, d).filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        else T.orders(s, d)
      T.customer(s, d)
        .join(orders, col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          lng(coalesce(count(col("o_orderkey")), lit(0))).as("n_orders"),
          dbl(coalesce(max(col("o_totalprice")), lit(0))).as("max_price"))
        .select(col("c_custkey"),
          when(col("max_price") > 495000, "Tclin")
            .when(col("n_orders") >= 15, "Tchem")
            .when(col("n_orders") >= 1, "Tbio")
            .otherwise("Tdark").as("tdl"))
    }
    classify(filtered = true).withColumnRenamed("tdl", "tdl_from")
      .join(classify(filtered = false).withColumnRenamed("tdl", "tdl_to"), "c_custkey")
      .groupBy("tdl_from", "tdl_to")
      .agg(count(lit(1)).as("n_customers"), min(col("c_custkey")).as("example_custkey"))
      .orderBy("tdl_from", "tdl_to")
  }

  // ---- PRODUCTION forms (VERDICT r9 #2): the sketch alone — no exact
  // co-aggregate, no certificate join. Bench times these beside the
  // certified gate forms above.

  /** Per-supplier distinct-part counts from the HLL sketch only. */
  def sketchDistinctProd(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    T.lineitem(s, d).groupBy("l_suppkey")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("approx_parts"))
      .orderBy("l_suppkey")

  /** Per-priority approximate median from percentile_approx only. */
  def approxQuantileProd(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    T.orders(s, d).groupBy("o_orderpriority")
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("median_est"),
        count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")

  val all: Seq[Q] = Seq(qCdf, qGaussianCdf, qConsensusMode, qTau, qTdl,
    qTinxNovelty, qTinxImportance, qPubscore, qSketchDistinct, qApproxQuantile,
    qQuantileNorm, qTdlTransition)
}
