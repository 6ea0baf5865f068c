package graft.ops

import graft.Q
import graft.functions.{CmsAgg, KmvAgg, SampleQuantileAgg}
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** Sketch-valued analytics (SURVEY.md §2.5 agg_kmv / agg_sample_quantile):
  * fixed-size, MERGEABLE, bit-deterministic summaries as first-class
  * aggregate values. The 100 TB posture is the point — per-source /
  * per-group sketches are a few KB, so cross-source comparisons and
  * incremental refreshes operate sketch-vs-sketch instead of re-scanning
  * the corpus. Reference shape: the cross-source overlap audits and the
  * per-dataset distribution summaries the reference's loaders/R
  * preprocessing compute on a single node (e.g. R/gtex_process.R rank
  * buckets, cross-xref reconciliation around loaders/TCRD.py).
  *
  * Both queries are rows-only at the gate (DuckDB can't replay the
  * sketch), pinned by specs that (a) bound the estimation error against
  * the exact answer and (b) require EXACT output equality under
  * re-partitioning — the sketches are pure functions of the input set.
  */
object Sketches {

  private def toks(s: org.apache.spark.sql.SparkSession, d: String) =
    T.documents(s, d).select(col("source"),
      explode(split(col("text"), " ")).as("token"))

  /** Pairwise source-vocabulary overlap from per-source KMV sketches:
    * ONE pass over tokens builds a 1024-value sketch per source; every
    * pairwise union/intersection/Jaccard estimate after that reads only
    * sketch bytes. Contrast q_vocab_overlap (exact, token-shuffle per
    * pair): same report at a fixed cost per SOURCE, not per token.
    * Fully oracled (r9) via the exact-half + certificate recipe: the
    * exact union/intersect/Jaccard per pair hash-match DuckDB, and the
    * seed-dependent KMV estimates ride `est_within_tol` (union ≤15%,
    * intersect ≤ max(25%·i, 5%·u), jaccard ≤0.07 abs — the k=1024
    * bottom-k error band with slack; probabilistic in general but a
    * deterministic function of this fixed-seed sketch and dataset,
    * empirically green at all three SFs) which the oracle pins TRUE.
    * The raw estimates stay spec-bounded (SketchesSpec). */
  val qSketchSetops: Q = Q(
    "q_sketch_setops",
    """WITH v AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS t
      |           FROM documents),
      |sz AS (SELECT source, COUNT(*) AS n FROM v GROUP BY 1),
      |common AS (
      |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS c
      |  FROM v a JOIN v b ON a.t = b.t AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT source_a, source_b,
      |  CAST(sa.n + sb.n - c AS BIGINT) AS exact_union,
      |  CAST(c AS BIGINT) AS exact_intersect,
      |  round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS exact_jaccard,
      |  TRUE AS est_within_tol
      |FROM common JOIN sz sa ON sa.source = source_a
      |            JOIN sz sb ON sb.source = source_b
      |ORDER BY source_a, source_b""".stripMargin) { (s, d) =>
    val tk = toks(s, d)
    val v = tk.distinct().localCheckpoint(true)
    val sz = v.groupBy("source").agg(count(lit(1)).as("n"))
    val common = v.select(col("source").as("source_a"), col("token"))
      .join(v.select(col("source").as("source_b"), col("token")), "token")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("c"))
    val sk = tk.groupBy("source")
      .agg(KmvAgg.agg(xxhash64(col("token")), 1024).as("sk"))
    val est = udf((a: Array[Byte], b: Array[Byte]) => KmvAgg.setOps(a, b))
    common
      .join(broadcast(sz.select(col("source").as("source_a"), col("n").as("na"))), "source_a")
      .join(broadcast(sz.select(col("source").as("source_b"), col("n").as("nb"))), "source_b")
      .join(broadcast(sk.select(col("source").as("source_a"), col("sk").as("ska"))), "source_a")
      .join(broadcast(sk.select(col("source").as("source_b"), col("sk").as("skb"))), "source_b")
      .withColumn("exact_union", (col("na") + col("nb") - col("c")).cast("long"))
      .withColumn("exact_intersect", col("c").cast("long"))
      .withColumn("xj", col("exact_intersect").cast("double") /
        col("exact_union").cast("double"))
      .withColumn("e", est(col("ska"), col("skb")))
      .select(col("source_a"), col("source_b"),
        col("exact_union"), col("exact_intersect"),
        round(col("xj"), 6).as("exact_jaccard"),
        ((abs(col("e._1") - col("exact_union")) <= lit(0.15) * col("exact_union")) &&
          (abs(col("e._2") - col("exact_intersect")) <=
            greatest(lit(0.25) * col("exact_intersect"), lit(0.05) * col("exact_union"))) &&
          (abs(col("e._3") - col("xj")) <= lit(0.07))).as("est_within_tol"))
      .orderBy("source_a", "source_b")
  }

  /** Per-flag price quantiles from a deterministic 4096-row bottom-k
    * sample (stable row hash = xxhash64(orderkey, linenumber)). The
    * sketch column is what a daily sidecar would persist; p50/p90/p99
    * are read off it driver-free. Fully oracled (r9) via the exact-half
    * + rank-certificate recipe (q_approx_quantile's): exact p50/p90/p99
    * and counts hash-match DuckDB's quantile_cont, and each sample value
    * is re-ranked against the data — its empirical CDF position must sit
    * within 5% of the target p (≈6σ of the k=4096 binomial sampling
    * band), a flag the oracle pins TRUE. */
  val qSketchQuantile: Q = Q(
    "q_sketch_quantile",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99,
      |  COUNT(*) AS cnt, TRUE AS rank_err_ok
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val q = udf((b: Array[Byte], p: Double) => SampleQuantileAgg.quantile(b, p))
    val li = T.lineitem(s, d)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    val agg = li.groupBy(col("l_returnflag"))
      .agg(SampleQuantileAgg.agg(
        xxhash64(col("l_orderkey"), col("l_linenumber")),
        col("l_extendedprice"), 4096).as("sk"),
        // ONE percentile aggregate for all three targets: each separate
        // percentile(p) buffers (and shuffles, and sorts) the full value
        // multiset independently — three copies of every price on the
        // exchange (15.5 MB → ~5 MB at sf0.1, and 3× the merge sort).
        // The array form reads all three off one sorted buffer; per-
        // element results are the identical exact computation.
        percentile(col("l_extendedprice"),
          array(lit(0.5), lit(0.9), lit(0.99))).as("__ps"),
        count(lit(1)).as("cnt"))
      .select(col("l_returnflag"), col("sk"),
        round(element_at(col("__ps"), 1), 4).as("exact_p50"),
        round(element_at(col("__ps"), 2), 4).as("exact_p90"),
        round(element_at(col("__ps"), 3), 4).as("exact_p99"),
        col("cnt"))
      .withColumn("v50", q(col("sk"), lit(0.5)))
      .withColumn("v90", q(col("sk"), lit(0.9)))
      .withColumn("v99", q(col("sk"), lit(0.99)))
      .localCheckpoint(true) // flag-sized; anchors the certificate join
    // certificate: one extra scan re-ranks the three sample values
    val rk = li
      .join(broadcast(agg.select("l_returnflag", "v50", "v90", "v99")), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(sum(when(col("l_extendedprice") <= col("v50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_extendedprice") <= col("v90"), 1L).otherwise(0L)).as("le90"),
        sum(when(col("l_extendedprice") <= col("v99"), 1L).otherwise(0L)).as("le99"))
    def ok(le: org.apache.spark.sql.Column, p: Double) =
      abs(le.cast("double") / col("cnt").cast("double") - lit(p)) <= lit(0.05)
    agg.join(rk, "l_returnflag")
      .withColumn("rank_err_ok",
        ok(col("le50"), 0.5) && ok(col("le90"), 0.9) && ok(col("le99"), 0.99))
      .select("l_returnflag", "exact_p50", "exact_p90", "exact_p99", "cnt", "rank_err_ok")
      .orderBy("l_returnflag")
  }

  /** Per-source token frequencies from count-min sketches (agg_cms): one
    * pass builds a 4×1024 CMS per source (32 KB, mergeable); the global
    * top-10 tokens are then frequency-checked per source sketch-vs-exact.
    * Contrast q_heavy_hitters, which uses Spark's built-in
    * `df.stat.countMinSketch` — a whole-DataFrame DRIVER helper: agg_cms
    * is a per-GROUP aggregate value that groups, persists as a sidecar
    * column, and merges across partitions/days/streams like any other
    * aggregation.
    * The exact side exists only as the QC comparison — the sketch column
    * is what a per-source/per-day sidecar persists, and at 100 TB every
    * "how often does token x occur in source s" probe reads sketch bytes,
    * never re-scans the corpus (sketches of different days/sources merge
    * by counter addition). Fully oracled (r9) via the exact-half +
    * provable-certificate recipe (q_join_size_est's): exact per-probe
    * counts hash-match DuckDB; the sketch leg rides two flags the oracle
    * pins TRUE — `est_ge_exact` (a CMS NEVER under-counts: each key adds
    * its full frequency to its own cells, cross-terms are non-negative)
    * and `overcount_le_eps` (est ≤ exact + ⌈(e/width)·N_source⌉, the
    * classic bound at the sketch's own ε — probabilistic in general but a
    * deterministic function of this fixed-seed sketch and dataset;
    * empirically green at all three SFs, and the min-over-4-rows estimate
    * makes a violation odds ~e⁻⁴ per probe). The numeric overcounts stay
    * spec-bounded (SketchesSpec). */
  val qSketchCms: Q = Q(
    "q_sketch_cms",
    """WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS token
      |            FROM documents),
      |  probes AS (SELECT token FROM tk GROUP BY token
      |             ORDER BY COUNT(*) DESC, token LIMIT 10),
      |  grid AS (SELECT s.source, p.token
      |           FROM (SELECT DISTINCT source FROM tk) s, probes p),
      |  exact AS (SELECT source, token, COUNT(*) AS exact_n FROM tk
      |            WHERE token IN (SELECT token FROM probes) GROUP BY 1, 2)
      |SELECT g.source, g.token, COALESCE(e.exact_n, 0) AS exact_n,
      |  TRUE AS est_ge_exact, TRUE AS overcount_le_eps
      |FROM grid g LEFT JOIN exact e
      |  ON e.source = g.source AND e.token = g.token
      |ORDER BY g.source, g.token""".stripMargin) { (s, d) =>
    val W = 1024
    val tk = toks(s, d)
    val sk = tk.groupBy("source")
      .agg(CmsAgg.agg(xxhash64(col("token")), W, 4).as("sk"),
        count(lit(1)).as("__n"))
    // deterministic global probe set: top-10 tokens (count desc, token asc)
    val probes = tk.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(10).select("token")
    val exact = tk.join(broadcast(probes), "token")
      .groupBy("source", "token").agg(count(lit(1)).as("exact_n"))
    val est = udf((b: Array[Byte], h: Long) => CmsAgg.estimate(b, h))
    sk.join(broadcast(probes)) // |sources| × 10 grid — constant-size side
      .withColumn("__est", est(col("sk"), xxhash64(col("token"))))
      .join(exact, Seq("source", "token"), "left")
      .withColumn("exact_n", coalesce(col("exact_n"), lit(0L)))
      .select(col("source"), col("token"), col("exact_n"),
        (col("__est") >= col("exact_n")).as("est_ge_exact"),
        (col("__est") <= col("exact_n") +
          ceil(lit(math.E / W) * col("__n")).cast("long")).as("overcount_le_eps"))
      .orderBy("source", "token")
  }

  /** Sketch-based equi-join cardinality estimation (the planner's
    * question): per-table CMS sketches over the join key, estimate =
    * min-over-rows counter inner product (never under-counts; overcount
    * ≈ |A|·|B|/width per row, so width scales to the CARDINALITY PRODUCT
    * — 64k×4 longs = 2 MB is still sidecar-sized). At 100 TB these
    * sketches live in the write-time sidecar (sink_freq_index), so "how
    * big is lineitem ⋈ orders on this key" is answerable for ANY table
    * pair from planner-sized bytes before launching the job — the input
    * [[graft.sources.SidecarStats.suggestedShufflePartitions]] wants.
    * The exact join sizes are FULLY oracled; the sketch leg is the
    * provable `est_ge_exact` invariant (the counter inner product never
    * under-counts: every key contributes fA·fB to its own cell, cross
    * terms are non-negative), pinned TRUE by the oracle so a sketch bug
    * becomes a hash mismatch. The numeric overcount stays bounded by
    * spec (SketchesSpec). */
  def joinSizeCases(s: org.apache.spark.sql.SparkSession,
                    d: String): Seq[(String, Long, Long)] = {
    val W = 65536
    def sk(df: org.apache.spark.sql.DataFrame, key: String): Array[Byte] =
      df.agg(CmsAgg.agg(xxhash64(col(key)), W, 4)).head().getAs[Array[Byte]](0)
    // the dominant table is scanned ONCE for sketches (all three key
    // sketches in one aggregation) and once per exact-count join off a
    // materialized 3-column slice — not per sketch
    val li = T.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey").localCheckpoint(true)
    val liSk = li.agg(
      CmsAgg.agg(xxhash64(col("l_orderkey")), W, 4).as("sko"),
      CmsAgg.agg(xxhash64(col("l_partkey")), W, 4).as("skp"),
      CmsAgg.agg(xxhash64(col("l_suppkey")), W, 4).as("sks")).head()
    Seq(
      ("lineitem_orders", liSk.getAs[Array[Byte]]("sko"), sk(T.orders(s, d), "o_orderkey"),
        li.join(T.orders(s, d), col("l_orderkey") === col("o_orderkey")).count()),
      ("lineitem_part", liSk.getAs[Array[Byte]]("skp"), sk(T.part(s, d), "p_partkey"),
        li.join(T.part(s, d), col("l_partkey") === col("p_partkey")).count()),
      ("lineitem_supplier", liSk.getAs[Array[Byte]]("sks"), sk(T.supplier(s, d), "s_suppkey"),
        li.join(T.supplier(s, d), col("l_suppkey") === col("s_suppkey")).count()))
      .map { case (name, a, b, exact) =>
        (name, exact, CmsAgg.joinSizeEstimate(a, b))
      }
  }

  val qJoinSizeEst: Q = Q(
    "q_join_size_est",
    """WITH c AS (
      |  SELECT 'lineitem_orders' AS join_name, (SELECT COUNT(*) FROM lineitem l
      |      JOIN orders o ON l.l_orderkey = o.o_orderkey) AS exact_n
      |  UNION ALL
      |  SELECT 'lineitem_part', (SELECT COUNT(*) FROM lineitem l
      |      JOIN part p ON l.l_partkey = p.p_partkey)
      |  UNION ALL
      |  SELECT 'lineitem_supplier', (SELECT COUNT(*) FROM lineitem l
      |      JOIN supplier s ON l.l_suppkey = s.s_suppkey))
      |SELECT join_name, CAST(exact_n AS BIGINT) AS exact_n, TRUE AS est_ge_exact
      |FROM c ORDER BY join_name""".stripMargin) { (s, d) =>
    import s.implicits._
    joinSizeCases(s, d)
      .map { case (name, exact, est) => (name, exact, est >= exact) }
      .toDF("join_name", "exact_n", "est_ge_exact")
      .orderBy("join_name")
  }

  // ---- PRODUCTION forms (VERDICT r9 #2): the sketch plans ALONE — no
  // exact half, no certificate scan. The certified gate forms above stay
  // what the oracle hashes; these are what a 100 TB caller runs and what
  // Bench times beside them, so the "scale twin" never strictly contains
  // the exact path it exists to avoid. ProductionFormsSpec pins each
  // against its certified sibling's sketch leg.

  /** Per-flag price quantiles read off the bottom-k sample sketch only —
    * ONE aggregation pass, no exact percentile, no re-rank scan. */
  def sketchQuantileProd(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val q = udf((b: Array[Byte], p: Double) => SampleQuantileAgg.quantile(b, p))
    T.lineitem(s, d)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .groupBy("l_returnflag")
      .agg(SampleQuantileAgg.agg(
          xxhash64(col("l_orderkey"), col("l_linenumber")),
          col("l_extendedprice"), 4096).as("sk"),
        count(lit(1)).as("cnt"))
      .select(col("l_returnflag"),
        q(col("sk"), lit(0.5)).as("p50"),
        q(col("sk"), lit(0.9)).as("p90"),
        q(col("sk"), lit(0.99)).as("p99"),
        col("cnt"))
      .orderBy("l_returnflag")
  }

  /** Pairwise source-vocabulary overlap from KMV sketch bytes only: one
    * token pass per source, then every pairwise estimate reads sketches
    * — the exact distinct-token self-join (the certified form's oracle
    * half) never runs. */
  def sketchSetopsProd(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val sk = toks(s, d).groupBy("source")
      .agg(KmvAgg.agg(xxhash64(col("token")), 1024).as("sk"))
    val est = udf((a: Array[Byte], b: Array[Byte]) => KmvAgg.setOps(a, b))
    sk.select(col("source").as("source_a"), col("sk").as("ska"))
      .join(broadcast(sk.select(col("source").as("source_b"), col("sk").as("skb"))),
        col("source_a") < col("source_b"))
      .withColumn("e", est(col("ska"), col("skb")))
      .select(col("source_a"), col("source_b"),
        col("e._1").as("union_est"), col("e._2").as("intersect_est"),
        round(col("e._3"), 6).as("jaccard_est"))
      .orderBy("source_a", "source_b")
  }

  /** Per-source probe-token frequency estimates from the CMS alone: the
    * probe set still costs one token groupBy (it is part of the question
    * — global top-10), but the per-(source, probe) EXACT count join (the
    * certificate) never runs; every frequency is sketch-read. */
  def sketchCmsProd(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val tk = toks(s, d)
    val sk = tk.groupBy("source")
      .agg(CmsAgg.agg(xxhash64(col("token")), 1024, 4).as("sk"))
    val probes = tk.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(10).select("token")
    val est = udf((b: Array[Byte], h: Long) => CmsAgg.estimate(b, h))
    sk.join(broadcast(probes))
      .select(col("source"), col("token"),
        est(col("sk"), xxhash64(col("token"))).as("freq_est"))
      .orderBy("source", "token")
  }

  val all: Seq[Q] = Seq(qSketchSetops, qSketchQuantile, qSketchCms, qJoinSizeEst)
}
