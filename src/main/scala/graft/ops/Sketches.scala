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
    * pair): same report at a fixed cost per SOURCE, not per token. */
  val qSketchSetops: Q = Q.rowsOnly("q_sketch_setops") { (s, d) =>
    val sk = toks(s, d)
      .groupBy("source")
      .agg(KmvAgg.agg(xxhash64(col("token")), 1024).as("sk"))
    val est = udf((a: Array[Byte], b: Array[Byte]) => {
      val (u, i, j) = KmvAgg.setOps(a, b)
      (math.round(u), math.round(i), math.rint(j * 1e6) / 1e6)
    })
    val l = sk.select(col("source").as("source_a"), col("sk").as("ska"))
    val r = sk.select(col("source").as("source_b"), col("sk").as("skb"))
    l.join(r, col("source_a") < col("source_b")) // few sources: tiny cross
      .withColumn("e", est(col("ska"), col("skb")))
      .select(col("source_a"), col("source_b"),
        col("e._1").as("est_union"), col("e._2").as("est_intersect"),
        col("e._3").as("est_jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Per-flag price quantiles from a deterministic 4096-row bottom-k
    * sample (stable row hash = xxhash64(orderkey, linenumber)). The
    * sketch column is what a daily sidecar would persist; p50/p90/p99
    * are read off it driver-free. */
  val qSketchQuantile: Q = Q.rowsOnly("q_sketch_quantile") { (s, d) =>
    val q = udf((b: Array[Byte], p: Double) =>
      math.rint(SampleQuantileAgg.quantile(b, p) * 100) / 100)
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(SampleQuantileAgg.agg(
        xxhash64(col("l_orderkey"), col("l_linenumber")),
        col("l_extendedprice"), 4096).as("sk"))
      .select(col("l_returnflag"),
        q(col("sk"), lit(0.5)).as("p50"),
        q(col("sk"), lit(0.9)).as("p90"),
        q(col("sk"), lit(0.99)).as("p99"))
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
    * by counter addition). CMS guarantees est ≥ exact; the spec bounds
    * the overcount at the classic εN. */
  val qSketchCms: Q = Q.rowsOnly("q_sketch_cms") { (s, d) =>
    val tk = toks(s, d)
    val sk = tk.groupBy("source")
      .agg(CmsAgg.agg(xxhash64(col("token")), 1024, 4).as("sk"))
    // deterministic global probe set: top-10 tokens (count desc, token asc)
    val probes = tk.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(10).select("token")
    val exact = tk.join(broadcast(probes), "token")
      .groupBy("source", "token").agg(count(lit(1)).as("exact_n"))
    val est = udf((b: Array[Byte], h: Long) => CmsAgg.estimate(b, h))
    sk.join(broadcast(probes)) // |sources| × 10 grid — constant-size side
      .withColumn("est_n", est(col("sk"), xxhash64(col("token"))))
      .join(exact, Seq("source", "token"), "left")
      .select(col("source"), col("token"),
        coalesce(col("exact_n"), lit(0L)).as("exact_n"), col("est_n"),
        (col("est_n") - coalesce(col("exact_n"), lit(0L))).as("overcount"))
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

  val all: Seq[Q] = Seq(qSketchSetops, qSketchQuantile, qSketchCms, qJoinSizeEst)
}
