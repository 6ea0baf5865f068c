package graft.operators

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical QC operators (SURVEY.md §2.2/§2.3):
  *
  *  - [[qWinsorize]] — robust clipping at per-group exact percentiles,
  *    the outlier-taming pass the reference's R preprocessing applies
  *    before rank/level normalization (R/gtex_process.R, R/process-CCLE.R
  *    trim before aggregating).
  *  - [[qHhi]] — Herfindahl concentration per market: how concentrated
  *    is revenue across suppliers — the "is this family dominated by a
  *    few targets" screen over publication/activity counts in the
  *    reference's QC notes.
  *  - [[qVocabOverlap]] — pairwise source vocabulary Jaccard: which
  *    sources share token space (cross-source near-duplication smell
  *    before the doc-level dedup passes run).
  */
object Stats {

  /** Winsorize order totals at the per-priority [p05, p95] exact
    * percentiles: values outside clip to the boundary, with flags. Same
    * percentile recipe as q_percentile/q_mad_outliers (exact
    * interpolation — quantile_cont ↔ percentile). One grouped
    * percentile pass + a broadcast bounds join; clipping is map-side. */
  val qWinsorize: Q = Q(
    "q_winsorize",
    """WITH b AS (SELECT o_orderpriority,
      |    quantile_cont(o_totalprice, 0.05) AS lo,
      |    quantile_cont(o_totalprice, 0.95) AS hi
      |  FROM orders GROUP BY 1)
      |SELECT o_orderkey, orders.o_orderpriority, o_totalprice,
      |  round(CASE WHEN o_totalprice < lo THEN lo
      |             WHEN o_totalprice > hi THEN hi
      |             ELSE o_totalprice END, 2) AS clipped,
      |  CAST(CASE WHEN o_totalprice < lo OR o_totalprice > hi
      |       THEN 1 ELSE 0 END AS INT) AS was_clipped
      |FROM orders JOIN b USING (o_orderpriority)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = T.orders(s, d)
    val b = o.groupBy("o_orderpriority")
      // one percentile buffer for both bounds (the array form — see
      // q_percentile): identical per-element exact interpolation
      .agg(percentile(col("o_totalprice"),
          array(lit(0.05), lit(0.95))).as("__ps"))
      .select(col("o_orderpriority"),
        element_at(col("__ps"), 1).as("lo"),
        element_at(col("__ps"), 2).as("hi"))
    o.join(broadcast(b), "o_orderpriority")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        round(when(col("o_totalprice") < col("lo"), col("lo"))
          .when(col("o_totalprice") > col("hi"), col("hi"))
          .otherwise(col("o_totalprice")), 2).as("clipped"),
        when(col("o_totalprice") < col("lo") || col("o_totalprice") > col("hi"), 1)
          .otherwise(0).as("was_clipped"))
      .orderBy("o_orderkey")
  }

  /** Herfindahl-Hirschman concentration of lineitem revenue per
    * return-flag "market": HHI = Σ share², share = supplier revenue /
    * market revenue. Revenue sums are DECIMAL-exact; each share² term is
    * a fixed-shape double rounded to 12 dp, then summed as
    * DECIMAL(18,12) (order/partition-invariant — the q_perplexity
    * recipe) and rounded to 6. Two hash aggregations, one broadcast of
    * the market totals. */
  val qHhi: Q = Q(
    "q_hhi",
    """WITH rev AS (
      |  SELECT l_returnflag, l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS r
      |  FROM lineitem GROUP BY 1, 2),
      |tot AS (SELECT l_returnflag, CAST(SUM(r) AS DOUBLE) AS t FROM rev GROUP BY 1),
      |term AS (SELECT rev.l_returnflag,
      |    round(pow(CAST(r AS DOUBLE) / t, 2), 12) AS sh2
      |  FROM rev JOIN tot USING (l_returnflag))
      |SELECT l_returnflag, COUNT(*) AS n_suppliers,
      |  round(CAST(SUM(CAST(sh2 AS DECIMAL(18,12))) AS DOUBLE), 6) AS hhi
      |FROM term GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val rev = T.lineitem(s, d)
      .groupBy("l_returnflag", "l_suppkey")
      .agg(sum(dec2(col("l_extendedprice"))).as("r"))
    val tot = rev.groupBy(col("l_returnflag"))
      .agg(dbl(sum(col("r"))).as("t"))
    rev.join(broadcast(tot), "l_returnflag")
      .select(col("l_returnflag"),
        round(pow(dbl(col("r")) / col("t"), 2), 12).as("sh2"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_suppliers"),
        round(dbl(sum(col("sh2").cast(DecimalType(18, 12)))), 6).as("hhi"))
      .orderBy("l_returnflag")
  }

  /** Pairwise source vocabulary overlap: distinct token sets per source,
    * Jaccard for every source pair (a < b). The cross-source
    * near-duplication smell test run before doc-level dedup. One token
    * distinct (corpus-keyed shuffle), a vocab-sized self-join on the
    * token, and a pair aggregation joined against the per-source sizes —
    * source count is tiny, token sets are the big side, and nothing ever
    * pairs DOCUMENTS (the quadratic trap this query exists to avoid). */
  val qVocabOverlap: Q = Q(
    "q_vocab_overlap",
    """WITH v AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS t
      |           FROM documents),
      |sz AS (SELECT source, COUNT(*) AS n FROM v GROUP BY 1),
      |common AS (
      |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS c
      |  FROM v a JOIN v b ON a.t = b.t AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, c AS n_common,
      |  round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
      |FROM common JOIN sz sa ON sa.source = src_a
      |            JOIN sz sb ON sb.source = src_b
      |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    val v = T.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .distinct()
    val sz = v.groupBy("source").agg(count(lit(1)).as("n"))
    val a = v.select(col("source").as("src_a"), col("t"))
    val b = v.select(col("source").as("src_b"), col("t"))
    val common = a.join(b, "t")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("c"))
    common
      .join(broadcast(sz.select(col("source").as("src_a"), col("n").as("na"))), "src_a")
      .join(broadcast(sz.select(col("source").as("src_b"), col("n").as("nb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("c").as("n_common"),
        round(dbl(col("c")) / (col("na") + col("nb") - col("c")), 6).as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** Pre-join cardinality audit: for each fact⋈dim edge, the per-side
    * key statistics (rows, distinct keys, max per-key fanout) and the
    * EXACT join output size — computed from the two per-key count
    * tables, never by running the join. The 100 TB safety screen: a
    * join whose est_join_rows explodes past its inputs gets flagged
    * before it burns a cluster (the reference equivalent: loaders
    * sanity-count before bulk inserts). Per edge: two key-count
    * aggregations + one key-joined product sum — all key-cardinality
    * sized. */
  val qJoinAudit: Q = Q(
    "q_join_audit",
    """WITH lo AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
      |oo AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
      |lp AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
      |pp AS (SELECT p_partkey AS k, COUNT(*) AS c FROM part GROUP BY 1),
      |e1 AS (SELECT 'lineitem-orders' AS edge,
      |  (SELECT CAST(SUM(c) AS BIGINT) FROM lo) AS left_rows,
      |  (SELECT COUNT(*) FROM lo) AS left_keys,
      |  (SELECT CAST(MAX(c) AS BIGINT) FROM lo) AS left_max_fanout,
      |  (SELECT CAST(SUM(c) AS BIGINT) FROM oo) AS right_rows,
      |  (SELECT COUNT(*) FROM oo) AS right_keys,
      |  (SELECT CAST(MAX(c) AS BIGINT) FROM oo) AS right_max_fanout,
      |  (SELECT CAST(SUM(lo.c * oo.c) AS BIGINT) FROM lo JOIN oo USING (k)) AS est_join_rows),
      |e2 AS (SELECT 'lineitem-part' AS edge,
      |  (SELECT CAST(SUM(c) AS BIGINT) FROM lp) AS left_rows,
      |  (SELECT COUNT(*) FROM lp) AS left_keys,
      |  (SELECT CAST(MAX(c) AS BIGINT) FROM lp) AS left_max_fanout,
      |  (SELECT CAST(SUM(c) AS BIGINT) FROM pp) AS right_rows,
      |  (SELECT COUNT(*) FROM pp) AS right_keys,
      |  (SELECT CAST(MAX(c) AS BIGINT) FROM pp) AS right_max_fanout,
      |  (SELECT CAST(SUM(lp.c * pp.c) AS BIGINT) FROM lp JOIN pp USING (k)) AS est_join_rows)
      |SELECT * FROM e1 UNION ALL SELECT * FROM e2 ORDER BY edge""".stripMargin) { (s, d) =>
    def audit(edge: String, left: org.apache.spark.sql.DataFrame, lk: String,
              right: org.apache.spark.sql.DataFrame, rk: String): org.apache.spark.sql.DataFrame = {
      val lc = left.groupBy(col(lk).as("k")).agg(count(lit(1)).as("c"))
      val rc = right.groupBy(col(rk).as("k")).agg(count(lit(1)).as("c2"))
      val lStats = lc.agg(sum(col("c")).cast("long").as("left_rows"),
        count(lit(1)).as("left_keys"), max(col("c")).cast("long").as("left_max_fanout"))
      val rStats = rc.agg(sum(col("c2")).cast("long").as("right_rows"),
        count(lit(1)).as("right_keys"), max(col("c2")).cast("long").as("right_max_fanout"))
      val est = lc.join(rc, "k")
        .agg(sum(col("c") * col("c2")).cast("long").as("est_join_rows"))
      lStats.crossJoin(broadcast(rStats)).crossJoin(broadcast(est))
        .select(lit(edge).as("edge"), col("left_rows"), col("left_keys"),
          col("left_max_fanout"), col("right_rows"), col("right_keys"),
          col("right_max_fanout"), col("est_join_rows"))
    }
    audit("lineitem-orders", T.lineitem(s, d), "l_orderkey", T.orders(s, d), "o_orderkey")
      .unionByName(
        audit("lineitem-part", T.lineitem(s, d), "l_partkey", T.part(s, d), "p_partkey"))
      .orderBy("edge")
  }

  /** Join-key skew audit: the top-10 heaviest keys of a shuffle key with
    * their row share and a per-key salt recommendation — salt_factor =
    * ceil(cnt·P/N), the bucket count that brings the key's heaviest
    * partition back to the average (P = 32, the session's shuffle
    * parallelism). The output feeds [[SkewOps.saltedJoin]] directly;
    * AQE's skew-join split handles the runtime half, this is the
    * planning half (pre-declared salting survives plan shapes AQE can't
    * split, e.g. aggregations). One key-count aggregation + a broadcast
    * of the 1-row total — key-cardinality sized, never the fact table. */
  val qSkewAudit: Q = Q(
    "q_skew_audit",
    """WITH c AS (SELECT l_partkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c)
      |SELECT key, CAST(cnt AS BIGINT) AS cnt,
      |  round(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share,
      |  CAST(CEIL(CAST(cnt AS DOUBLE) * 32 / CAST(n AS DOUBLE)) AS BIGINT) AS salt_factor
      |FROM c, t
      |ORDER BY cnt DESC, key LIMIT 10""".stripMargin) { (s, d) =>
    val c = T.lineitem(s, d).groupBy(col("l_partkey").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val t = c.agg(sum(col("cnt")).cast("long").as("n"))
    c.crossJoin(broadcast(t))
      .select(col("key"), col("cnt"),
        round(dbl(col("cnt")) / dbl(col("n")), 6).as("share"),
        lng(ceil(dbl(col("cnt")) * 32 / dbl(col("n")))).as("salt_factor"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(10)
  }

  /** Pairwise Jensen-Shannon divergence between per-source token
    * distributions over the global top-40 vocabulary — the domain-shift
    * matrix (which feeds changed dialect vs last release / vs each
    * other). JS over a fixed shared support handles zeros (unlike KL)
    * and is symmetric and bounded [0, 1] in log2.
    *
    * Shape: one token-count shuffle builds the global top-V (broadcast),
    * one (source, token) count, then everything is model-sized — the
    * S×V grid with zero fill, a V-keyed pair join, and the per-pair term
    * sum. Terms are rounded to 12 dp and summed as DECIMAL (the
    * q_entropy recipe), so the matrix is partition-order exact. At very
    * large source counts, block the pair join by source-pair ranges —
    * the grid side stays model-sized regardless of corpus bytes. */
  val qSourceDivergence: Q = Q(
    "q_source_divergence",
    """WITH tk AS (SELECT source, token FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token <> ''),
      |topv AS (SELECT token FROM (SELECT token, COUNT(*) AS c FROM tk GROUP BY 1)
      |         ORDER BY c DESC, token LIMIT 40),
      |st AS (SELECT source, token, COUNT(*) AS c FROM tk JOIN topv USING (token) GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM st GROUP BY 1),
      |grid AS (SELECT t.source, v.token,
      |           CAST(COALESCE(st.c, 0) AS DOUBLE) / CAST(t.n AS DOUBLE) AS p
      |         FROM tot t CROSS JOIN topv v
      |         LEFT JOIN st ON st.source = t.source AND st.token = v.token),
      |pr AS (SELECT a.source AS src_a, b.source AS src_b, a.p AS pa, b.p AS pb
      |       FROM grid a JOIN grid b ON a.token = b.token AND a.source < b.source),
      |term AS (SELECT src_a, src_b, CAST(round(
      |    CASE WHEN pa > 0 THEN pa / 2 * log2(pa / ((pa + pb) / 2)) ELSE 0 END +
      |    CASE WHEN pb > 0 THEN pb / 2 * log2(pb / ((pa + pb) / 2)) ELSE 0 END,
      |  12) AS DECIMAL(18,12)) AS trm FROM pr)
      |SELECT src_a, src_b, round(CAST(SUM(trm) AS DOUBLE), 6) AS js_divergence
      |FROM term GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    val v = 40
    val tk = T.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val topv = tk.groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(v).select("token")
    val st = tk.join(broadcast(topv), "token")
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
    val tot = st.groupBy("source").agg(sum(col("c")).cast("long").as("n"))
    val grid = tot.crossJoin(broadcast(topv))
      .join(st, Seq("source", "token"), "left")
      .select(col("source"), col("token"),
        (dbl(coalesce(col("c"), lit(0L))) / dbl(col("n"))).as("p"))
    val pr = grid.select(col("source").as("src_a"), col("token"), col("p").as("pa"))
      .join(grid.select(col("source").as("src_b"), col("token"), col("p").as("pb")), "token")
      .filter(col("src_a") < col("src_b"))
    val m = (col("pa") + col("pb")) / 2
    val term = round(
      when(col("pa") > 0, col("pa") / 2 * log2(col("pa") / m)).otherwise(0.0) +
        when(col("pb") > 0, col("pb") / 2 * log2(col("pb") / m)).otherwise(0.0),
      12).cast(DecimalType(18, 12))
    pr.select(col("src_a"), col("src_b"), term.as("trm"))
      .groupBy("src_a", "src_b")
      .agg(round(dbl(sum(col("trm"))), 6).as("js_divergence"))
      .orderBy("src_a", "src_b")
  }

  /** k-anonymity audit over quasi-identifiers (release governance): how
    * many records sit in equivalence classes smaller than k — the
    * re-identification risk screen a data release runs BEFORE publishing
    * (the reference gates human-subject expression data behind exactly
    * this kind of aggregation review; a training-data release has the
    * same duty for user-shaped records). Quasi-identifier here:
    * (nation, market segment, account-balance bucket). Two aggregations
    * — class sizes, then the size-band rollup; the per-class table is
    * the only corpus-keyed shuffle, band math is band-count-sized. */
  val qKanon: Q = Q(
    "q_kanon",
    """WITH cls AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,
      |    COUNT(*) AS sz
      |  FROM customer GROUP BY 1, 2, 3),
      |bands AS (
      |  SELECT CASE WHEN sz = 1 THEN '1_unique'
      |              WHEN sz < 5 THEN '2-4_small'
      |              WHEN sz < 10 THEN '5-9_k5ok'
      |              ELSE '10+_anon' END AS band,
      |    COUNT(*) AS n_classes, CAST(SUM(sz) AS BIGINT) AS n_rows
      |  FROM cls GROUP BY 1)
      |SELECT band, n_classes, n_rows,
      |  round(CAST(n_rows AS DOUBLE) / SUM(CAST(n_rows AS DOUBLE)) OVER (), 6) AS pct_rows
      |FROM bands ORDER BY band""".stripMargin) { (s, d) =>
    val cls = T.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 100).as("bal_bucket"))
      .agg(count(lit(1)).as("sz"))
    val bands = cls
      .groupBy(when(col("sz") === 1, "1_unique")
        .when(col("sz") < 5, "2-4_small")
        .when(col("sz") < 10, "5-9_k5ok")
        .otherwise("10+_anon").as("band"))
      .agg(count(lit(1)).as("n_classes"), sum(col("sz")).as("n_rows"))
    bands
      .withColumn("pct_rows", round(dbl(col("n_rows")) /
        sum(dbl(col("n_rows"))).over(
          org.apache.spark.sql.expressions.Window.partitionBy()), 6))
      .orderBy("band")
  }

  /** Per-source bootstrap confidence interval for mean document length —
    * RNG-free Poisson bootstrap (Chamandy et al., "Estimating Uncertainty
    * for Massive Data Streams", Google 2012): replica b includes each doc
    * with weight ~ Poisson(1), derived DETERMINISTICALLY from the first 4
    * md5 hex chars of (doc_id, b) against the Poisson CDF thresholds —
    * so both engines, and any partitioning, build the identical replicas.
    *
    * Scale shape: the 32-replica explode is map-side (32× row fanout of
    * just (source, b, w, x)); one (source, b) aggregation computes exact
    * integer replica sums; the per-source rollup sorts a bounded 32-value
    * list. The point estimate is decimal-exact over the real data; the
    * CI bounds are SORTED PICKS (2nd / 31st of 32 replica means), never
    * an order-dependent float reduction. At 100 TB the replica table is
    * the only fanout and it's a pure projection — the uncertainty of any
    * corpus-scale mean costs 32 map-side weights, no second scan. */
  val qBootstrapCi: Q = Q(
    "q_bootstrap_ci",
    """WITH rep AS (SELECT d.source, b.b, d.doc_id, d.n_chars,
      |    CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 4) < '5e2d' THEN 0
      |         WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 4) < 'bc5e' THEN 1
      |         WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 4) < 'eb79' THEN 2
      |         WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 4) < 'fb2b' THEN 3
      |         WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 4) < 'ff10' THEN 4
      |         WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 4) < 'ffd9' THEN 5
      |         ELSE 6 END AS w
      |  FROM documents d, (SELECT unnest(range(0, 32)) AS b) b),
      |means AS (SELECT source, b,
      |    round(CAST(SUM(w * n_chars) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6) AS m
      |  FROM rep GROUP BY 1, 2 HAVING SUM(w) > 0),
      |pick AS (SELECT source, list_sort(list(m)) AS ms FROM means GROUP BY 1)
      |SELECT d.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  round(CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_chars,
      |  ANY_VALUE(p.ms[least(2, len(p.ms))]) AS ci_lo,
      |  ANY_VALUE(p.ms[greatest(len(p.ms) - 1, 1)]) AS ci_hi
      |FROM documents d JOIN pick p USING (source)
      |GROUP BY d.source ORDER BY source""".stripMargin) { (s, d) =>
    val key = concat(col("doc_id").cast("string"), lit("_"), col("b").cast("string"))
    val h4 = substring(md5(key), 1, 4)
    val w = when(h4 < "5e2d", 0).when(h4 < "bc5e", 1).when(h4 < "eb79", 2)
      .when(h4 < "fb2b", 3).when(h4 < "ff10", 4).when(h4 < "ffd9", 5).otherwise(6)
    val docs = T.documents(s, d)
    val rep = docs
      .select(col("source"), col("doc_id"), col("n_chars"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("w", w.cast("long"))
    val means = rep.groupBy("source", "b")
      .agg(sum(col("w") * col("n_chars")).as("swx"), sum(col("w")).as("sw"))
      .filter(col("sw") > 0)
      .select(col("source"), round(dbl(col("swx")) / dbl(col("sw")), 6).as("m"))
    // picks index the SURVIVING replica list: tiny sources can drop
    // zero-weight replicas (P(sum w = 0) = e^-n per replica), and a fixed
    // ms[31] would go NULL there — 2nd-smallest / 2nd-largest of the
    // survivors degrades gracefully and equals ms[2]/ms[31] at full 32
    val pick = means.groupBy("source")
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .select(col("source"),
        element_at(col("ms"), least(lit(2), size(col("ms")))).as("ci_lo"),
        element_at(col("ms"), greatest(size(col("ms")) - 1, lit(1))).as("ci_hi"))
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(sumDbl(col("n_chars").cast(DecimalType(18, 2))) / dbl(count(lit(1))), 6)
          .as("mean_chars"))
      .join(pick, "source")
      .select(col("source"), col("n_docs"), col("mean_chars"),
        col("ci_lo"), col("ci_hi"))
      .orderBy("source")
  }

  /** Pairwise Welch t-test between event types on the value metric — the
    * A/B-comparison primitive (unequal variances, Welch–Satterthwaite
    * df). Every input moment is an EXACT decimal sum (value is exact at
    * 2dp, its square at 4dp), so the doubles appear only in the final
    * per-pair scalar math — deterministic cross-engine at any
    * partitioning. One corpus aggregation to a #groups-row moment table;
    * the pair grid is model-sized. `significant` uses the z≈1.96 5%
    * threshold (all groups here have n ≫ 30, where t ≈ z). */
  val qAbTest: Q = Q(
    "q_ab_test",
    """WITH m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(CAST(value AS DECIMAL(12,2))) AS s,
      |    SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS sq
      |  FROM events GROUP BY 1),
      |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    a.n AS na, b.n AS nb,
      |    CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS ma,
      |    CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS mb,
      |    (CAST(a.sq AS DOUBLE) - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)) / CAST(a.n - 1 AS DOUBLE) AS va,
      |    (CAST(b.sq AS DOUBLE) - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)) / CAST(b.n - 1 AS DOUBLE) AS vb
      |  FROM m a JOIN m b ON a.event_type < b.event_type
      |  WHERE a.n >= 2 AND b.n >= 2)
      |SELECT type_a, type_b, na, nb,
      |  round(ma - mb, 6) AS mean_diff,
      |  round((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
      |  round(((va / na + vb / nb) * (va / na + vb / nb))
      |    / ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1)), 6) AS df_welch,
      |  (abs((ma - mb) / sqrt(va / na + vb / nb)) > 1.96) AS significant
      |FROM p ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
    // n >= 2 guard: a singleton group's n-1 sample variance divides by
    // zero (NaN/Inf propagating into t/df, engine-dependent) — such
    // groups can't support a variance estimate and are excluded from
    // the pair grid in both engines
    val m = T.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).as("s"),
        sum(dec2(col("value")) * dec2(col("value"))).as("sq"))
      .filter(col("n") >= 2)
    def side(p: String) = m.select(
      col("event_type").as(s"type_$p"), col("n").as(s"n$p"),
      (dbl(col("s")) / dbl(col("n"))).as(s"m$p"),
      ((dbl(col("sq")) - dbl(col("s")) * dbl(col("s")) / dbl(col("n")))
        / dbl(col("n") - 1)).as(s"v$p"))
    val se2 = col("va") / dbl(col("na")) + col("vb") / dbl(col("nb"))
    side("a").join(side("b"), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        round(col("ma") - col("mb"), 6).as("mean_diff"),
        round((col("ma") - col("mb")) / sqrt(se2), 6).as("t_stat"),
        round((se2 * se2)
          / ((col("va") / dbl(col("na"))) * (col("va") / dbl(col("na"))) / dbl(col("na") - 1)
            + (col("vb") / dbl(col("nb"))) * (col("vb") / dbl(col("nb"))) / dbl(col("nb") - 1)), 6)
          .as("df_welch"),
        (abs((col("ma") - col("mb")) / sqrt(se2)) > 1.96).as("significant"))
      .orderBy("type_a", "type_b")
  }

  /** Pairwise Mann–Whitney U (rank-sum) test between event types — the
    * NON-PARAMETRIC complement to [[qAbTest]]: rank-based, so a skewed
    * or heavy-tailed metric can't mislead it the way it can a t-test.
    * Deterministic by construction: tie handling uses midranks computed
    * from VALUE COUNTS (rank_avg = below + (ties+1)/2), never a
    * tie-arbitrary ROW_NUMBER, and DOUBLED rank sums stay exact in pure
    * BIGINT (2^63) until the final z. Shuffle shape: ONE corpus
    * aggregation to (type, value) counts; only that distinct-sized
    * rollup fans into the G(G−1)/2 pair grid, then one bounded window
    * over DISTINCT values per pair and a pair-sized rollup. z uses the normal approximation without tie correction
    * (documented; groups here are n ≫ 20 with modest ties). */
  val qRankSum: Q = Q(
    "q_rank_sum",
    """WITH t AS (SELECT DISTINCT event_type FROM events),
      |p AS (SELECT a.event_type AS ta, b.event_type AS tb
      |      FROM t a JOIN t b ON a.event_type < b.event_type),
      |c AS (SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
      |        CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
      |vals AS (SELECT p.ta, p.tb, c.v,
      |    CAST(SUM(c.cnt) AS BIGINT) AS cnt,
      |    CAST(SUM(CASE WHEN c.event_type = p.ta THEN c.cnt ELSE 0 END) AS BIGINT) AS cnt_a
      |  FROM c JOIN p ON c.event_type IN (p.ta, p.tb) GROUP BY 1, 2, 3),
      |rk AS (SELECT ta, tb, v, cnt, cnt_a,
      |    COALESCE(CAST(SUM(cnt) OVER (PARTITION BY ta, tb ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS below
      |  FROM vals),
      |agg AS (SELECT ta, tb,
      |    CAST(SUM(cnt_a) AS BIGINT) AS na,
      |    CAST(SUM(cnt - cnt_a) AS BIGINT) AS nb,
      |    CAST(SUM(cnt_a * (2 * below + cnt + 1)) AS BIGINT) AS ra2
      |  FROM rk GROUP BY 1, 2)
      |SELECT ta AS type_a, tb AS type_b, na, nb,
      |  CAST(ra2 - na * (na + 1) AS DOUBLE) / 2 AS u_stat,
      |  round((CAST(ra2 - na * (na + 1) AS DOUBLE) / 2 - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2)
      |    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1) / 12), 6) AS z,
      |  round(CAST(ra2 - na * (na + 1) AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) - 1.0, 6) AS cliffs_delta,
      |  (abs((CAST(ra2 - na * (na + 1) AS DOUBLE) / 2 - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2)
      |    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1) / 12)) > 1.96) AS significant
      |FROM agg ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
    // one corpus aggregation to (type, value) counts FIRST; only that
    // distinct-(type,value)-sized rollup fans into the pair grid (the
    // raw-row fanout a review flagged is gone)
    val cTab = T.events(s, d)
      .groupBy(col("event_type"), dec2(col("value")).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val t = cTab.select("event_type").distinct()
    val p = t.select(col("event_type").as("ta"))
      .join(t.select(col("event_type").as("tb")), col("ta") < col("tb"))
    val evp = cTab.join(broadcast(p),
      col("event_type") === col("ta") || col("event_type") === col("tb"))
    val vals = evp.groupBy("ta", "tb", "v")
      .agg(sum(col("cnt")).as("cnt"),
        sum(when(col("event_type") === col("ta"), col("cnt")).otherwise(0L)).as("cnt_a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ta", "tb").orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val rk = vals.withColumn("below", coalesce(sum(col("cnt")).over(w), lit(0L)))
    // ra2 = 2·Σ cnt_a·midrank kept in pure BIGINT (integer-exact to 2^63;
    // the review showed DuckDB decimal division silently degrades to
    // DOUBLE, so half-integer DECIMAL sums were only 2^53-exact there)
    val agg = rk.groupBy("ta", "tb")
      .agg(sum(col("cnt_a")).as("na"),
        sum(col("cnt") - col("cnt_a")).as("nb"),
        sum(col("cnt_a") * (lit(2) * col("below") + col("cnt") + 1)).as("ra2"))
    val u = dbl(col("ra2") - col("na") * (col("na") + 1)) / 2
    val z = (u - dbl(col("na")) * dbl(col("nb")) / 2) /
      sqrt(dbl(col("na")) * dbl(col("nb")) * (dbl(col("na")) + dbl(col("nb")) + 1) / 12)
    // Cliff's delta = 2U/(na·nb) − 1: the EFFECT SIZE the z-flag lacks
    // (P(a > b) − P(b > a) under random draws; ±1 = total separation)
    val delta = round(dbl(col("ra2") - col("na") * (col("na") + 1))
      / (dbl(col("na")) * dbl(col("nb"))) - 1.0, 6)
    agg.select(col("ta").as("type_a"), col("tb").as("type_b"), col("na"), col("nb"),
        u.as("u_stat"), round(z, 6).as("z"), delta.as("cliffs_delta"),
        (abs(z) > 1.96).as("significant"))
      .orderBy("type_a", "type_b")
  }

  /** Benjamini–Hochberg FDR correction over the pairwise rank-sum grid:
    * with G groups there are G(G−1)/2 simultaneous tests, and the raw
    * |z| > 1.96 flags of [[qRankSum]] inflate false positives — BH is
    * the standard step-up fix (reject the ranks up to the largest i with
    * p_i ≤ i·q/m, q = 0.05). Two-sided p from the repo's logistic Φ
    * approximation (the same form q_gaussian_cdf uses, computed from the
    * ROUNDED z so both engines agree bit-for-bit). reject_raw repeats
    * [[qRankSum]]'s |z| > 1.96 flag VERBATIM (not a p-threshold — under
    * the logistic Φ, p ≤ 0.05 ⇔ |z| ≥ ~2.15, which would disagree with
    * the flag this query documents itself as correcting). Everything after
    * [[qRankSum]]'s aggregation is a window over the m-row test grid —
    * model-sized at any corpus scale. */
  val qFdrCorrection: Q = Q(
    "q_fdr_correction",
    """WITH t AS (SELECT DISTINCT event_type FROM events),
      |p AS (SELECT a.event_type AS ta, b.event_type AS tb
      |      FROM t a JOIN t b ON a.event_type < b.event_type),
      |c AS (SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
      |        CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
      |vals AS (SELECT p.ta, p.tb, c.v,
      |    CAST(SUM(c.cnt) AS BIGINT) AS cnt,
      |    CAST(SUM(CASE WHEN c.event_type = p.ta THEN c.cnt ELSE 0 END) AS BIGINT) AS cnt_a
      |  FROM c JOIN p ON c.event_type IN (p.ta, p.tb) GROUP BY 1, 2, 3),
      |rk AS (SELECT ta, tb, v, cnt, cnt_a,
      |    COALESCE(CAST(SUM(cnt) OVER (PARTITION BY ta, tb ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS below
      |  FROM vals),
      |agg AS (SELECT ta, tb,
      |    CAST(SUM(cnt_a) AS BIGINT) AS na,
      |    CAST(SUM(cnt - cnt_a) AS BIGINT) AS nb,
      |    CAST(SUM(cnt_a * (2 * below + cnt + 1)) AS BIGINT) AS ra2
      |  FROM rk GROUP BY 1, 2),
      |zt AS (SELECT ta, tb,
      |    round((CAST(ra2 - na * (na + 1) AS DOUBLE) / 2 - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2)
      |      / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1) / 12), 6) AS z
      |  FROM agg),
      |pv AS (SELECT ta, tb, z,
      |    round(2.0 * (1.0 - 1.0 / (1.0 + exp(-(1.702 * abs(z))))), 6) AS p_raw FROM zt),
      |rp AS (SELECT ta, tb, z, p_raw,
      |    CAST(ROW_NUMBER() OVER (ORDER BY p_raw, ta, tb) AS BIGINT) AS p_rank,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS m FROM pv),
      |mx AS (SELECT COALESCE(MAX(CASE WHEN p_raw <= 0.05 * p_rank / m THEN p_rank END), 0) AS kmax FROM rp),
      |ct AS (SELECT COALESCE(MAX(CASE WHEN p_rank <= kmax THEN p_raw END), -1.0) AS p_cut
      |       FROM rp CROSS JOIN mx)
      |SELECT ta AS type_a, tb AS type_b, z, p_raw, p_rank,
      |  round(0.05 * p_rank / m, 6) AS bh_threshold,
      |  (abs(z) > 1.96) AS reject_raw,
      |  (p_raw <= p_cut) AS reject_bh
      |FROM rp CROSS JOIN ct ORDER BY p_rank, type_a, type_b""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
    val zdf = qRankSum.fn(s, d).select(
      col("type_a").as("ta"), col("type_b").as("tb"), col("z"))
    val pv = zdf.withColumn("p_raw",
      round(lit(2.0) * (lit(1.0) - lit(1.0) / (lit(1.0) + exp(-(lit(1.702) * abs(col("z")))))), 6))
    val rp = pv
      .withColumn("p_rank",
        row_number().over(w.orderBy(col("p_raw"), col("ta"), col("tb"))).cast("long"))
      .withColumn("m", count(lit(1)).over(w.partitionBy()).cast("long"))
    val kmax = coalesce(max(when(col("p_raw") <= lit(0.05) * col("p_rank") / col("m"),
      col("p_rank"))).over(w.partitionBy()), lit(0L))
    // canonical BH rejects on the p-VALUE at rank kmax, not the rank:
    // ranks among tied p_raw are arbitrary, so two identical p values
    // could otherwise straddle kmax and get different reject flags
    val pCut = coalesce(max(when(col("p_rank") <= col("kmax"),
      col("p_raw"))).over(w.partitionBy()), lit(-1.0))
    rp.withColumn("kmax", kmax)
      .withColumn("p_cut", pCut)
      .select(col("ta").as("type_a"), col("tb").as("type_b"), col("z"),
        col("p_raw"), col("p_rank"),
        round(lit(0.05) * col("p_rank") / col("m"), 6).as("bh_threshold"),
        (abs(col("z")) > 1.96).as("reject_raw"),
        (col("p_raw") <= col("p_cut")).as("reject_bh"))
      .orderBy("p_rank", "type_a", "type_b")
  }

  val all: Seq[Q] = Seq(qWinsorize, qHhi, qVocabOverlap, qJoinAudit, qSkewAudit,
    qSourceDivergence, qKanon, qBootstrapCi, qAbTest, qRankSum, qFdrCorrection)
}
