package graft.operators

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-5 analytics: Pareto/skyline frontier, serving-layer
  * autocomplete, distribution-drift (PSI) monitoring, and event-type
  * transition matrices. All fully DuckDB-oracled.
  *
  * Scale notes per operator are inline; the common theme is that nothing
  * here introduces a global single-partition window — the skyline reuses
  * the distributed two-pass prefix pattern proven on q_vocab_coverage.
  */
object Analytics2 {

  /** 2-D skyline / Pareto frontier over parts: minimize price, maximize
    * size — a part survives iff nothing is (≤ price, ≥ size) with at
    * least one strict. Reference analog: "best target per criteria
    * pair" screens in the TCRD app's ranked listings (tcrd_app.py).
    *
    * Distributed form (no O(n²) dominance join, no global window):
    *  1. collapse to one row per price with the max size (one shuffle);
    *  2. exclusive prefix-max of size over price-ascending order as a
    *     range-partitioned two-pass: per-partition local prefix via a
    *     pid-bounded window + P-row broadcast offsets (the
    *     q_vocab_coverage pattern — the per-price table is vocab-sized,
    *     far smaller than parts, but still distributed);
    *  3. frontier prices = max-size rows strictly above every cheaper
    *     price's best size; join back to parts (price, size) to recover
    *     the surviving rows (duplicates on both dims survive together,
    *     matching the NOT EXISTS oracle).
    */
  val qSkyline: Q = Q(
    "q_skyline",
    """SELECT p.p_partkey, p.p_retailprice, p.p_size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p_retailprice, p_partkey""".stripMargin) { (s, d) =>
    val nParts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val part = T.part(s, d)
    val pm = part.groupBy("p_retailprice").agg(max(col("p_size")).as("msize"))
    // two-pass exclusive prefix-max over price-ascending order; pinned
    // once so the offset branch and the local-window branch provably see
    // the same range boundaries
    val parted = pm.repartitionByRange(nParts, col("p_retailprice").asc)
      .withColumn("pid", spark_partition_id().cast("long"))
      .localCheckpoint(true)
    val offsets = {
      val pstats = parted.groupBy("pid").agg(max(col("msize")).as("p_max"))
      pstats.as("a")
        .join(pstats.as("b"), col("b.pid") < col("a.pid"), "left")
        .groupBy(col("a.pid").as("pid"))
        .agg(max(col("b.p_max")).as("max_off")) // null for pid 0
    }
    val wLocal = Window.partitionBy("pid").orderBy(col("p_retailprice").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierPrices = parted
      .withColumn("lmax", max(col("msize")).over(wLocal)) // null on first row
      .join(broadcast(offsets), "pid")
      .withColumn("emax", greatest(coalesce(col("lmax"), lit(Int.MinValue)),
        coalesce(col("max_off"), lit(Int.MinValue))))
      .filter(col("msize") > col("emax"))
      .select(col("p_retailprice").as("f_price"), col("msize").as("f_size"))
    part.join(frontierPrices,
        col("p_retailprice") === col("f_price") && col("p_size") === col("f_size"))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy("p_retailprice", "p_partkey")
  }

  /** Serving-layer autocomplete: top-3 completions per 3-char prefix by
    * corpus frequency. One token-count shuffle + one prefix-partitioned
    * rank — the rank windows are bounded per prefix (and the
    * row_number()<=k shape is exactly what rule_topk_rewrite turns into
    * the heap-pruning TopKPerKey plan at scale). Reference analog: the
    * search endpoint's find-as-you-type listing (tcrd_app.py). */
  val qAutocomplete: Q = Q(
    "q_autocomplete",
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      |c AS (SELECT token, COUNT(*) AS cnt FROM t WHERE len(token) >= 3 GROUP BY 1),
      |r AS (SELECT substr(token, 1, 3) AS prefix, token, cnt,
      |  ROW_NUMBER() OVER (PARTITION BY substr(token, 1, 3)
      |                     ORDER BY cnt DESC, token) AS rn
      |  FROM c)
      |SELECT prefix, token, cnt, rn FROM r WHERE rn <= 3
      |ORDER BY prefix, rn""".stripMargin) { (s, d) =>
    val c = T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) >= 3)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("prefix", substring(col("token"), 1, 3))
    val w = Window.partitionBy("prefix").orderBy(col("cnt").desc, col("token"))
    c.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("prefix", "token", "cnt", "rn")
      .orderBy("prefix", "rn")
  }

  /** Population-stability-index drift per corpus source: each source's
    * language mix vs the corpus-wide mix, psi = Σ (p_s−p_g)·ln(p_s/p_g)
    * over the languages the source actually has. The standard
    * training-data monitoring screen ("did source X's composition move").
    *
    * Two aggregations (source×lang, lang) + broadcast joins of the
    * lang-cardinality sides; per-term rounding + DECIMAL summation keeps
    * the score order-independent and cross-engine exact (§5 recipe). */
  val qDistDrift: Q = Q(
    "q_dist_drift",
    """WITH s AS (SELECT source, lang, COUNT(*) AS scnt FROM documents GROUP BY 1, 2),
      |st AS (SELECT source, CAST(SUM(scnt) AS BIGINT) AS stot FROM s GROUP BY 1),
      |g AS (SELECT lang, COUNT(*) AS gcnt FROM documents GROUP BY 1),
      |gt AS (SELECT COUNT(*) AS gtot FROM documents),
      |terms AS (
      |  SELECT s.source,
      |    CAST(round((CAST(scnt AS DOUBLE) / stot - CAST(gcnt AS DOUBLE) / gtot)
      |      * ln((CAST(scnt AS DOUBLE) / stot) / (CAST(gcnt AS DOUBLE) / gtot)),
      |      6) AS DECIMAL(18,6)) AS term
      |  FROM s JOIN st USING (source) JOIN g USING (lang) CROSS JOIN gt)
      |SELECT source, COUNT(*) AS n_langs,
      |  round(CAST(SUM(term) AS DOUBLE), 6) AS psi
      |FROM terms GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val sl = docs.groupBy("source", "lang").agg(count(lit(1)).as("scnt"))
    val st = sl.groupBy("source").agg(sum(col("scnt")).as("stot"))
    val g = docs.groupBy("lang").agg(count(lit(1)).as("gcnt"))
    val gt = docs.agg(count(lit(1)).as("gtot"))
    val ps = dbl(col("scnt")) / dbl(col("stot"))
    val pg = dbl(col("gcnt")) / dbl(col("gtot"))
    sl.join(st, "source")
      .join(broadcast(g), "lang")
      .crossJoin(broadcast(gt))
      .select(col("source"),
        round((ps - pg) * log(ps / pg), 6).cast(DecimalType(18, 6)).as("term"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_langs"), round(dbl(sum(col("term"))), 6).as("psi"))
      .orderBy("source")
  }

  /** Event-type transition matrix (first-order Markov table): counts and
    * MLE probabilities of type→type steps within each user's timeline.
    * One user-partitioned lead window + one pair shuffle — the same
    * bounded-window shape as q_bigram_lm, over the event stream. */
  val qEventTransitions: Q = Q(
    "q_event_transitions",
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
      |x AS (SELECT event_type AS cur,
      |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS nxt
      |  FROM e),
      |c AS (SELECT cur, nxt, COUNT(*) AS cnt FROM x WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT cur, CAST(SUM(cnt) AS BIGINT) AS ctot FROM c GROUP BY 1)
      |SELECT cur, nxt, cnt, round(CAST(cnt AS DOUBLE) / CAST(ctot AS DOUBLE), 6) AS prob
      |FROM c JOIN t USING (cur) ORDER BY cur, nxt""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val c = T.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"),
        col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("cnt"))
    val t = c.groupBy("cur").agg(sum(col("cnt")).as("ctot"))
    c.join(broadcast(t), "cur")
      .select(col("cur"), col("nxt"), col("cnt"),
        round(dbl(col("cnt")) / dbl(col("ctot")), 6).as("prob"))
      .orderBy("cur", "nxt")
  }

  /** Serving-layer detail page (the tcrd_app.py target-detail endpoint
    * shape): for every supplier in one nation — attributes, #distinct
    * parts supplied, exact total revenue, a top-3 parts roster (revenue-
    * ranked, name tie-break, rendered as one deterministic string), and
    * the supplier's revenue rank within the nation. One lineitem
    * aggregation feeds everything; the final rank window runs over a
    * dim-bounded set (suppliers of one nation), never over fact rows —
    * at 100 TB that window sees ~10²–10³ rows. */
  val qDetailPage: Q = Q(
    "q_detail_page",
    """WITH sup AS (SELECT s_suppkey, s_name, s_acctbal FROM supplier
      |             JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_19'),
      |rev AS (SELECT l_suppkey, l_partkey,
      |          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |               * (1.00 - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(18,4)) AS prev
      |        FROM lineitem JOIN sup ON l_suppkey = s_suppkey GROUP BY 1, 2),
      |agg AS (SELECT l_suppkey, CAST(SUM(prev) AS DECIMAL(18,4)) AS total_rev,
      |               COUNT(*) AS n_parts FROM rev GROUP BY 1),
      |ranked AS (SELECT l_suppkey, prev, p_name,
      |             ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY prev DESC, p_name) AS rn
      |           FROM rev JOIN part ON p_partkey = l_partkey),
      |top3 AS (SELECT l_suppkey, string_agg(p_name, '; ' ORDER BY prev DESC, p_name) AS top_parts
      |         FROM ranked WHERE rn <= 3 GROUP BY 1)
      |SELECT s.s_suppkey, s.s_name, s.s_acctbal, a.n_parts,
      |       CAST(a.total_rev AS DOUBLE) AS total_rev, t.top_parts,
      |       RANK() OVER (ORDER BY a.total_rev DESC, s.s_suppkey) AS rev_rank
      |FROM sup s JOIN agg a ON a.l_suppkey = s.s_suppkey
      |JOIN top3 t ON t.l_suppkey = s.s_suppkey
      |ORDER BY rev_rank, s_suppkey""".stripMargin) { (s, d) =>
    val sup = T.supplier(s, d)
      .join(broadcast(T.nation(s, d).filter(col("n_name") === "NATION_19")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal")
    val rev = T.lineitem(s, d)
      .join(broadcast(sup.select(col("s_suppkey").as("__sk"))),
        col("l_suppkey") === col("__sk"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast(DecimalType(18, 4)).as("prev"))
    val agg = rev.groupBy("l_suppkey")
      .agg(sum(col("prev")).cast(DecimalType(18, 4)).as("total_rev"),
        count(lit(1)).as("n_parts"))
    val wSupp = Window.partitionBy("l_suppkey").orderBy(col("prev").desc, col("p_name"))
    val top3 = rev
      .join(broadcast(T.part(s, d).select(col("p_partkey"), col("p_name"))),
        col("p_partkey") === col("l_partkey"))
      .withColumn("rn", row_number().over(wSupp))
      .filter(col("rn") <= 3)
      .groupBy("l_suppkey")
      .agg(array_join(transform(
        sort_array(collect_list(struct((-col("prev")).as("np"), col("p_name")))),
        x => x.getField("p_name")), "; ").as("top_parts"))
    // dim-bounded rank: one nation's suppliers, never fact-sized
    val wRank = Window.orderBy(col("total_rev").desc, col("s_suppkey"))
    sup.join(agg, col("s_suppkey") === agg("l_suppkey")).drop("l_suppkey")
      .join(top3, col("s_suppkey") === top3("l_suppkey")).drop("l_suppkey")
      .withColumn("rev_rank", lng(rank().over(wRank)))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_parts"),
        dbl(col("total_rev")).as("total_rev"), col("top_parts"), col("rev_rank"))
      .orderBy("rev_rank", "s_suppkey")
  }

  val all: Seq[Q] = Seq(qSkyline, qAutocomplete, qDistDrift, qEventTransitions,
    qDetailPage)
}
