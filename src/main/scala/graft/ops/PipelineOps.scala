package graft.ops

import graft.Q
import graft.functions.Exact._
import graft.functions.VectorFunctions
import graft.sources.{Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** LLM-data-pipeline operators: LM perplexity scoring (MLE and
  * Kneser-Ney), incremental (cross-corpus) dedup, embedding-space
  * clustering, and the full mixture-planning family — q_mix_plan
  * (weights GIVEN), q_mix_temperature (weights = share^alpha, Conneau &
  * Lample 2019), q_mix_reweight (weights LEARNED, DoReMi-shaped), and
  * q_unimax (budget split FAIRLY under epoch caps, Chung et al. 2023).
  * Reference analogs where they exist are cited per operator;
  * perplexity/mix/clustering are the training-data-pipeline mandate
  * (corpus quality filtering, mixture rebalancing, semantic bucketing).
  *
  * Tokenization matches TextAnalysis/Retrieval: single-space split,
  * mirrored by string_split(text, ' ') in the oracles.
  */
object PipelineOps {

  /** Per-document bigram-LM perplexity — the classic LM-based corpus
    * quality filter (docs whose perplexity under a corpus-level n-gram LM
    * is extreme are boilerplate or garbage). Model = MLE bigram
    * probabilities over the whole corpus (train == score here, so every
    * bigram has nonzero count; a production filter would train on held-out
    * text and smooth — the plan shape is identical).
    *
    * Determinism: each bigram's ln p is a fixed-shape double rounded to
    * 6 dp, per-doc summed as DECIMAL(18,6) (order/partition-invariant),
    * exp/divide as final scalars (the q_bm25 recipe, SURVEY §5).
    *
    * At scale: one doc-partitioned window for adjacency, one bigram-count
    * shuffle for the model, two hash joins doc-bigrams⋈model (both sides
    * shrink before joining: the model is count-aggregated), one per-doc
    * aggregation. No global window, no collect. */
  val qPerplexity: Q = Q(
    "q_perplexity",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |pos AS (SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS ord FROM toks),
      |big AS (SELECT doc_id, t AS cur, LEAD(t) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt FROM pos),
      |bg AS (SELECT doc_id, cur, nxt FROM big WHERE nxt IS NOT NULL),
      |bc AS (SELECT cur, nxt, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
      |cc AS (SELECT cur, CAST(SUM(c2) AS BIGINT) AS c1 FROM bc GROUP BY 1),
      |term AS (SELECT doc_id, round(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)), 6) AS lp
      |         FROM bg JOIN bc USING (cur, nxt) JOIN cc USING (cur)),
      |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
      |               CAST(SUM(CAST(lp AS DECIMAL(18,6))) AS DOUBLE) AS s,
      |               CAST(SUM(CAST(lp AS DECIMAL(18,6))) * -1000000 AS BIGINT) AS t6
      |        FROM term GROUP BY 1)
      |SELECT doc_id, n_bigrams,
      |       CAST(CASE WHEN t6 >= 0 THEN (2 * t6 + n_bigrams) // (2 * n_bigrams)
      |                 ELSE -((2 * (-t6) + n_bigrams) // (2 * n_bigrams)) END AS DOUBLE)
      |         / 1000000.0 AS avg_nll,
      |       round(exp(-s / n_bigrams), 6) AS ppl
      |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pos = T.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("ord", "t")))
    val wDoc = Window.partitionBy("doc_id").orderBy("ord")
    val bg = pos.withColumn("nxt", lead(col("t"), 1).over(wDoc))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), col("t").as("cur"), col("nxt"))
    val bc = bg.groupBy("cur", "nxt").agg(count(lit(1)).as("c2"))
    val cc = bc.groupBy("cur").agg(sum(col("c2")).cast("long").as("c1"))
    val term = bg.join(bc, Seq("cur", "nxt")).join(cc, Seq("cur"))
      .select(col("doc_id"), round(log(dbl(col("c2")) / dbl(col("c1"))), 6).as("lp"))
    // avg_nll via scaled-integer HALF_UP division, NOT round(-s/n, 6):
    // the decimal term sum is cross-engine exact, but a double divide
    // whose quotient lands on a 6-dp rounding boundary resolves the tie
    // differently in the two engines' round() (one row at sf0.1 did —
    // the r13 sweep's 1e-6 avg_nll diff). Integer arithmetic has no tie.
    term.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        dbl(sum(col("lp").cast(DecimalType(18, 6)))).as("s"),
        expr("CAST(SUM(CAST(lp AS DECIMAL(18,6))) * -1000000 AS BIGINT)").as("t6"))
      .select(col("doc_id"), col("n_bigrams"),
        (expr("CAST(CASE WHEN t6 >= 0 THEN (2 * t6 + n_bigrams) DIV (2 * n_bigrams) " +
          "ELSE -((2 * (-t6) + n_bigrams) DIV (2 * n_bigrams)) END AS DOUBLE)")
          / lit(1000000.0)).as("avg_nll"),
        round(exp(-col("s") / col("n_bigrams")), 6).as("ppl"))
      .orderBy("doc_id")
  }

  /** Kneser-Ney smoothed bigram perplexity (Kneser & Ney 1995; the
    * interpolated form of Chen & Goodman 1998 with fixed discount
    * d = 0.75) — the standard LM-quality filter one step up from
    * [[qPerplexity]]'s MLE: mass discounted from seen bigrams is
    * redistributed via the CONTINUATION probability (how many distinct
    * left contexts a word follows — "Francisco" is frequent but follows
    * only "San", so its continuation mass is tiny). Per doc: KN avg
    * negative log-likelihood and perplexity.
    *
    *   p(w2|w1) = (c12 − d)/c1 + d·N1+(w1·)/c1 · N1+(·w2)/N1+(··)
    *
    * (train == score, so c12 ≥ 1 > d and the discount never clips).
    *
    * Same plan budget as q_perplexity plus two model-sized aggregations
    * (distinct-successor / distinct-predecessor counts keyed on single
    * words); per-bigram log terms round to 6 dp and sum as
    * DECIMAL(18,6) — partition-order exact, identical double shape both
    * engines. */
  val qPerplexityKn: Q = Q(
    "q_perplexity_kn",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |pos AS (SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS ord FROM toks),
      |big AS (SELECT doc_id, t AS cur, LEAD(t) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt FROM pos),
      |bg AS (SELECT doc_id, cur, nxt FROM big WHERE nxt IS NOT NULL),
      |bc AS (SELECT cur, nxt, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
      |cc AS (SELECT cur, CAST(SUM(c2) AS BIGINT) AS c1, COUNT(*) AS n1f FROM bc GROUP BY 1),
      |bw AS (SELECT nxt, COUNT(*) AS n1b FROM bc GROUP BY 1),
      |dd AS (SELECT COUNT(*) AS d FROM bc),
      |term AS (SELECT doc_id,
      |    round(ln((CAST(c2 AS DOUBLE) - 0.75) / CAST(c1 AS DOUBLE)
      |      + 0.75 * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE)
      |        * (CAST(n1b AS DOUBLE) / CAST(d AS DOUBLE))), 6) AS lp
      |  FROM bg JOIN bc USING (cur, nxt) JOIN cc USING (cur)
      |  JOIN bw USING (nxt) CROSS JOIN dd),
      |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
      |               CAST(SUM(CAST(lp AS DECIMAL(18,6))) AS DOUBLE) AS s,
      |               CAST(SUM(CAST(lp AS DECIMAL(18,6))) * -1000000 AS BIGINT) AS t6
      |        FROM term GROUP BY 1)
      |SELECT doc_id, n_bigrams,
      |       CAST(CASE WHEN t6 >= 0 THEN (2 * t6 + n_bigrams) // (2 * n_bigrams)
      |                 ELSE -((2 * (-t6) + n_bigrams) // (2 * n_bigrams)) END AS DOUBLE)
      |         / 1000000.0 AS avg_nll,
      |       round(exp(-s / n_bigrams), 6) AS ppl
      |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pos = T.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("ord", "t")))
    val wDoc = Window.partitionBy("doc_id").orderBy("ord")
    val bg = pos.withColumn("nxt", lead(col("t"), 1).over(wDoc))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), col("t").as("cur"), col("nxt"))
    val bc = bg.groupBy("cur", "nxt").agg(count(lit(1)).as("c2"))
    val cc = bc.groupBy("cur").agg(sum(col("c2")).cast("long").as("c1"), count(lit(1)).as("n1f"))
    val bw = bc.groupBy("nxt").agg(count(lit(1)).as("n1b"))
    val dd = bc.agg(count(lit(1)).as("d"))
    val p = (dbl(col("c2")) - 0.75) / dbl(col("c1")) +
      lit(0.75) * dbl(col("n1f")) / dbl(col("c1")) * (dbl(col("n1b")) / dbl(col("d")))
    val term = bg.join(bc, Seq("cur", "nxt")).join(cc, Seq("cur"))
      .join(bw, Seq("nxt")).crossJoin(broadcast(dd))
      .select(col("doc_id"), round(log(p), 6).as("lp"))
    // avg_nll via scaled-integer HALF_UP division, NOT round(-s/n, 6):
    // the decimal term sum is cross-engine exact, but a double divide
    // whose quotient lands on a 6-dp rounding boundary resolves the tie
    // differently in the two engines' round() (one row at sf0.1 did —
    // the r13 sweep's 1e-6 avg_nll diff). Integer arithmetic has no tie.
    term.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        dbl(sum(col("lp").cast(DecimalType(18, 6)))).as("s"),
        expr("CAST(SUM(CAST(lp AS DECIMAL(18,6))) * -1000000 AS BIGINT)").as("t6"))
      .select(col("doc_id"), col("n_bigrams"),
        (expr("CAST(CASE WHEN t6 >= 0 THEN (2 * t6 + n_bigrams) DIV (2 * n_bigrams) " +
          "ELSE -((2 * (-t6) + n_bigrams) DIV (2 * n_bigrams)) END AS DOUBLE)")
          / lit(1000000.0)).as("avg_nll"),
        round(exp(-col("s") / col("n_bigrams")), 6).as("ppl"))
      .orderBy("doc_id")
  }

  /** Incremental cross-corpus dedup: classify a NEW batch of documents
    * (doc_id ≡ 0 mod 5 stands in for "today's crawl") against the BASE
    * corpus (everything else) — 'exact' (fingerprint already in base),
    * 'near' (3-gram Jaccard ≥ 0.5 with some base doc), or 'unique'. This
    * is the steady-state shape of corpus dedup: the base is not re-paired
    * against itself (that already happened), only batch×base candidates
    * are generated.
    *
    * At scale: exact = hash semi-join against the base fingerprint index
    * (broadcast/bloom-sized relative to the corpus); near = shingle-keyed
    * equi-join where one side is the small increment, then a bounded
    * per-pair verify. The LSH-banded variant of the same increment join is
    * q_dedup_minhash's bands with the base pre-bucketed — the candidate
    * key discipline is identical, so this oracle-checked form is the
    * correctness anchor. Shingles are xxhash64'd to int64 on the Spark
    * side ([[Dedup.wordShingleHashes]]); Jaccard is hash-invariant, so
    * the oracle computes it on raw string shingles. */
  val qDedupIncr: Q = Q(
    "q_dedup_incr",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |pos AS (SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS ord FROM toks),
      |sh0 AS (SELECT doc_id, t || ' ' || LEAD(t, 1) OVER w || ' ' || LEAD(t, 2) OVER w AS sh
      |        FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY ord)),
      |sh AS (SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL),
      |sz AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY 1),
      |fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |basefp AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 5 <> 0),
      |batch AS (SELECT doc_id, fp FROM fp WHERE doc_id % 5 = 0),
      |inter AS (SELECT a.doc_id AS bid, b.doc_id AS oid, COUNT(*) AS ninter
      |          FROM sh a JOIN sh b USING (sh)
      |          WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      |          GROUP BY 1, 2),
      |jac AS (SELECT bid,
      |          MAX(round(CAST(ninter AS DOUBLE) / CAST(sa.nsh + sb.nsh - ninter AS DOUBLE), 6)) AS best_j
      |        FROM inter JOIN sz sa ON sa.doc_id = inter.bid
      |                   JOIN sz sb ON sb.doc_id = inter.oid
      |        GROUP BY 1)
      |SELECT b.doc_id,
      |  CASE WHEN basefp.fp IS NOT NULL THEN 'exact'
      |       WHEN jac.best_j >= 0.5 THEN 'near' ELSE 'unique' END AS status,
      |  jac.best_j AS best_jaccard
      |FROM batch b LEFT JOIN basefp ON b.fp = basefp.fp
      |LEFT JOIN jac ON jac.bid = b.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val sh = Dedup.wordShingleHashes(docs, "doc_id", "text", 3)
    val sz = sh.groupBy("id").agg(count(lit(1)).as("nsh"))
    val fp = docs.select(col("doc_id"), md5(col("text")).as("fp"))
    val baseFp = fp.filter(col("doc_id") % 5 =!= 0)
      .select("fp").distinct().withColumn("hit", lit(1))
    val batch = fp.filter(col("doc_id") % 5 === 0)
    val bsh = sh.filter(col("id") % 5 === 0).select(col("id").as("bid"), col("sh"))
    val osh = sh.filter(col("id") % 5 =!= 0).select(col("id").as("oid"), col("sh"))
    val inter = bsh.join(osh, "sh").groupBy("bid", "oid").agg(count(lit(1)).as("ninter"))
    val jac = inter
      .join(sz.select(col("id").as("bid"), col("nsh").as("na")), "bid")
      .join(sz.select(col("id").as("oid"), col("nsh").as("nb")), "oid")
      .groupBy("bid")
      .agg(max(round(dbl(col("ninter")) / dbl(col("na") + col("nb") - col("ninter")), 6))
        .as("best_j"))
    batch.join(baseFp, Seq("fp"), "left")
      .join(jac.withColumnRenamed("bid", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("hit").isNotNull, "exact")
          .when(col("best_j") >= 0.5, "near")
          .otherwise("unique").as("status"),
        col("best_j").as("best_jaccard"))
      .orderBy("doc_id")
  }

  /** Training-mix planner: given relative target weights per source
    * (here a deterministic function of the source name, standing in for a
    * configured mixture), compute each source's token supply, the sampling
    * rate that realizes the target share of a fixed token budget (half the
    * corpus), capped at 1 (can't upsample without repetition), and the
    * expected token yield. One aggregation + a broadcast of the one-row
    * totals — the per-source table is mixture-sized, never corpus-sized. */
  val qMixPlan: Q = Q(
    "q_mix_plan",
    """WITH tok AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
      |             FROM documents GROUP BY 1),
      |w AS (SELECT source, src_tokens,
      |        CAST((CAST(substr(source, 4) AS INT) % 4) + 1 AS DOUBLE) AS weight FROM tok),
      |tot AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total, CAST(SUM(weight) AS DOUBLE) AS wsum FROM w)
      |SELECT source, src_tokens, weight,
      |  round(least(1.0, (weight / wsum) * (0.5 * CAST(total AS DOUBLE)) / CAST(src_tokens AS DOUBLE)), 6) AS rate,
      |  CAST(floor(least(1.0, (weight / wsum) * (0.5 * CAST(total AS DOUBLE)) / CAST(src_tokens AS DOUBLE))
      |        * CAST(src_tokens AS DOUBLE)) AS BIGINT) AS expected_tokens
      |FROM w CROSS JOIN tot ORDER BY source""".stripMargin) { (s, d) =>
    val tok = T.documents(s, d).groupBy("source")
      .agg(sum(size(split(col("text"), " "))).cast("long").as("src_tokens"))
    val w = tok.withColumn("weight",
      dbl(substring(col("source"), 4, 10).cast("int") % 4 + 1))
    val tot = w.agg(sum(col("src_tokens")).as("total"), sum(col("weight")).as("wsum"))
    val rateRaw = least(lit(1.0),
      (col("weight") / col("wsum")) * (lit(0.5) * dbl(col("total"))) / dbl(col("src_tokens")))
    w.crossJoin(broadcast(tot))
      .select(col("source"), col("src_tokens"), col("weight"),
        round(rateRaw, 6).as("rate"),
        floor(rateRaw * dbl(col("src_tokens"))).cast("long").as("expected_tokens"))
      .orderBy("source")
  }

  /** Temperature-scaled mixture sampling (Conneau & Lample 2019, XLM —
    * the multilingual/source-rebalancing recipe mT5/XLM-R standardized):
    * sample sources ∝ p_i^α (α = 0.3), which upweights low-resource
    * sources relative to their raw share without letting any source
    * dominate. Complements [[qMixPlan]] (weights GIVEN) and
    * qMixReweight (weights LEARNED): here the weights are the published
    * closed form of the corpus shares.
    *
    * Determinism: p^α is computed as exp(α·ln p) in the SAME shape both
    * engines (the q_perplexity precedent), each term rounded to 6 dp,
    * and the normalizer is a DECIMAL(18,6) sum of the rounded terms —
    * partition/order exact. One source-sized aggregation + one one-row
    * broadcast; nothing corpus-sized past the first groupBy. */
  val qMixTemperature: Q = Q(
    "q_mix_temperature",
    """WITH tok AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
      |             FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total FROM tok),
      |a AS (SELECT source, src_tokens,
      |        round(CAST(src_tokens AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
      |        round(exp(0.3 * ln(CAST(src_tokens AS DOUBLE) / CAST(total AS DOUBLE))), 6) AS pa,
      |        total FROM tok CROSS JOIN tot),
      |z AS (SELECT CAST(SUM(CAST(pa AS DECIMAL(18,6))) AS DOUBLE) AS zsum FROM a)
      |SELECT source, src_tokens, share,
      |  round(pa / zsum, 6) AS temp_weight,
      |  CAST(floor((pa / zsum) * (0.5 * CAST(total AS DOUBLE))) AS BIGINT) AS expected_tokens
      |FROM a CROSS JOIN z ORDER BY source""".stripMargin) { (s, d) =>
    val tok = T.documents(s, d).groupBy("source")
      .agg(sum(size(split(col("text"), " "))).cast("long").as("src_tokens"))
    val tot = tok.agg(sum(col("src_tokens")).cast("long").as("total"))
    val a = tok.crossJoin(broadcast(tot))
      .withColumn("share", round(dbl(col("src_tokens")) / dbl(col("total")), 6))
      .withColumn("pa", round(exp(lit(0.3) * log(dbl(col("src_tokens")) / dbl(col("total")))), 6))
    val z = a.agg(dbl(sum(col("pa").cast(DecimalType(18, 6)))).as("zsum"))
    a.crossJoin(broadcast(z))
      .select(col("source"), col("src_tokens"), col("share"),
        round(col("pa") / col("zsum"), 6).as("temp_weight"),
        floor((col("pa") / col("zsum")) * (lit(0.5) * dbl(col("total")))).cast("long").as("expected_tokens"))
      .orderBy("source")
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): spread a token budget UNIFORMLY across sources,
    * subject to a per-source epoch cap (here 4 epochs) — small sources
    * are capped at cap = epochs·supply, and their residual redistributes
    * evenly among the rest. The published waterfilling loop has a closed
    * form over the capacity-ascending order: with prefix sums P and N
    * sources, source i is capped iff cᵢ·(N−i+1) + Pᵢ₋₁ ≤ B (capping is a
    * prefix of the ascending order), and every uncapped source gets
    * ⌊(B − P_K)/(N − K)⌋ where K is the capped-prefix length — so the
    * whole allocation is two windows over a source-sized table, no
    * iteration. ALL arithmetic is exact long algebra (the q_ppr trick);
    * epochs-realized is the only double, rounded at 6 dp.
    *
    * Completes the mixture-planning family: q_mix_plan (weights GIVEN),
    * q_mix_temperature (weights = share^α), q_mix_reweight (weights
    * LEARNED), q_unimax (budget split FAIRLY under caps). */
  val qUnimax: Q = Q(
    "q_unimax",
    """WITH tok AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS supply
      |             FROM documents GROUP BY 1),
      |c AS (SELECT source, supply, 4 * supply AS cap FROM tok),
      |w AS (SELECT source, supply, cap,
      |        ROW_NUMBER() OVER (ORDER BY cap, source) AS i,
      |        COALESCE(SUM(cap) OVER (ORDER BY cap, source
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p,
      |        COUNT(*) OVER () AS n,
      |        (SELECT SUM(supply) // 2 FROM tok) AS b FROM c),
      |f AS (SELECT *, CASE WHEN cap * (n - i + 1) + p <= b THEN 1 ELSE 0 END AS capped FROM w),
      |g AS (SELECT *, COALESCE(MAX(CASE WHEN capped = 1 THEN i END) OVER (), 0) AS k,
      |        COALESCE(SUM(CASE WHEN capped = 1 THEN cap END) OVER (), 0) AS pk FROM f)
      |SELECT source, supply, cap,
      |  CAST(CASE WHEN capped = 1 THEN cap ELSE (b - pk) // (n - k) END AS BIGINT) AS allocated,
      |  capped,
      |  round(CAST(CASE WHEN capped = 1 THEN cap ELSE (b - pk) // (n - k) END AS DOUBLE)
      |    / CAST(supply AS DOUBLE), 6) AS epochs
      |FROM g ORDER BY source""".stripMargin) { (s, d) =>
    val tok = T.documents(s, d).groupBy("source")
      .agg(sum(size(split(col("text"), " "))).cast("long").as("supply"))
    val c = tok.withColumn("cap", lit(4L) * col("supply"))
    val b = tok.agg((sum(col("supply")) / 2).cast("long").as("b"))
    val wAsc = Window.orderBy(col("cap"), col("source"))
    val w = c.crossJoin(broadcast(b))
      .withColumn("i", row_number().over(wAsc))
      .withColumn("p", coalesce(
        sum(col("cap")).over(wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("capped",
        when(col("cap") * (col("n") - col("i") + 1) + col("p") <= col("b"), 1).otherwise(0))
    val g = w
      .withColumn("k", coalesce(
        max(when(col("capped") === 1, col("i"))).over(Window.partitionBy()), lit(0L)))
      .withColumn("pk", coalesce(
        sum(when(col("capped") === 1, col("cap"))).over(Window.partitionBy()), lit(0L)))
    val alloc = when(col("capped") === 1, col("cap"))
      .otherwise(((col("b") - col("pk")) / (col("n") - col("k"))).cast("long"))
    g.select(col("source"), col("supply"), col("cap"),
        alloc.cast("long").as("allocated"), col("capped"),
        round(dbl(alloc) / dbl(col("supply")), 6).as("epochs"))
      .orderBy("source")
  }

  /** Embedding-space clustering (semantic bucketing of a corpus): fit the
    * deterministic k-means codebook ([[Similarity.fitKmeansCodebook]] — a
    * hash-sample fit, model-fit-sized), assign every vector map-side
    * ([[Similarity.nearestCell]] — one projection, no row blowup), then
    * profile each cluster: size, majority label (+share), and cohesion
    * (mean cosine to the centroid). The mode comes from a struct-max over
    * per-(cell,label) partials — one shuffle chain, no window.
    *
    * Fully oracled (r10 — previously rows-only "the codebook is not
    * SQL-expressible"): [[OracleKit.kmeansCtes]] replays the ENTIRE fit in
    * DuckDB — xxhash64 init order via 128-bit modular arithmetic, exact
    * decimal centroid means, cosine-argmax assignment — bit-identically,
    * so cell ids, majority labels and cohesions all hash-match. */
  private def embedClusterOracleSql(k: Int = 8, iters: Int = 4): String = {
    val vecs = "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
    val (ctes, cb) = OracleKit.kmeansCtes(vecs, k, iters)
    val cos = OracleKit.cosSql("s.v", "c.cent")
    (ctes ++ Seq(
      s"asg AS MATERIALIZED (SELECT id, label, v, cell, cent FROM (SELECT s.id, e.label, s.v, c.cid AS cell, c.cent," +
        s" ROW_NUMBER() OVER (PARTITION BY s.id ORDER BY $cos DESC, c.cid) AS rn" +
        s" FROM km_vecs s JOIN embeddings e ON e.vec_id = s.id CROSS JOIN $cb c) WHERE rn = 1)",
      s"cs AS MATERIALIZED (SELECT cell, label," +
        s" CAST(round(${OracleKit.cosSql("v", "cent")}, 6) AS DECIMAL(18,6)) AS ccos FROM asg)",
      "bl AS MATERIALIZED (SELECT cell, label, COUNT(*)::BIGINT AS cl, SUM(ccos) AS csum FROM cs GROUP BY cell, label)",
      "pc AS MATERIALIZED (SELECT cell, CAST(SUM(cl) AS BIGINT) AS n_vecs, CAST(SUM(csum) AS DOUBLE) AS s FROM bl GROUP BY cell)",
      "top AS MATERIALIZED (SELECT cell, cl, label, ROW_NUMBER() OVER (PARTITION BY cell ORDER BY cl DESC, label) AS rn FROM bl)"))
      .mkString("WITH ", ", ", " ") +
      "SELECT pc.cell, pc.n_vecs, CAST(top.label AS BIGINT) AS top_label, " +
      "round(CAST(top.cl AS DOUBLE) / CAST(pc.n_vecs AS DOUBLE), 6) AS top_label_share, " +
      "round(pc.s / CAST(pc.n_vecs AS DOUBLE), 6) AS cohesion " +
      "FROM pc JOIN top ON top.cell = pc.cell AND top.rn = 1 ORDER BY pc.cell"
  }

  val qEmbedCluster: Q = Q("q_embed_cluster", embedClusterOracleSql()) { (s, d) =>
    val k = 8
    val corpus = T.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val codebook = Similarity.fitKmeansCodebook(
      corpus.select(col("vec_id").as("id"), col("v")), k)
    val centArr = typedlit(codebook.map(_.toSeq).toSeq)
    val assigned = corpus
      .withColumn("cell", Similarity.nearestCell(col("v"), codebook))
      .withColumn("ccos",
        round(VectorFunctions.cosineSim(col("v"), element_at(centArr, (col("cell") + 1).cast("int"))), 6))
    val byCellLabel = assigned.groupBy("cell", "label")
      .agg(count(lit(1)).as("cl"),
        sum(col("ccos").cast(DecimalType(18, 6))).as("csum"))
    byCellLabel.groupBy("cell")
      .agg(sum(col("cl")).cast("long").as("n_vecs"),
        dbl(sum(col("csum"))).as("s"),
        max(struct(col("cl"), (-col("label")).as("negLabel"))).as("m"))
      .select(col("cell"), col("n_vecs"),
        (-col("m.negLabel")).cast("long").as("top_label"),
        round(dbl(col("m.cl")) / dbl(col("n_vecs")), 6).as("top_label_share"),
        round(col("s") / dbl(col("n_vecs")), 6).as("cohesion"))
      .orderBy("cell")
  }

  /** Iterative mixture reweighting (DoReMi-shaped multiplicative
    * weights): starting from a uniform mixture, each round upweights
    * sources whose proxy loss EXCEEDS the current mixture-weighted
    * average and downweights the rest — the published
    * group-distributionally-robust recipe for choosing pretraining
    * mixture weights, with the per-domain excess loss driving the
    * update. [[qMixPlan]] realizes a GIVEN mixture; this op CHOOSES one.
    *
    * The proxy loss here is the per-source mean document length
    * (micro-scaled — a stand-in for the reference model's per-domain
    * loss, which is an input table in production). All arithmetic is
    * EXACT long algebra (the q_ppr trick): losses and weights are
    * micro-scaled longs, each round is one `w * (SCALE + clamped
    * excess/4) div SCALE` update, and both engines truncate integer
    * division toward zero — so three unrolled rounds hash-match bit
    * for bit.
    *
    * Scale: one corpus aggregation produces the sources-sized loss
    * table; every round after that is a mixture-sized fold plus a
    * broadcast one-row average — the iteration never touches the
    * corpus again, at ANY corpus size. */
  val qMixReweight: Q = {
    val Scale = 1000000L
    // one multiplicative-weights round over (source, loss_micro, w)
    def roundSql(prev: String, t: Int): String =
      s"""a$t AS (SELECT CAST(SUM(w * loss_micro) // SUM(w) AS BIGINT) AS avg FROM $prev),
         |r${t + 1} AS (
         |  SELECT source, loss_micro,
         |    CAST(w * ($Scale + GREATEST(-500000, LEAST(500000, (loss_micro - avg) // 4))) // $Scale AS BIGINT) AS w
         |  FROM $prev CROSS JOIN a$t)""".stripMargin
    Q(
      "q_mix_reweight",
      s"""WITH s AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
         |  FROM documents GROUP BY source),
         |r0 AS (
         |  SELECT source, src_tokens * $Scale // n_docs AS loss_micro,
         |    CAST($Scale AS BIGINT) AS w
         |  FROM s),
         |${roundSql("r0", 0)},
         |${roundSql("r1", 1)},
         |${roundSql("r2", 2)},
         |tot AS (SELECT SUM(w) AS wsum FROM r3)
         |SELECT source, loss_micro, w AS w_final,
         |  CAST(w * $Scale // wsum AS BIGINT) AS share_ppm
         |FROM r3 CROSS JOIN tot ORDER BY source""".stripMargin) { (s, d) =>
      def mwRound(prev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val avg = prev.agg(
          expr(s"sum(w * loss_micro) div sum(w)").as("avg"))
        prev.crossJoin(broadcast(avg))
          .select(col("source"), col("loss_micro"),
            expr(s"w * ($Scale + greatest(-500000L, least(500000L, (loss_micro - avg) div 4))) div $Scale")
              .as("w"))
      }
      val src = T.documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("src_tokens"))
      val r0 = src.select(col("source"),
        expr(s"src_tokens * $Scale div n_docs").as("loss_micro"),
        lit(Scale).as("w"))
      val r3 = mwRound(mwRound(mwRound(r0)))
      val tot = r3.agg(sum(col("w")).as("wsum"))
      r3.crossJoin(broadcast(tot))
        .select(col("source"), col("loss_micro"), col("w").as("w_final"),
          expr(s"w * $Scale div wsum").as("share_ppm"))
        .orderBy("source")
    }
  }

  /** DATA-CONSTRAINED EPOCH ALLOCATION (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models": repeating data has rapidly
    * diminishing returns — up to ~4 epochs repeated tokens are nearly as
    * good as fresh, then value decays): given a token BUDGET of 2× the
    * corpus's unique tokens, allocate whole EPOCHS per source by greedy
    * marginal value — the e-th epoch of source s is worth
    * `src_tokens·δ^(e−1)` (δ = 1/2, a power of two so the ranking key is
    * double-exact cross-engine) and costs `src_tokens` of budget; grant
    * candidates in (value DESC, source, epoch) order while the running
    * cost fits. Per-source value decays monotonically, so grants are
    * automatically contiguous epochs from 1. The plan: one per-source
    * aggregation, an 8-way epoch explode of the SOURCE table (sources,
    * not docs — model-sized), one ranking window over it; the corpus is
    * scanned once. Output per source: unique tokens, epochs granted,
    * budget consumed, effective (decay-weighted) tokens. */
  val qDataBudget: Q = Q(
    "q_data_budget",
    """WITH tok AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
      |             FROM documents GROUP BY 1),
      |b AS (SELECT 2 * CAST(SUM(src_tokens) AS BIGINT) AS budget FROM tok),
      |cand AS (SELECT source, src_tokens, e,
      |           CAST(src_tokens AS DOUBLE) * power(0.5, e - 1) AS val
      |         FROM tok, unnest(range(1, 9)) AS t(e)),
      |ranked AS (SELECT *, SUM(src_tokens) OVER (ORDER BY val DESC, source, e
      |             ROWS UNBOUNDED PRECEDING) AS cum FROM cand),
      |granted AS (SELECT * FROM ranked, b WHERE cum <= b.budget)
      |SELECT source, ANY_VALUE(src_tokens) AS unique_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS epochs,
      |  CAST(COUNT(*) AS BIGINT) * ANY_VALUE(src_tokens) AS tokens_used,
      |  CAST(SUM(val) AS DOUBLE) AS effective_tokens
      |FROM granted GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tok = T.documents(s, d).groupBy("source")
      .agg(sum(size(split(col("text"), " "))).cast("long").as("src_tokens"))
      .localCheckpoint(true) // source-count-sized; feeds budget + explode
    val budget = tok.agg((sum(col("src_tokens")) * 2).cast("long").as("budget"))
    val cand = tok.select(col("source"), col("src_tokens"),
        explode(sequence(lit(1), lit(8))).as("e"))
      .withColumn("val", dbl(col("src_tokens")) * pow(lit(0.5), col("e") - 1))
    val w = Window.orderBy(col("val").desc, col("source"), col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cand.withColumn("cum", sum(col("src_tokens")).over(w))
      .crossJoin(broadcast(budget))
      .filter(col("cum") <= col("budget"))
      .groupBy("source")
      .agg(first(col("src_tokens")).as("unique_tokens"),
        count(lit(1)).cast("long").as("epochs"),
        (count(lit(1)) * first(col("src_tokens"))).cast("long").as("tokens_used"),
        sum(col("val")).cast("double").as("effective_tokens"))
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(qPerplexity, qPerplexityKn, qDedupIncr, qMixPlan, qMixTemperature, qUnimax, qEmbedCluster,
    qMixReweight, qDataBudget)
}
