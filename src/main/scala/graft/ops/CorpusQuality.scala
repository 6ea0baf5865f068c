package graft.ops

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** Corpus-quality operators (SURVEY.md §2.4): intra-document repetition,
  * per-source health rollups, a keep/drop filter chain with reasons, and
  * benchmark decontamination — the quality gates of a pre-training data
  * pipeline, all shuffle-minimal (per-doc metrics are one explode +
  * groupBy; source stats aggregate once).
  */
object CorpusQuality {

  /** Intra-doc repetition: top-bigram share and distinct-bigram ratio —
    * high top-share / low distinct-ratio = boilerplate or spam. */
  val qRepetition: Q = Q(
    "q_repetition",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
      |  bg AS (SELECT doc_id, tok[i] || ' ' || tok[i+1] AS bigram
      |         FROM toks, unnest(range(1, len(tok))) AS t(i)),
      |  cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2)
      |SELECT doc_id,
      |  CAST(SUM(c) AS BIGINT) AS n_bigrams,
      |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |  round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS top_bigram_frac,
      |  round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS distinct_frac
      |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = col("__toks")
    val bigrams = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"), explode(
        when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
          .otherwise(array(lit("")))).as("bigram"))
      .filter(col("bigram") =!= "")
    bigrams.groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"), count(lit(1)).as("n_distinct"),
        round(dbl(max(col("c"))) / dbl(sum(col("c"))), 6).as("top_bigram_frac"),
        round(dbl(count(lit(1))) / dbl(sum(col("c"))), 6).as("distinct_frac"))
      .orderBy("doc_id")
  }

  /** Per-source corpus health: volume, mean length, language spread,
    * exact-duplicate rate — the per-provider QC dashboard. */
  val qSourceStats: Q = Q(
    "q_source_stats",
    """SELECT source,
      |  COUNT(*) AS n_docs,
      |  round(CAST(SUM(CAST(n_chars AS DECIMAL(14,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS mean_chars,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  round(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(sumDbl(col("n_chars").cast(org.apache.spark.sql.types.DecimalType(14, 2)))
          / dbl(count(lit(1))), 4).as("mean_chars"),
        countDistinct(col("lang")).as("n_langs"),
        round(lit(1.0) - dbl(countDistinct(md5(col("text")))) / dbl(count(lit(1))), 6)
          .as("dup_rate"))
      .orderBy("source")
  }

  /** The keep/drop reason chain over (lang, n_chars, text) — shared by
    * the filter query, the release capstone, and the streaming release
    * gate so "quality" means ONE thing everywhere. Rules are ordered and
    * the reason is the FIRST violated. */
  private[graft] def filterVerdict: org.apache.spark.sql.Column =
    when(col("lang") =!= "en", "lang")
      .when(col("n_chars") < 100, "too_short")
      .when(col("n_chars") > 5000, "too_long")
      .when(regexp_count(lower(col("text")),
        lit("\\b(the|a|an|of|and|or|to|in)\\b")) === 0, "no_stopwords")
      .otherwise("keep")

  /** Keep/drop filter chain with a first-failure reason — the auditable
    * form of a corpus filter (what was dropped, and why, per rule). Pure
    * map-side. */
  val qFilterPipeline: Q = Q(
    "q_filter_pipeline",
    """SELECT doc_id,
      |  CASE WHEN lang <> 'en' THEN 'lang'
      |       WHEN n_chars < 100 THEN 'too_short'
      |       WHEN n_chars > 5000 THEN 'too_long'
      |       WHEN len(regexp_extract_all(lower(text), '\b(the|a|an|of|and|or|to|in)\b')) = 0 THEN 'no_stopwords'
      |       ELSE 'keep' END AS verdict
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), filterVerdict.as("verdict"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: corpus documents sharing any trigram with
    * the probe/benchmark set (here: doc_id < 5), with the shared-shingle
    * count. The probe shingle set is tiny and broadcast; the corpus
    * shuffles once on the shingle hash — the standard n-gram-overlap
    * decontamination join at corpus scale. */
  val qContamination: Q = Q(
    "q_contamination",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
      |  sh AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS sh
      |         FROM toks, unnest(range(1, len(tok) - 1)) AS t(i)),
      |  probe AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 5)
      |SELECT sh.doc_id, COUNT(*) AS n_shared
      |FROM sh JOIN probe USING (sh)
      |WHERE sh.doc_id >= 5
      |GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sh = Dedup.wordShingleHashes(T.documents(s, d), "doc_id", "text", 3)
    val probe = sh.filter(col("id") < 5).select("sh").distinct()
    sh.filter(col("id") >= 5)
      .join(broadcast(probe), "sh")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  /** Cross-document boilerplate detection (the C4/RefinedWeb "remove
    * paragraphs repeated across many pages" pass): split each doc into
    * fixed 8-token chunks (the paragraph stand-in for this corpus), count
    * distinct docs per chunk text, and flag chunks appearing in 2+ docs.
    * Per-doc output: chunk counts + boilerplate share — the upstream
    * signal for stripping headers/footers/navigation at corpus scale.
    * Two shuffles: chunk assembly (doc-keyed) and the chunk-frequency
    * count (chunk-keyed, uniform); the flag join keys on the same chunk
    * hash. At 100 TB the chunk table is the big side — everything stays
    * key-partitioned, nothing collects. */
  val qBoilerplate: Q = Q(
    "q_boilerplate",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |pos AS (SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS ord FROM toks),
      |ch AS (SELECT doc_id, (ord - 1) // 8 AS chunk_id,
      |         string_agg(t, ' ' ORDER BY ord) AS chunk
      |       FROM pos GROUP BY 1, 2),
      |rep AS (SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs FROM ch GROUP BY 1),
      |flag AS (SELECT doc_id, CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END AS boiler
      |         FROM ch JOIN rep USING (chunk))
      |SELECT doc_id, COUNT(*) AS n_chunks,
      |  CAST(SUM(boiler) AS BIGINT) AS n_boiler,
      |  round(CAST(CAST(SUM(boiler) AS BIGINT) AS DOUBLE) / COUNT(*), 6) AS boiler_share
      |FROM flag GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pos = T.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "t")))
    // posexplode is 0-based, generate_subscripts 1-based: p div 8 == (ord-1)//8
    val ch = pos
      .groupBy(col("doc_id"), expr("p div 8").as("chunk_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("p"), col("t")))),
        x => x.getField("t")), " ").as("chunk"))
    val rep = ch.groupBy("chunk").agg(countDistinct(col("doc_id")).as("ndocs"))
    ch.join(rep, "chunk")
      .select(col("doc_id"), when(col("ndocs") >= 2, 1).otherwise(0).as("boiler"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum(col("boiler")).cast("long").as("n_boiler"))
      .select(col("doc_id"), col("n_chunks"), col("n_boiler"),
        round(dbl(col("n_boiler")) / dbl(col("n_chunks")), 6).as("boiler_share"))
      .orderBy("doc_id")
  }

  /** Corpus datasheet: the one-row-per-metric release card every corpus
    * ships with (datasheets-for-datasets governance) — volume, source and
    * language breadth, token mass, exact-dup rate, emptiness — computed
    * in ONE scan, then unpivoted to (metric, value) rows. The three
    * COUNT(DISTINCT …) columns plan as Spark's Expand (3× compact rows —
    * source, lang, 16-byte md5 — into one shuffle), not three passes;
    * everything else is plain map-side partials. No second scan, no
    * join. */
  val qCorpusCard: Q = Q(
    "q_corpus_card",
    """WITH a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
      |  CAST(COUNT(DISTINCT source) AS DOUBLE) AS n_sources,
      |  CAST(COUNT(DISTINCT lang) AS DOUBLE) AS n_langs,
      |  CAST(SUM(len(string_split(trim(text), ' '))) AS DOUBLE) AS n_tokens,
      |  CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) AS n_unique,
      |  CAST(SUM(CASE WHEN len(trim(text)) = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n_empty
      |FROM documents)
      |SELECT metric, round(value, 6) AS value FROM (
      |  SELECT 'n_docs' AS metric, n_docs AS value FROM a
      |  UNION ALL SELECT 'n_sources', n_sources FROM a
      |  UNION ALL SELECT 'n_langs', n_langs FROM a
      |  UNION ALL SELECT 'n_tokens', n_tokens FROM a
      |  UNION ALL SELECT 'mean_doc_tokens', n_tokens / n_docs FROM a
      |  UNION ALL SELECT 'exact_dup_rate', 1.0 - n_unique / n_docs FROM a
      |  UNION ALL SELECT 'empty_rate', n_empty / n_docs FROM a)
      |ORDER BY metric""".stripMargin) { (s, d) =>
    val a = T.documents(s, d).agg(
      dbl(count(lit(1))).as("n_docs"),
      dbl(countDistinct(col("source"))).as("n_sources"),
      dbl(countDistinct(col("lang"))).as("n_langs"),
      dbl(sum(size(split(trim(col("text")), " ")))).as("n_tokens"),
      dbl(countDistinct(md5(col("text")))).as("n_unique"),
      dbl(sum(when(length(trim(col("text"))) === 0, 1).otherwise(0))).as("n_empty"))
    // nullif guards: ANSI mode raises DIVIDE_BY_ZERO even for doubles,
    // and an EMPTY corpus should card as null rates, not as an outage
    a.select(expr(
      """stack(7,
        |  'n_docs', n_docs,
        |  'n_sources', n_sources,
        |  'n_langs', n_langs,
        |  'n_tokens', n_tokens,
        |  'mean_doc_tokens', n_tokens / nullif(n_docs, 0.0d),
        |  'exact_dup_rate', 1.0d - n_unique / nullif(n_docs, 0.0d),
        |  'empty_rate', n_empty / nullif(n_docs, 0.0d)) AS (metric, value)""".stripMargin))
      .select(col("metric"), round(col("value"), 6).as("value"))
      .orderBy("metric")
  }

  /** RELEASE-PIPELINE capstone — the staged per-doc decision table a
    * corpus release actually ships (the RefinedWeb/Dolma ordering:
    * quality filter → near-dup dedup → benchmark decontamination), with
    * each doc carrying the FIRST stage that dropped it:
    *
    *  1. quality: [[qFilterPipeline]]'s reason chain (lang / too_short /
    *     too_long / no_stopwords) on the training corpus (doc_id >= 25;
    *     doc_id < 25 is the held-out benchmark stand-in, as in
    *     q_decontam_index) — later stages never see quality-dropped docs,
    *     which is the point of staging: dedup pays pair-join work only
    *     for docs that can still ship;
    *  2. dedup: trigram-Jaccard >= 0.5 SSJoin pairs over the quality
    *     survivors → one CC → min-id survivor; non-survivors verdict
    *     'dup' with their survivor_id;
    *  3. decontamination: surviving docs with exact trigram Jaccard >=
    *     0.5 against ANY benchmark doc verdict 'contaminated' (their
    *     dup-followers were already dropped at stage 2 — a contaminated
    *     cluster representative never promotes a follower).
    *
    * Output: (doc_id, verdict, survivor_id, final_keep) for every
    * training doc — the table the release writes next to the corpus.
    * At scale every stage is a shape certified elsewhere: the filter is
    * one map-side projection, the pair join is the subquadratic SSJoin
    * ([[Dedup.jaccardPairsPrefix]]), CC size-routes, and the decontam
    * join is batch-restricted with the benchmark side as the prefix
    * probe ([[Dedup.jaccardPairsPrefixAgainst]]). Fully oracled: DuckDB
    * replays all three stages (reason CASE, pair CTE + recursive CC,
    * cross-pair screen) in one statement. */
  /** The staged-release CTE chain (everything before the final SELECT),
    * shared by q_corpus_release (per-doc table) and q_release_card
    * (per-source rollup). */
  private val releaseCtesSql: String =
    """WITH RECURSIVE
      |q AS (SELECT doc_id,
      |  CASE WHEN lang <> 'en' THEN 'lang'
      |       WHEN n_chars < 100 THEN 'too_short'
      |       WHEN n_chars > 5000 THEN 'too_long'
      |       WHEN len(regexp_extract_all(lower(text), '\b(the|a|an|of|and|or|to|in)\b')) = 0 THEN 'no_stopwords'
      |       ELSE 'keep' END AS q
      |  FROM documents WHERE doc_id >= 25),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
      |sh AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS sh
      |       FROM toks, unnest(range(1, len(tok) - 1)) AS t(i)),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      |qk AS (SELECT doc_id FROM q WHERE q = 'keep'),
      |ksh AS (SELECT s.doc_id, s.sh FROM sh s JOIN qk USING (doc_id)),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM ksh a JOIN ksh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  JOIN sz sa ON sa.doc_id = a.doc_id
      |  JOIN sz sb ON sb.doc_id = b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |  HAVING CAST(COUNT(*) AS DOUBLE) /
      |      CAST(ANY_VALUE(sa.n) + ANY_VALUE(sb.n) - COUNT(*) AS DOUBLE) >= 0.5),
      |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |      UNION SELECT id_b, id_a FROM pairs),
      |reach(node, lbl) AS (
      |  SELECT DISTINCT src, src FROM e
      |  UNION
      |  SELECT e.dst, reach.lbl FROM reach JOIN e ON e.src = reach.node),
      |comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
      |pick AS (SELECT qk.doc_id, COALESCE(comp.component, qk.doc_id) AS survivor_id
      |         FROM qk LEFT JOIN comp ON comp.node = qk.doc_id),
      |esh AS (SELECT doc_id, sh FROM sh WHERE doc_id < 25),
      |ssh AS (SELECT s.doc_id, s.sh FROM sh s
      |        JOIN pick p ON p.doc_id = s.doc_id AND p.doc_id = p.survivor_id),
      |contp AS (
      |  SELECT t.doc_id
      |  FROM ssh t JOIN esh b ON t.sh = b.sh
      |  JOIN sz st ON st.doc_id = t.doc_id
      |  JOIN sz se ON se.doc_id = b.doc_id
      |  GROUP BY t.doc_id, b.doc_id
      |  HAVING CAST(COUNT(*) AS DOUBLE) /
      |      CAST(ANY_VALUE(st.n) + ANY_VALUE(se.n) - COUNT(*) AS DOUBLE) >= 0.5),
      |cont AS (SELECT DISTINCT doc_id FROM contp),
      |dec AS (
      |  SELECT doc_id, verdict, survivor_id, (verdict = 'keep') AS final_keep FROM (
      |    SELECT q.doc_id,
      |      CASE WHEN q.q <> 'keep' THEN q.q
      |           WHEN p.doc_id <> p.survivor_id THEN 'dup'
      |           WHEN c.doc_id IS NOT NULL THEN 'contaminated'
      |           ELSE 'keep' END AS verdict,
      |      p.survivor_id
      |    FROM q LEFT JOIN pick p ON p.doc_id = q.doc_id
      |    LEFT JOIN cont c ON c.doc_id = q.doc_id))
      |""".stripMargin

  val qCorpusRelease: Q = Q(
    "q_corpus_release",
    releaseCtesSql +
      """SELECT doc_id, verdict, survivor_id, final_keep FROM dec
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
    releaseDecisions(s, d).orderBy("doc_id")
  }

  /** The per-doc decision table of the staged release (unordered — the
    * shared core of q_corpus_release and q_release_card). */
  private def releaseDecisions(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val docs = T.documents(s, d)
    val evalDocs = docs.filter(col("doc_id") < 25)
    // ONE training pass (r15): the verdict and the text ride the same
    // checkpointed table — previously `q` (doc_id, verdict) and `qk`
    // (train ⋈ q-keep, re-attaching text) were SEPARATE checkpoints,
    // paying a second corpus scan + a doc-keyed join + a second
    // materialization job for columns one projection already had
    val q = docs.filter(col("doc_id") >= 25)
      .select(col("doc_id"), col("text"), filterVerdict.as("q"))
      .localCheckpoint(true) // pair join, pick, decontam, verdict read it
    val qk = q.filter(col("q") === "keep").select("doc_id", "text")
    val pick = Dedup.survivorPick(qk,
        Dedup.jaccardPairsPrefix(qk, "doc_id", "text", 3, 0.5))
      .localCheckpoint(true) // read by the survivor filter and the verdict
    val survivors = qk
      .join(pick.filter(col("keep")).select("doc_id"), "doc_id")
    val cross = Dedup.jaccardPairsPrefixAgainst(
        evalDocs.select("doc_id", "text").unionByName(survivors.select("doc_id", "text")),
        "doc_id", "text", 3, 0.5, col("id") < 25)
      .filter((col("id_a") < 25) =!= (col("id_b") < 25)) // cross pairs only
    val contaminated = cross
      .select(when(col("id_a") >= 25, col("id_a")).otherwise(col("id_b")).as("doc_id"))
      .distinct().withColumn("cont", lit(true))
    // ONE tagged aggregation folds both flag sources (survivor pick +
    // contamination) into a single doc-keyed table, so the decision
    // assembly pays ONE left join instead of one per source — the
    // q_dedup_fuse r14 pattern (guide §2.4 share the exchange). max()
    // ignores nulls: a doc present in one branch keeps its values, a doc
    // in both merges them (cont ⊆ pick, so survivor_id/dk never conflict).
    val flags = pick
      .select(col("doc_id"), col("survivor_id"), col("keep").as("dk"),
        lit(null).cast("boolean").as("cont"))
      .unionByName(contaminated.select(col("doc_id"),
        lit(null).cast("long").as("survivor_id"),
        lit(null).cast("boolean").as("dk"), col("cont")))
      .groupBy("doc_id")
      .agg(max(col("survivor_id")).as("survivor_id"), max(col("dk")).as("dk"),
        max(col("cont")).as("cont"))
    q.select("doc_id", "q").join(flags, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("q") =!= "keep", col("q"))
          .when(!col("dk"), "dup")
          .when(col("cont"), "contaminated")
          .otherwise("keep").as("verdict"),
        col("survivor_id"))
      .withColumn("final_keep", col("verdict") === "keep")
  }

  /** The RELEASE CARD — the per-source yield table a corpus release
    * publishes next to [[qCorpusRelease]]'s per-doc decisions (the
    * [[qCorpusCard]] idea applied to the staged release): docs in, docs
    * kept, and where the drops went (quality / dup / contaminated) per
    * source, with the keep fraction. One doc-keyed join + one
    * source-keyed aggregation over the already-computed decision table. */
  val qReleaseCard: Q = Q(
    "q_release_card",
    releaseCtesSql +
      """SELECT d.source, COUNT(*)::BIGINT AS n_docs,
        |  SUM(CASE WHEN dec.verdict = 'keep' THEN 1 ELSE 0 END)::BIGINT AS n_keep,
        |  SUM(CASE WHEN dec.verdict NOT IN ('keep', 'dup', 'contaminated') THEN 1 ELSE 0 END)::BIGINT AS n_quality_drop,
        |  SUM(CASE WHEN dec.verdict = 'dup' THEN 1 ELSE 0 END)::BIGINT AS n_dup,
        |  SUM(CASE WHEN dec.verdict = 'contaminated' THEN 1 ELSE 0 END)::BIGINT AS n_contaminated,
        |  round(CAST(SUM(CASE WHEN dec.verdict = 'keep' THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS keep_frac
        |FROM dec JOIN documents d USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, d) =>
    releaseDecisions(s, d)
      .join(T.documents(s, d).select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("verdict") === "keep", 1L).otherwise(0L)).as("n_keep"),
        sum(when(!col("verdict").isin("keep", "dup", "contaminated"), 1L)
          .otherwise(0L)).as("n_quality_drop"),
        sum(when(col("verdict") === "dup", 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("verdict") === "contaminated", 1L).otherwise(0L)).as("n_contaminated"))
      .select(col("source"), col("n_docs"), col("n_keep"), col("n_quality_drop"),
        col("n_dup"), col("n_contaminated"),
        round(dbl(col("n_keep")) / dbl(col("n_docs")), 6).as("keep_frac"))
      .orderBy("source")
  }

  /** The INGEST release gate over one batch of arriving docs against two
    * FROZEN indexes — the per-crawl form of [[qCorpusRelease]]'s staged
    * decision (quality → already-released near-dup → benchmark leak),
    * shared by the streaming sink
    * ([[graft.streaming.StreamingOps.releaseGateSink]]) and its one-shot
    * spec oracle. Screens use [[Dedup.NearDupIndex.screenWith]] (NO
    * batch↔batch pairs), so the verdicts are COMPOSITIONAL: micro-batch
    * boundaries can never change a doc's verdict, and the streamed union
    * equals the one-shot gate over the same docs.
    *
    * `corpusFrozen` is the near-dup index of the already-released corpus
    * (a batch doc near-duplicating it is 'dup'); `benchFrozen` the
    * benchmark suite's (a leak is 'contaminated'); either None (empty
    * index) skips its stage. Output: (doc_id, verdict, final_keep). */
  def releaseGate(batch: org.apache.spark.sql.DataFrame,
                  corpusFrozen: Option[Dedup.NearDupIndex.Frozen],
                  benchFrozen: Option[Dedup.NearDupIndex.Frozen],
                  n: Int = 3, threshold: Double = 0.5): org.apache.spark.sql.DataFrame = {
    val q = batch.select(col("doc_id"), filterVerdict.as("q"))
      .localCheckpoint(true) // read by the keep-join and the final verdict
    val qk = batch.join(q.filter(col("q") === "keep").select("doc_id"), "doc_id")
      .localCheckpoint(true) // both screens read it
    def screenIds(frozen: Option[Dedup.NearDupIndex.Frozen], flag: String) =
      frozen.fold(Dedup.NearDupIndex.emptyScreen(qk.sparkSession)) { f =>
        Dedup.NearDupIndex.screenWith(f, qk, n, threshold)
      }.select(col("id").as("doc_id")).distinct().withColumn(flag, lit(true))
    q.join(screenIds(corpusFrozen, "isdup"), Seq("doc_id"), "left")
      .join(screenIds(benchFrozen, "iscont"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("q") =!= "keep", col("q"))
          .when(col("isdup"), "dup")
          .when(col("iscont"), "contaminated")
          .otherwise("keep").as("verdict"))
      .withColumn("final_keep", col("verdict") === "keep")
  }

  val all: Seq[Q] = Seq(qRepetition, qSourceStats, qFilterPipeline, qContamination,
    qBoilerplate, qCorpusCard, qCorpusRelease, qReleaseCard)
}
