package graft.ops

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** Second wave of corpus-quality operators: per-document n-gram novelty
  * (the memorization/diversity signal), within-document paragraph dedup
  * (order-preserving keep-first), and the per-source dedup-savings report
  * that turns the exact-dedup pass into the numbers a mix planner needs.
  *
  * Reference analog: the per-source QC rollups the loader scripts print
  * after each ingest (e.g. loaders/load-PubMed.py's per-dataset counts);
  * re-expressed as corpus-scale Spark aggregations.
  */
object CorpusQuality2 {

  /** Per-document n-gram novelty: the fraction of a doc's distinct word
    * trigrams that appear in NO other document. Low novelty = the doc is
    * assembled from corpus-common text (template/boilerplate/copy); high
    * novelty = unique content. Complements q_contamination (overlap with a
    * fixed probe set) and q_boilerplate (chunk frequency): novelty is the
    * per-doc rollup of corpus-wide gram document-frequency.
    *
    * Scale shape: grams are int64 hashes (projection only); one gram-keyed
    * aggregation computes document frequency, one doc-keyed aggregation
    * rolls up — both shuffles are on uniform keys, nothing collects. The
    * gram-df table is reused by the self-join via a single shuffle-keyed
    * join (no broadcast of corpus-sized state).
    */
  /** Per-doc novelty rollup over corpus-wide gram document frequency.
    * Output: (doc_id, n_grams, n_novel, novelty). */
  def ngramNovelty(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame = {
    val sh = Dedup.wordShingleHashes(docs, idCol, textCol, n)
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("ndocs"))
    sh.join(dfreq, "sh")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("ndocs") === 1, 1L).otherwise(0L)).as("n_novel"),
        round(dbl(sum(when(col("ndocs") === 1, 1L).otherwise(0L))) / dbl(count(lit(1))), 6)
          .as("novelty"))
  }

  val qNgramNovelty: Q = Q(
    "q_ngram_novelty",
    """WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS tok FROM documents),
      |sh0 AS (SELECT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS sh
      |        FROM toks, unnest(range(1, len(tok) - 1)) AS t(i) WHERE len(tok) >= 3),
      |fb AS (SELECT doc_id, text AS sh FROM toks WHERE len(tok) < 3),
      |sh AS (SELECT DISTINCT doc_id, sh FROM (SELECT * FROM sh0 UNION ALL SELECT * FROM fb)),
      |dfreq AS (SELECT sh, COUNT(*) AS ndocs FROM sh GROUP BY 1)
      |SELECT s.doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN d.ndocs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  round(CAST(SUM(CASE WHEN d.ndocs = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |        / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
      |FROM sh s JOIN dfreq d USING (sh)
      |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    ngramNovelty(T.documents(s, d), "doc_id", "text", 3).orderBy("doc_id")
  }

  /** Within-document paragraph dedup (order-preserving keep-first): split
    * each doc into fixed 8-token chunks (the paragraph stand-in, same
    * chunking as q_boilerplate), drop every repeat of a chunk already seen
    * earlier in the SAME doc, and re-assemble the cleaned text. The
    * intra-doc counterpart of q_repetition's detection — this one rewrites.
    *
    * Scale shape: zero shuffles. Chunking, keep-first filtering
    * (`filter(chunks, (c, i) -> array_position(chunks, c) = i+1)` — first
    * occurrence wins) and re-assembly are all array expressions in one
    * map-side projection; per-doc cost is O(chunks²) on in-memory arrays,
    * corpus cost is one scan. */
  /** Order-preserving within-doc chunk dedup, all map-side.
    * Output: (idCol, n_chunks, n_removed, cleaned). */
  def paraDedup(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, chunkTokens: Int = 8): org.apache.spark.sql.DataFrame = {
    val nChunks = floor((size(col("__toks")) - 1) / chunkTokens).cast("int") + 1
    val chunks = transform(sequence(lit(0), nChunks - 1),
      c => concat_ws(" ", slice(col("__toks"), c * chunkTokens + 1, lit(chunkTokens))))
    docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), chunks.as("__chunks"))
      .select(col(idCol),
        size(col("__chunks")).cast("long").as("n_chunks"),
        filter(col("__chunks"),
          (c, i) => array_position(col("__chunks"), c) === (i + 1).cast("long"))
          .as("__kept"))
      .select(col(idCol), col("n_chunks"),
        (col("n_chunks") - size(col("__kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("__kept")).as("cleaned"))
  }

  val qParaDedup: Q = Q(
    "q_para_dedup",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
      |pos AS (SELECT doc_id, unnest(tok) AS t, generate_subscripts(tok, 1) AS ord FROM toks),
      |ch AS (SELECT doc_id, (ord - 1) // 8 AS cid, string_agg(t, ' ' ORDER BY ord) AS chunk
      |       FROM pos GROUP BY 1, 2),
      |mk AS (SELECT doc_id, cid, chunk,
      |         MIN(cid) OVER (PARTITION BY doc_id, chunk) AS first_cid FROM ch)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |  CAST(SUM(CASE WHEN cid <> first_cid THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  string_agg(CASE WHEN cid = first_cid THEN chunk END, ' ' ORDER BY cid) AS cleaned
      |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    paraDedup(T.documents(s, d), "doc_id", "text", 8).orderBy("doc_id")
  }

  /** Per-source dedup-savings report: token supply before exact dedup,
    * tokens/docs removed by corpus-wide exact dedup (survivor = min
    * doc_id; a duplicate's cost is charged to the source holding the
    * REMOVED copy), and the savings fraction. This is the report that
    * justifies the dedup pass and feeds q_mix_plan's supply numbers.
    *
    * Scale shape: one fingerprint aggregation (md5-keyed), one key-
    * partitioned join back on the fingerprint, one mixture-sized source
    * rollup. All corpus-sized intermediates stay key-partitioned. */
  /** Per-group exact-dedup savings accounting.
    * Output: (groupCol, n_docs, tokens, dup_docs, saved_tokens, savings_frac). */
  def dedupSavings(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, groupCol: String): org.apache.spark.sql.DataFrame = {
    val fp = docs
      .select(col(idCol), col(groupCol),
        size(split(col(textCol), " ")).cast("long").as("ntok"),
        md5(col(textCol)).as("fp"))
    val surv = fp.groupBy("fp").agg(min(col(idCol)).as("sid"))
    fp.join(surv, "fp")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("tokens"),
        sum(when(col(idCol) === col("sid"), 0L).otherwise(1L)).as("dup_docs"),
        sum(when(col(idCol) === col("sid"), 0L).otherwise(col("ntok"))).as("saved_tokens"),
        round(dbl(sum(when(col(idCol) === col("sid"), 0L).otherwise(col("ntok"))))
          / dbl(sum(col("ntok"))), 6).as("savings_frac"))
  }

  val qDedupSavings: Q = Q(
    "q_dedup_savings",
    """WITH fp AS (SELECT doc_id, source, len(string_split(text, ' ')) AS ntok,
      |              md5(text) AS fp FROM documents),
      |surv AS (SELECT fp, MIN(doc_id) AS sid FROM fp GROUP BY 1)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(ntok) AS BIGINT) AS tokens,
      |  CAST(SUM(CASE WHEN doc_id = sid THEN 0 ELSE 1 END) AS BIGINT) AS dup_docs,
      |  CAST(SUM(CASE WHEN doc_id = sid THEN 0 ELSE ntok END) AS BIGINT) AS saved_tokens,
      |  round(CAST(SUM(CASE WHEN doc_id = sid THEN 0 ELSE ntok END) AS DOUBLE)
      |        / CAST(SUM(ntok) AS DOUBLE), 6) AS savings_frac
      |FROM fp JOIN surv USING (fp)
      |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    dedupSavings(T.documents(s, d), "doc_id", "text", "source").orderBy("source")
  }

  /** Reliability diagram (calibration bins) for the heuristic quality
    * score against a real observable: does a higher quality score
    * actually predict "this doc is the exact-dedup survivor"? Ten
    * equal-width score bins; per bin: count, decimal-exact mean score,
    * observed survivor rate, and the calibration gap (observed − mean
    * predicted) whose |sum·weight| is ECE. The eval-harness staple for
    * ANY score the mix planner consumes (quality tiers, perplexity,
    * lang-id confidence) — mis-calibrated scores silently distort every
    * downstream sampling rate. One scan + fingerprint agg + 10-row
    * rollup; nothing corpus-sized leaves the executors. */
  val qCalibration: Q = Q(
    "q_calibration",
    """WITH q AS (SELECT doc_id, text,
      |    round(0.4 * (CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|of|and|or|to|in)\b')) AS DOUBLE)
      |          / CAST(len(string_split(trim(text), ' ')) AS DOUBLE))
      |      + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / CAST(length(text) AS DOUBLE))
      |      + 0.3 * least(1.0, CAST(len(string_split(trim(text), ' ')) AS DOUBLE) / 100.0), 6) AS score
      |  FROM documents),
      |surv AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      |lab AS (SELECT q.doc_id, q.score,
      |    CASE WHEN surv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS y,
      |    CAST(greatest(least(CAST(floor(q.score * 10) AS BIGINT), 9), 0) AS BIGINT) AS bin
      |  FROM q LEFT JOIN surv ON surv.doc_id = q.doc_id)
      |SELECT bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  round(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_score,
      |  round(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS survivor_rate,
      |  round(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |      - CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS gap
      |FROM lab GROUP BY bin ORDER BY bin""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val q = docs.select(col("doc_id"),
      TextAnalysis.qualityScoreExpr(col("text")).as("score"))
    val surv = docs.groupBy(md5(col("text")).as("__fp"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"), lit(1L).as("y1"))
    q.join(surv, Seq("doc_id"), "left")
      .select(col("score"), coalesce(col("y1"), lit(0L)).as("y"),
        greatest(least(floor(col("score") * 10).cast("long"), lit(9L)), lit(0L)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        round(dbl(sum(col("score").cast(org.apache.spark.sql.types.DecimalType(18, 6))))
          / dbl(count(lit(1))), 6).as("mean_score"),
        round(dbl(sum(col("y"))) / dbl(count(lit(1))), 6).as("survivor_rate"),
        round(dbl(sum(col("y"))) / dbl(count(lit(1)))
          - dbl(sum(col("score").cast(org.apache.spark.sql.types.DecimalType(18, 6))))
          / dbl(count(lit(1))), 6).as("gap"))
      .orderBy("bin")
  }

  val all: Seq[Q] = Seq(qNgramNovelty, qParaDedup, qDedupSavings, qCalibration)
}
