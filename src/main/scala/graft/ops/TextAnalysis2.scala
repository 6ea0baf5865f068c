package graft.ops

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-2 text-analysis operators (SURVEY.md §2.4 additions): token
  * entropy, readability scoring, TF-IDF keyword extraction, deterministic
  * stratified sampling. Reference text-mining analog: python/grant_tagger.py
  * and the abstract-scoring passes in loaders/load-JensenLab*.py.
  *
  * Determinism notes: every floating sum over a variable-length set is
  * rounded per-term to 12 dp and accumulated in DECIMAL (order-independent);
  * single-row formulas are fixed-shape double math + round.
  */
object TextAnalysis2 {

  /** Shannon entropy of each document's token distribution — the usual
    * gibberish/boilerplate detector in corpus QC. Per-token terms are
    * (c/n)·log2(n/c) >= 0, rounded then summed exactly. */
  val qEntropy: Q = Q(
    "q_entropy",
    """WITH tf AS (
      |  SELECT doc_id, token, COUNT(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token <> '' GROUP BY doc_id, token),
      |tot AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS k FROM tf GROUP BY doc_id)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(k AS BIGINT) AS n_distinct,
      |  round(CAST(SUM(CAST(round(
      |      (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * log2(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)),
      |    12) AS DECIMAL(18,12))) AS DOUBLE), 6) AS entropy
      |FROM tf JOIN tot USING (doc_id)
      |GROUP BY doc_id, n, k
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tf = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    val tot = tf.groupBy("doc_id")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("k"))
    tf.join(tot, "doc_id")
      .withColumn("term",
        round((dbl(col("c")) / dbl(col("n"))) * log2(dbl(col("n")) / dbl(col("c"))), 12)
          .cast(DecimalType(18, 12)))
      .groupBy("doc_id", "n", "k")
      .agg(round(dbl(sum(col("term"))), 6).as("entropy"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("k").as("n_distinct"),
        col("entropy"))
      .orderBy("doc_id")
  }

  /** Flesch-style readability: sentence and long-word densities with fixed
    * weights — pure per-row codegen'd regex counting, runs at scan speed. */
  val qReadability: Q = Q(
    "q_readability",
    """SELECT doc_id, words, sentences, long_words,
      |  round(206.835
      |    - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
      |    - 84.6 * (CAST(long_words AS DOUBLE) / CAST(words AS DOUBLE)), 4) AS readability
      |FROM (SELECT doc_id,
      |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS words,
      |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS sentences,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z]{8,}')) AS BIGINT) AS long_words
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"),
        lng(size(split(trim(col("text")), " "))).as("words"),
        lng(greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))).as("sentences"),
        lng(regexp_count(col("text"), lit("[A-Za-z]{8,}"))).as("long_words"))
      .withColumn("readability",
        round(lit(206.835)
          - lit(1.015) * (dbl(col("words")) / dbl(col("sentences")))
          - lit(84.6) * (dbl(col("long_words")) / dbl(col("words"))), 4))
      .orderBy("doc_id")
  }

  /** Top-3 TF-IDF keywords per document. The document-frequency table is
    * vocabulary-sized (≪ corpus), so at scale the df join broadcasts and
    * the corpus shuffles once, on (doc, token), for the tf aggregation. */
  val qTfidf: Q = Q(
    "q_tfidf",
    """WITH tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token <> '' GROUP BY doc_id, token),
      |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, tf.token AS token, tf, df,
      |    round(CAST(tf AS DOUBLE) *
      |      (ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) + 1.0), 6) AS tfidf
      |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN nd)
      |SELECT doc_id, token, tf, df, tfidf, rn FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |                               ORDER BY tfidf DESC, token) AS rn
      |  FROM scored)
      |WHERE rn <= 3
      |ORDER BY doc_id, rn""".stripMargin) { (s, d) =>
    val tf = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nd = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(df), "token").crossJoin(broadcast(nd))
      .withColumn("tfidf",
        round(dbl(col("tf")) *
          (log((dbl(col("n_docs")) + 1.0) / (dbl(col("df")) + 1.0)) + 1.0), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("rn", lng(row_number().over(w)))
      .filter(col("rn") <= 3)
      .select("doc_id", "token", "tf", "df", "tfidf", "rn")
      .orderBy("doc_id", "rn")
  }

  /** Deterministic stratified sampling (train/eval split at corpus scale):
    * keep a row iff the hex prefix of md5(key) falls under its stratum's
    * threshold. Pure map-side filter — no shuffle, no RNG state, identical
    * sample on any engine/partitioning, rerun-stable. */
  val qStratifiedSample: Q = Q(
    "q_stratified_sample",
    """SELECT c_custkey, c_mktsegment,
      |  substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4) AS h
      |FROM customer
      |WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4) <
      |  CASE c_mktsegment WHEN 'BUILDING' THEN '4000'
      |                    WHEN 'AUTOMOBILE' THEN '2000'
      |                    ELSE '1000' END
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val h = substring(md5(col("c_custkey").cast(StringType)), 1, 4)
    T.customer(s, d)
      .withColumn("h", h)
      .filter(col("h") <
        when(col("c_mktsegment") === "BUILDING", "4000")
          .when(col("c_mktsegment") === "AUTOMOBILE", "2000")
          .otherwise("1000"))
      .select("c_custkey", "c_mktsegment", "h")
      .orderBy("c_custkey")
  }

  /** Corpus text normalization (the cleaning pass before dedup/training):
    * lowercase, collapse whitespace runs, strip non-printable/control
    * bytes, trim — all codegen'd regexp_replace, pure map-side. Emits a
    * changed flag and both lengths so the pass is auditable. */
  val qTextNormalize: Q = Q(
    "q_text_normalize",
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[\x00-\x1F]', '', 'g'), ' +', ' ', 'g')) AS norm_text,
      |  CAST(length(text) AS BIGINT) AS raw_len,
      |  CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[\x00-\x1F]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS norm_len,
      |  (trim(regexp_replace(regexp_replace(lower(text), '[\x00-\x1F]', '', 'g'), ' +', ' ', 'g')) <> text) AS changed
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[\\x00-\\x1F]", ""), " +", " "))
    T.documents(s, d)
      .select(col("doc_id"), norm.as("norm_text"),
        lng(length(col("text"))).as("raw_len"),
        lng(length(norm)).as("norm_len"),
        (norm =!= col("text")).as("changed"))
      .orderBy("doc_id")
  }

  /** Pattern redaction (PII-style scrub): mask email-shaped and long-digit
    * tokens, count replacements — the standard pre-training scrub pass,
    * again pure codegen regex at scan speed. */
  val qRedact: Q = Q(
    "q_redact",
    """SELECT doc_id,
      |  regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'), '\d{6,}', '<NUM>', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '\d{6,}')) AS BIGINT) AS n_long_nums
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    T.documents(s, d)
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"), emailPat, "<EMAIL>"),
          "\\d{6,}", "<NUM>").as("redacted"),
        lng(regexp_count(col("text"), lit(emailPat))).as("n_emails"),
        lng(regexp_count(col("text"), lit("\\d{6,}"))).as("n_long_nums"))
      .orderBy("doc_id")
  }

  /** Deterministic weighted sampling (A-ES weighted reservoir, the data-
    * mixing primitive: longer/better docs drawn more often): priority =
    * u^(1/w) with u a Knuth-multiplicative-hash uniform — pure integer
    * math + one fixed-shape pow, so the "random" draw is reproducible on
    * any engine and any partitioning; top-k priorities per stratum win.
    * One window shuffle on the stratum key. */
  val qWeightedSample: Q = Q(
    "q_weighted_sample",
    """WITH p AS (
      |  SELECT doc_id, source, n_chars,
      |    round(pow(CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0,
      |              1.0 / CAST(n_chars AS DOUBLE)), 10) AS priority
      |  FROM documents)
      |SELECT doc_id, source, n_chars, priority, rn FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
      |                               ORDER BY priority DESC, doc_id) AS rn
      |  FROM p)
      |WHERE rn <= 3
      |ORDER BY source, rn""".stripMargin) { (s, d) =>
    // mask the id to 31 bits BEFORE the Knuth multiply: (2^31-1)*2654435761
    // ≈ 5.7e18 provably fits int64 on every engine, whereas an unmasked
    // doc_id over ~3.47e9 overflows — Spark would wrap while DuckDB raises,
    // breaking the "reproducible on any engine" determinism claim at scale.
    val u = dbl(pmod(pmod(col("doc_id"), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))) / lit(4294967296.0)
    val p = T.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(pow(u, lit(1.0) / dbl(col("n_chars"))), 10).as("priority"))
    val w = Window.partitionBy("source").orderBy(col("priority").desc, col("doc_id"))
    p.withColumn("rn", lng(row_number().over(w)))
      .filter(col("rn") <= 3)
      .orderBy("source", "rn")
  }

  val all: Seq[Q] = Seq(qEntropy, qReadability, qTfidf, qStratifiedSample,
    qTextNormalize, qRedact, qWeightedSample)
}
