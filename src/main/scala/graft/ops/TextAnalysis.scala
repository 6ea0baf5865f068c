package graft.ops

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (SURVEY.md §2.4):
  * language ID, quality scoring, token counting, fingerprinting. All are
  * pure narrow per-row transforms (no shuffle), built from codegen'd
  * builtin functions — they run at scan speed and pipeline into whatever
  * aggregation follows. The reference's text-mining analog is
  * python/grant_tagger.py (string tagging of grant abstracts).
  */
object TextAnalysis {

  /** Count of regex matches (codegen'd builtin). */
  def matches(c: Column, pat: String): Column = regexp_count(c, lit(pat))

  /** The canonical heuristic quality score as ONE shared Column over a
    * raw text column — used by q_quality_score, q_quality_tiers and
    * q_calibration, so the formula the mix planner consumes and the
    * gates that audit it can never drift apart. */
  def qualityScoreExpr(text: Column): Column = {
    val toks = dbl(lng(size(split(trim(text), " "))))
    round(lit(0.4) * (dbl(lng(matches(lower(text), "\\b(the|a|an|of|and|or|to|in)\\b"))) / toks)
      + lit(0.3) * (lit(1.0) - dbl(lng(matches(text, "[.,;:!?]"))) / dbl(lng(length(text))))
      + lit(0.3) * least(lit(1.0), toks / lit(100.0)), 6)
  }

  // Marker-stopword scores per language (deterministic, SQL-replicable).
  def enScore(t: Column): Column = matches(t, "\\b(the|and|of|to|in)\\b")
  def deScore(t: Column): Column = matches(t, "\\b(der|die|und|das|ist)\\b")
  def esScore(t: Column): Column = matches(t, "\\b(el|la|los|las|una)\\b")
  def frScore(t: Column): Column = matches(t, "\\b(le|les|des|une|est)\\b")

  /** Language-ID over marker-token counts; priority order en>de>es>fr on
    * ties, 'unknown' when no marker hits. */
  val qLangId: Q = Q(
    "q_lang_id",
    """SELECT doc_id,
      |  CASE WHEN en >= de AND en >= es AND en >= fr AND en > 0 THEN 'en'
      |       WHEN de >= es AND de >= fr AND de > 0 THEN 'de'
      |       WHEN es >= fr AND es > 0 THEN 'es'
      |       WHEN fr > 0 THEN 'fr'
      |       ELSE 'unknown' END AS pred_lang,
      |  en, de, es, fr
      |FROM (SELECT doc_id,
      |    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS BIGINT) AS en,
      |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS de,
      |    CAST(len(regexp_extract_all(lower(text), '\b(el|la|los|las|una)\b')) AS BIGINT) AS es,
      |    CAST(len(regexp_extract_all(lower(text), '\b(le|les|des|une|est)\b')) AS BIGINT) AS fr
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = lower(col("text"))
    T.documents(s, d)
      .select(col("doc_id"),
        lng(enScore(t)).as("en"), lng(deScore(t)).as("de"),
        lng(esScore(t)).as("es"), lng(frScore(t)).as("fr"))
      .withColumn("pred_lang",
        when(col("en") >= col("de") && col("en") >= col("es") && col("en") >= col("fr") && col("en") > 0, "en")
          .when(col("de") >= col("es") && col("de") >= col("fr") && col("de") > 0, "de")
          .when(col("es") >= col("fr") && col("es") > 0, "es")
          .when(col("fr") > 0, "fr")
          .otherwise("unknown"))
      .select("doc_id", "pred_lang", "en", "de", "es", "fr")
      .orderBy("doc_id")
  }

  /** Document quality score: stopword density, punctuation ratio, length
    * saturation — fixed-weight formula, fixed double op order. */
  val qQualityScore: Q = Q(
    "q_quality_score",
    """SELECT doc_id, chars, tokens, punct, stop,
      |  round(0.4 * (CAST(stop AS DOUBLE) / CAST(tokens AS DOUBLE))
      |      + 0.3 * (1.0 - CAST(punct AS DOUBLE) / CAST(chars AS DOUBLE))
      |      + 0.3 * least(1.0, CAST(tokens AS DOUBLE) / 100.0), 6) AS quality
      |FROM (SELECT doc_id,
      |    CAST(length(text) AS BIGINT) AS chars,
      |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tokens,
      |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct,
      |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|of|and|or|to|in)\b')) AS BIGINT) AS stop
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), col("text"),
        lng(length(col("text"))).as("chars"),
        lng(size(split(trim(col("text")), " "))).as("tokens"),
        lng(matches(col("text"), "[.,;:!?]")).as("punct"),
        lng(matches(lower(col("text")), "\\b(the|a|an|of|and|or|to|in)\\b")).as("stop"))
      .withColumn("quality", qualityScoreExpr(col("text")))
      .drop("text")
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens + a BPE-ish segmentation count
    * (letter runs / digits / single punctuation, the usual pre-tokenizer
    * shape) + a chars-per-token ratio. */
  val qTokenCount: Q = Q(
    "q_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe_tokens,
      |  round(CAST(length(text) AS DOUBLE) / CAST(len(string_split(trim(text), ' ')) AS DOUBLE), 6) AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ws = size(split(trim(col("text")), " "))
    T.documents(s, d)
      .select(col("doc_id"),
        lng(ws).as("ws_tokens"),
        lng(matches(col("text"), "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]")).as("bpe_tokens"),
        round(dbl(length(col("text"))) / dbl(ws), 6).as("chars_per_token"))
      .orderBy("doc_id")
  }

  /** Stable content fingerprint + shard bucket (md5 is identical across
    * engines; the 2-hex-char prefix is the shard/bucket key a 100 TB
    * dedup would partition by). */
  val qFingerprint: Q = Q(
    "q_fingerprint",
    """SELECT doc_id, md5(text) AS fp, substr(md5(text), 1, 2) AS bucket, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        substring(md5(col("text")), 1, 2).as("bucket"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Winnowed (MOSS-style) fingerprints: rolling n-byte hashes, then the
    * minimum of each w-length hash window, deduplicated. Two documents
    * sharing text of >= n+w-1 bytes share a fingerprint — so equal
    * fingerprints are near-dup candidate join keys at corpus scale. */
  def winnowedFingerprints(docs: org.apache.spark.sql.DataFrame, idCol: String,
                           textCol: String, n: Int, w: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = docs.select(col(idCol).as("id"),
      posexplode(graft.functions.RollingHash(col(textCol), n)).as(Seq("pos", "h")))
    val win = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    hashed.withColumn("fp", min("h").over(win))
      .select("id", "fp").distinct()
  }

  /** Fully oracled (r10 — previously rows-only "custom hash isn't
    * SQL-portable"): [[RollingHash]]'s polynomial hash is plain wrapping
    * int64 arithmetic, so DuckDB replays every window hash through
    * [[OracleKit.mul64]] — one mul-add per byte as nested projections
    * over the UTF-8 BYTE list ([[OracleKit.utf8BytesSql]]; window count
    * and positions use `strlen`, the BYTE length, exactly matching
    * [[RollingHash]]'s byte windows on any script) — then the same
    * w-row MIN window. */
  private def winnowOracleSql(n: Int = 16, w: Int = 8): String = {
    val chain = OracleKit.nestedProjections(
      s"SELECT doc_id, bl, unnest(range(0, nb - $n + 1)) AS p" +
        s" FROM (SELECT doc_id, ${OracleKit.utf8BytesSql("text")} AS bl," +
        s" strlen(text)::BIGINT AS nb FROM documents WHERE strlen(text) >= $n)",
      OracleKit.polyHashFoldSteps("bl", "p", n, 1000003L), "doc_id, p, hh")
    s"""WITH wh AS MATERIALIZED ($chain),
       |wmin AS MATERIALIZED (SELECT doc_id, MIN(hh) OVER (PARTITION BY doc_id ORDER BY p
       |  ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp FROM wh),
       |wfp AS (SELECT DISTINCT doc_id, fp FROM wmin)
       |SELECT doc_id, COUNT(*)::BIGINT AS n_fingerprints, MIN(fp) AS min_fp
       |FROM wfp GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val qFingerprintWinnow: Q = Q("q_fingerprint_winnow", winnowOracleSql()) { (s, d) =>
    winnowedFingerprints(T.documents(s, d), "doc_id", "text", 16, 8)
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_fingerprints"), min(col("fp")).as("min_fp"))
      .orderBy("doc_id")
  }

  /** ExactSubstr-style repeated-substring dedup profile (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better" §ExactSubstr):
    * find every maximal span of ≥ L bytes that occurs in ≥ 2 distinct
    * documents, per doc. The suffix-array of the paper is replaced by the
    * scalable window-hash equivalent: every L-byte window's rolling hash
    * ([[RollingHash]] — collision odds vanish at 64 bits and the oracle
    * hash-match would surface one), cross-document repeated hashes keep
    * their windows, and overlapping/adjacent windows (gap ≤ L) merge into
    * maximal spans via the island pattern. Output per doc: span count,
    * repeated bytes, repeated fraction.
    *
    * At scale: one projection (the hash array), one window-hash
    * aggregation (the only corpus-wide shuffle — key is an 8-byte long),
    * a hash semi-join back, and one doc-partitioned window for the
    * island merge. No pair join ever forms — cost is O(corpus bytes),
    * which is the reason ExactSubstr scales where pairwise dedup cannot.
    *
    * Fully oracled from birth: the rolling hash replays byte-by-byte
    * (the q_fingerprint_winnow chain at L=50); the merge is plain SQL. */
  /** The shared window-hash recursion: every doc's L-byte rolling hashes
    * as `sh(doc_id, p, hh)` — the ROLLING recurrence, not a per-window
    * fold (recomputing every 50-byte window from scratch costs windows×l
    * lambda evals, ~16 s at sf0.01); the recursive CTE advances every
    * doc one position per level — h' = (h − b_p·base^(l−1))·base +
    * b_{p+l} — exactly RollingHash.hashes' update, windows×1 work.
    * Shared by the within-corpus (q_dedup_substr) and cross-set
    * (q_span_decontam) span oracles. */
  private def rollingWindowCtes(l: Int): String = {
    val base = 1000003L
    var pow = 1L // base^(l-1) mod 2^64, the leading-byte weight
    for (_ <- 1 until l) pow *= base
    // byte-level (VERDICT r11 #2): the UTF-8 byte list replaces the text
    // through the recursion, lengths/positions are BYTE-based (strlen),
    // so the replay matches RollingHash's byte windows on any script
    val anchor = OracleKit.nestedProjections(
      s"SELECT doc_id, bl, len, 0::BIGINT AS p" +
        s" FROM (SELECT doc_id, ${OracleKit.utf8BytesSql("text")} AS bl," +
        s" strlen(text)::BIGINT AS len FROM documents WHERE strlen(text) >= $l)",
      OracleKit.polyHashFoldSteps("bl", "p", l, base), "doc_id, bl, len, p, rhu")
    val bOut = "r.bl[(r.p + 1)::INT]::UBIGINT" // byte leaving the window
    val bIn = s"r.bl[(r.p + $l + 1)::INT]::UBIGINT" // byte entering
    val stripped = s"((r.rhu::HUGEINT - ${OracleKit.mul64(bOut, pow)}::HUGEINT" +
      " + 18446744073709551616) % 18446744073709551616)::UBIGINT"
    val next = s"((${OracleKit.mul64(s"($stripped)", base)}::HUGEINT + $bIn) % 18446744073709551616)::UBIGINT"
    s"""WITH RECURSIVE roll(doc_id, bl, len, p, rhu) AS (
       |  $anchor
       |  UNION ALL
       |  SELECT r.doc_id, r.bl, r.len, r.p + 1, $next
       |  FROM roll r WHERE r.p + 1 <= r.len - $l),
       |sh AS MATERIALIZED (SELECT doc_id, p, ${OracleKit.toSigned64("rhu")} AS hh FROM roll),
       |""".stripMargin
  }

  private def dedupSubstrOracleSql(l: Int = 50): String =
    rollingWindowCtes(l) +
      s"""rep AS MATERIALIZED (SELECT hh FROM sh GROUP BY hh HAVING COUNT(DISTINCT doc_id) >= 2),
       |hits AS MATERIALIZED (SELECT s.doc_id, s.p FROM sh s JOIN rep USING (hh)),
       |isl AS (SELECT doc_id, p,
       |    SUM(CASE WHEN prev IS NULL OR p - prev > $l THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY p) AS island
       |  FROM (SELECT doc_id, p, LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev FROM hits)),
       |spans AS (SELECT doc_id, island, MAX(p) + $l - MIN(p) AS len FROM isl GROUP BY doc_id, island),
       |agg AS (SELECT doc_id, COUNT(*)::BIGINT AS n_spans, CAST(SUM(len) AS BIGINT) AS repeated_bytes
       |  FROM spans GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(a.n_spans, 0)::BIGINT AS n_spans,
       |  COALESCE(a.repeated_bytes, 0)::BIGINT AS repeated_bytes,
       |  round(CAST(COALESCE(a.repeated_bytes, 0) AS DOUBLE) / CAST(length(d.text) AS DOUBLE), 6) AS repeated_frac
       |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id ORDER BY d.doc_id""".stripMargin

  val qDedupSubstr: Q = Q("q_dedup_substr", dedupSubstrOracleSql()) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val l = 50
    val docs = T.documents(s, d)
    val hashed = docs
      .select(col("doc_id"), posexplode(graft.functions.RollingHash(col("text"), l)).as(Seq("p", "h")))
    val rep = hashed.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("h")
    val hits = hashed.join(rep, "h").select("doc_id", "p")
    val wDoc = Window.partitionBy("doc_id").orderBy("p")
    val isl = hits
      .withColumn("prev", lag(col("p"), 1).over(wDoc))
      .withColumn("island",
        sum(when(col("prev").isNull || col("p") - col("prev") > l, 1).otherwise(0)).over(wDoc))
    val spans = isl.groupBy("doc_id", "island")
      .agg((max(col("p")) + l - min(col("p"))).as("len"))
    val agg = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(col("len")).cast("long").as("repeated_bytes"))
    docs.select(col("doc_id"), length(col("text")).as("nlen"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("repeated_bytes"), lit(0L)).as("repeated_bytes"),
        round(dbl(coalesce(col("repeated_bytes"), lit(0L))) / dbl(col("nlen")), 6).as("repeated_frac"))
      .orderBy("doc_id")
  }

  /** Dictionary tagging (python/grant_tagger.py tags grant abstracts
    * against target-name dictionaries): explode tokens, broadcast-join a
    * term→tag dictionary, count matches per (doc, tag). At scale the
    * dictionary is the broadcast side; the corpus never shuffles before
    * the (doc, tag) aggregation. */
  val dictionary: Seq[(String, String)] = Seq(
    "join" -> "operator", "scan" -> "operator", "merge" -> "operator",
    "sort" -> "operator", "filter" -> "operator",
    "customer" -> "entity", "order" -> "entity", "part" -> "entity",
    "table" -> "object", "row" -> "object", "column" -> "object",
    "fast" -> "qualifier", "slow" -> "qualifier", "small" -> "qualifier")

  val qDictTag: Q = Q(
    "q_dict_tag",
    """SELECT doc_id, tag, COUNT(*) AS n_hits
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
      |JOIN (VALUES ('join','operator'),('scan','operator'),('merge','operator'),
      |  ('sort','operator'),('filter','operator'),('customer','entity'),
      |  ('order','entity'),('part','entity'),('table','object'),('row','object'),
      |  ('column','object'),('fast','qualifier'),('slow','qualifier'),
      |  ('small','qualifier')) AS dict(term, tag)
      |  ON t.token = dict.term
      |GROUP BY doc_id, tag
      |ORDER BY doc_id, tag""".stripMargin) { (s, d) =>
    import s.implicits._
    val dict = dictionary.toDF("term", "tag")
    T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .join(broadcast(dict), col("token") === col("term"))
      .groupBy("doc_id", "tag")
      .agg(count(lit(1)).as("n_hits"))
      .orderBy("doc_id", "tag")
  }

  /** Fractional mention scoring — the reference's PubTator gene-score
    * algorithm (perl/pubtator_count.pl, loaded by
    * loaders/load-PubTatorScores.py): within each document, every tagged
    * mention splits the document's unit of attention proportionally
    * (score contribution = mentions_of_term / total_mentions_in_doc),
    * and a term's corpus score is the sum of its per-document shares —
    * so a term dominating few docs outranks one diluted across many.
    * One explode + broadcast dict join + one (doc,term,tag) aggregation;
    * the per-doc total is a window over the aggregated table (no second
    * corpus scan — the window's doc_id exchange moves only the
    * map-side-combined per-doc rows, ≤ dict-size per doc, which at any
    * corpus scale is far smaller than re-shuffling raw token hits would
    * be). Shares are fixed-shape doubles rounded to 12 dp
    * then summed as DECIMAL(18,12) — order/partition-invariant (the
    * q_hhi recipe). */
  val qMentionScore: Q = Q(
    "q_mention_score",
    """WITH hits AS (
      |  SELECT doc_id, term, tag
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
      |  JOIN (VALUES ('join','operator'),('scan','operator'),('merge','operator'),
      |    ('sort','operator'),('filter','operator'),('customer','entity'),
      |    ('order','entity'),('part','entity'),('table','object'),('row','object'),
      |    ('column','object'),('fast','qualifier'),('slow','qualifier'),
      |    ('small','qualifier')) AS dict(term, tag)
      |    ON t.token = dict.term),
      |per_doc AS (SELECT doc_id, term, tag, COUNT(*) AS n FROM hits GROUP BY 1, 2, 3),
      |share AS (SELECT term, tag,
      |    round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY doc_id), 12) AS sh
      |  FROM per_doc)
      |SELECT term, tag, COUNT(*) AS n_docs,
      |  round(CAST(SUM(CAST(sh AS DECIMAL(18,12))) AS DOUBLE), 6) AS score
      |FROM share GROUP BY term, tag ORDER BY term""".stripMargin) { (s, d) =>
    import s.implicits._
    val dict = dictionary.toDF("term", "tag")
    val perDoc = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .join(broadcast(dict), col("token") === col("term"))
      .groupBy("doc_id", "term", "tag")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    perDoc
      .withColumn("sh", round(dbl(col("n")) / sum(col("n")).over(w), 12))
      .groupBy("term", "tag")
      .agg(count(lit(1)).as("n_docs"),
        round(dbl(sum(col("sh").cast(org.apache.spark.sql.types.DecimalType(18, 12)))), 6)
          .as("score"))
      .orderBy("term")
  }

  /** [[rollingWindowCtes]] + the cross-set filter + island merge →
    * `spans(doc_id, s, e)`: the leaked-span extents, shared by the
    * q_span_decontam and q_decontam_strip oracles. */
  private def crossSetSpanCtes(l: Int): String =
    rollingWindowCtes(l) +
      s"""rep AS MATERIALIZED (SELECT hh FROM sh GROUP BY hh
       |  HAVING MAX(CASE WHEN doc_id < 25 THEN 1 ELSE 0 END) = 1
       |     AND MAX(CASE WHEN doc_id >= 25 THEN 1 ELSE 0 END) = 1),
       |hits AS MATERIALIZED (SELECT s.doc_id, s.p FROM sh s JOIN rep USING (hh)
       |  WHERE s.doc_id >= 25),
       |isl AS (SELECT doc_id, p,
       |    SUM(CASE WHEN prev IS NULL OR p - prev > $l THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY p) AS island
       |  FROM (SELECT doc_id, p, LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev FROM hits)),
       |spans AS (SELECT doc_id, MIN(p) AS s, MAX(p) + $l AS e FROM isl GROUP BY doc_id, island),
       |""".stripMargin

  private def spanDecontamOracleSql(l: Int = 50): String =
    crossSetSpanCtes(l) +
      s"""agg AS (SELECT doc_id, COUNT(*)::BIGINT AS n_spans, CAST(SUM(e - s) AS BIGINT) AS lb
       |  FROM spans GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(a.n_spans, 0)::BIGINT AS n_leaked_spans,
       |  COALESCE(a.lb, 0)::BIGINT AS leaked_bytes,
       |  round(CAST(COALESCE(a.lb, 0) AS DOUBLE) / CAST(strlen(d.text) AS DOUBLE), 6) AS leaked_frac
       |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
       |WHERE d.doc_id >= 25 ORDER BY d.doc_id""".stripMargin

  /** SPAN-LEVEL decontamination (Lee et al. 2021 §ExactSubstr applied
    * cross-set; the OLMo-style span decontam pass): for every TRAINING
    * doc, the maximal spans of ≥ `l` bytes that verbatim-occur in ANY
    * benchmark doc (doc_id < 25, the held-out stand-in as in
    * q_decontam_index) — the surgical alternative to q_decontam_index's
    * whole-doc verdict: a page quoting one benchmark item loses the
    * quoted SPAN, not the page. Same window-hash machinery as
    * [[qDedupSubstr]] (no pair join, one long-keyed shuffle, O(corpus
    * bytes)); the cross-set filter swaps "≥2 distinct docs" for "seen on
    * BOTH sides of the train/benchmark split" — one max-flag aggregation
    * on the same key. Output per training doc: leaked-span count, bytes,
    * fraction (0 rows lost — docs with no leak report zeros, the shape
    * [[graft.ops.PipelineOps2.spanStrip]]-style downstream removal
    * needs). */
  /** The leaked spans themselves — per TRAINING doc, the maximal
    * (start, end) byte extents (0-based, end exclusive) occurring
    * verbatim in any benchmark doc. Islands are disjoint by
    * construction (a new island starts only when the gap exceeds `l`,
    * so its first window begins past the previous island's end), which
    * is what lets [[qDecontamStrip]] cut them with plain segment
    * concatenation. Shared by the report ([[qSpanDecontam]]) and the
    * apply ([[qDecontamStrip]]). */
  private def leakedSpans(docs: org.apache.spark.sql.DataFrame,
                          l: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = docs
      .select(col("doc_id"), posexplode(graft.functions.RollingHash(col("text"), l)).as(Seq("p", "h")))
    val rep = hashed.groupBy("h").agg(
        max(when(col("doc_id") < 25, 1).otherwise(0)).as("he"),
        max(when(col("doc_id") >= 25, 1).otherwise(0)).as("ht"))
      .filter(col("he") === 1 && col("ht") === 1).select("h")
    val hits = hashed.filter(col("doc_id") >= 25).join(rep, "h").select("doc_id", "p")
    val wDoc = Window.partitionBy("doc_id").orderBy("p")
    hits
      .withColumn("prev", lag(col("p"), 1).over(wDoc))
      .withColumn("island",
        sum(when(col("prev").isNull || col("p") - col("prev") > l, 1).otherwise(0)).over(wDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("p")).as("s"), (max(col("p")) + l).as("e"))
      .select("doc_id", "s", "e")
  }

  val qSpanDecontam: Q = Q("q_span_decontam", spanDecontamOracleSql()) { (s, d) =>
    val l = 50
    val docs = T.documents(s, d)
    val agg = leakedSpans(docs, l).groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(col("e") - col("s")).cast("long").as("lb"))
    docs.filter(col("doc_id") >= 25)
      // BYTE length: leaked_bytes over a byte denominator (extents are
      // byte offsets) — a char denominator overstated the fraction on
      // multi-byte scripts
      .select(col("doc_id"), octet_length(col("text")).as("nlen"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_leaked_spans"),
        coalesce(col("lb"), lit(0L)).as("leaked_bytes"),
        round(dbl(coalesce(col("lb"), lit(0L))) / dbl(col("nlen")), 6).as("leaked_frac"))
      .orderBy("doc_id")
  }

  /** `o` is a 0-based BYTE offset into byte-list column `db.bl`; true iff
    * the byte AT `o` is a UTF-8 continuation byte (0x80..0xBF). Offset 0
    * can never be one in valid UTF-8, and past-the-end reads are false,
    * so the snap arithmetic needs no other bounds guard. */
  private def contSql(o: String): String =
    s"($o >= 1 AND $o < db.blen AND db.bl[($o + 1)::INT] BETWEEN 128 AND 191)"

  private def snapDownSql(o: String): String =
    s"($o - (CASE WHEN NOT ${contSql(o)} THEN 0 WHEN NOT ${contSql(s"$o - 1")} THEN 1 " +
      s"WHEN NOT ${contSql(s"$o - 2")} THEN 2 ELSE 3 END))"

  private def snapUpSql(o: String): String =
    s"($o + (CASE WHEN NOT ${contSql(o)} THEN 0 WHEN NOT ${contSql(s"$o + 1")} THEN 1 " +
      s"WHEN NOT ${contSql(s"$o + 2")} THEN 2 ELSE 3 END))"

  private def decontamStripOracleSql(l: Int = 50): String =
    crossSetSpanCtes(l) +
      s"""docb AS MATERIALIZED (
       |  SELECT doc_id, ${graft.ops.OracleKit.utf8BytesSql("text")} AS bl,
       |         strlen(text)::BIGINT AS blen
       |  FROM documents WHERE doc_id >= 25),
       |cspans AS (
       |  SELECT doc_id,
       |    len(list_filter(db.bl[1:(${snapDownSql("sp.s")})::INT], x -> x < 128 OR x > 191))::BIGINT AS cs,
       |    len(list_filter(db.bl[1:(${snapUpSql("sp.e")})::INT],   x -> x < 128 OR x > 191))::BIGINT AS ce
       |  FROM spans sp JOIN docb db USING (doc_id)),
       |lastgap AS (
       |  SELECT c.doc_id, MAX(c.ce) AS gs, ANY_VALUE(length(d.text))::BIGINT AS ge
       |  FROM cspans c JOIN documents d ON d.doc_id = c.doc_id GROUP BY c.doc_id),
       |gaps AS (
       |  SELECT doc_id, COALESCE(LAG(ce) OVER (PARTITION BY doc_id ORDER BY cs), 0) AS gs,
       |         cs AS ge
       |  FROM cspans
       |  UNION ALL
       |  SELECT doc_id, gs, ge FROM lastgap),
       |ct AS (
       |  SELECT g.doc_id,
       |    string_agg(substr(d.text, (g.gs + 1)::INT, greatest(0, g.ge - g.gs)::INT), '' ORDER BY g.gs) AS clean_text
       |  FROM gaps g JOIN documents d USING (doc_id) GROUP BY g.doc_id),
       |n AS (SELECT doc_id, COUNT(*)::BIGINT AS n_cut FROM spans GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(n.n_cut, 0)::BIGINT AS n_cut,
       |  COALESCE(ct.clean_text, d.text) AS clean_text
       |FROM documents d LEFT JOIN ct USING (doc_id) LEFT JOIN n USING (doc_id)
       |WHERE d.doc_id >= 25 ORDER BY d.doc_id""".stripMargin

  /** The APPLY half of [[qSpanDecontam]] — cut the leaked spans and ship
    * the cleaned text (what a span-level decontam pass actually DOES to
    * the corpus: the quoted benchmark item is excised, the page
    * survives). Islands are disjoint (see [[leakedSpans]]), so the
    * cleaned doc is the ordered concatenation of the complement
    * segments — exact string surgery, identical across engines (the
    * oracle compares the cleaned TEXT itself, not a proxy metric). One
    * extra doc-keyed aggregation over the span table; the corpus is
    * still scanned once.
    *
    * BYTE-EXACT on every script (VERDICT r12 #5, supersedes the r12
    * char-position approximation): span extents are BYTE offsets
    * (RollingHash windows), so each extent is first SNAPPED OUTWARD to
    * a UTF-8 character boundary — start down to the beginning of the
    * character containing it, end up past the character containing it
    * (a partially-leaked character is excised whole: the conservative
    * posture for decontamination, and the only one that never emits a
    * split character). Snapped offsets ARE character boundaries, so
    * their exact character positions come from decoding the byte
    * prefix, and the surgery itself is plain character-domain segment
    * concatenation — identical on both engines, byte-for-byte equal to
    * a binary-slice cut at the snapped extents (Utf8OracleSpec runs
    * the full gate on a mixed-script corpus with spans landing inside
    * multi-byte characters). The snap reads at most 4 one-byte slices
    * per extent and one prefix decode — per SPAN cost, not per corpus
    * byte. */
  val qDecontamStrip: Q = Q("q_decontam_strip", decontamStripOracleSql()) { (s, d) =>
    val l = 50
    val docs = T.documents(s, d)
    val spans = leakedSpans(docs, l)
    stripSpans(docs.filter(col("doc_id") >= 25).select("doc_id", "text"), spans)
      .orderBy("doc_id")
  }

  /** BYTE-EXACT span surgery (the q_decontam_strip core, reusable — the
    * streaming strip sink applies it per micro-batch): cut every
    * (doc_id, s, e) BYTE extent of `spans` out of `docs(doc_id, text)`,
    * each extent SNAPPED OUTWARD to UTF-8 character boundaries, and
    * return (doc_id, n_cut, clean_text) for EVERY doc (clean docs pass
    * through with n_cut 0). Snapped offsets are character boundaries, so
    * their exact character positions come from a prefix decode and the
    * surgery is plain segment concatenation — byte-for-byte equal to a
    * binary cut at the snapped extents, never a split character. */
  private[graft] def stripSpans(docs: org.apache.spark.sql.DataFrame,
                                spansIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = spansIn.localCheckpoint(true) // gaps + lastgap + n_cut read it
    // UTF-8 boundary snap over the doc's bytes: o is a 0-based BYTE
    // offset; byte AT o is a continuation byte iff 0x80 <= b < 0xC0
    // (binary comparison is unsigned; an out-of-range slice is empty
    // and compares below 0x80)
    def contAt(bin: Column, o: Column): Column =
      o >= 1L &&
        bin.substr((o + 1L).cast("int"), lit(1)) >= lit(Array(0x80.toByte)) &&
        bin.substr((o + 1L).cast("int"), lit(1)) < lit(Array(0xC0.toByte))
    def snapDown(bin: Column, o: Column): Column =
      o - when(!contAt(bin, o), 0L).when(!contAt(bin, o - 1L), 1L)
        .when(!contAt(bin, o - 2L), 2L).otherwise(3L)
    def snapUp(bin: Column, o: Column): Column =
      o + when(!contAt(bin, o), 0L).when(!contAt(bin, o + 1L), 1L)
        .when(!contAt(bin, o + 2L), 2L).otherwise(3L)
    // a snapped offset is a character boundary, so its character
    // position is the decoded length of the byte prefix
    def charOff(bin: Column, o: Column): Column =
      length(decode(bin.substr(lit(1), o.cast("int")), "UTF-8")).cast("long")
    val cspans = spans
      .join(docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("bin")), "doc_id")
      .select(col("doc_id"),
        charOff(col("bin"), snapDown(col("bin"), col("s"))).as("cs"),
        charOff(col("bin"), snapUp(col("bin"), col("e"))).as("ce"))
    val wDoc = Window.partitionBy("doc_id").orderBy("cs")
    val gaps = cspans
      .withColumn("gs", coalesce(lag(col("ce"), 1).over(wDoc), lit(0L)))
      .select(col("doc_id"), col("gs"), col("cs").as("ge"))
      .unionByName(cspans.groupBy("doc_id").agg(max(col("ce")).as("gs"))
        .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("ge")), "doc_id")
        .select("doc_id", "gs", "ge"))
    // greatest(0, …): outward snapping can push an island's snapped end
    // to — or past — the next island's snapped start (both extents
    // inside one character); the gap between them clamps to empty,
    // i.e. the islands merge, and the complement is still exactly the
    // union of the snapped spans
    val cleaned = gaps.join(docs.select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), col("gs"),
        expr("substring(text, cast(gs + 1 as int), cast(greatest(0L, ge - gs) as int))").as("seg"))
      .groupBy("doc_id")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("gs"), col("seg")))),
        x => x.getField("seg")), "").as("clean_text"))
    val ncut = spans.groupBy("doc_id").agg(count(lit(1)).as("n_cut"))
    docs.select(col("doc_id"), col("text"))
      .join(cleaned, Seq("doc_id"), "left")
      .join(ncut, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cut"), lit(0L)).as("n_cut"),
        coalesce(col("clean_text"), col("text")).as("clean_text"))
  }

  val all: Seq[Q] = Seq(qLangId, qQualityScore, qTokenCount, qFingerprint, qDedupSubstr,
    qSpanDecontam, qDecontamStrip, qFingerprintWinnow, qDictTag, qMentionScore)
}
