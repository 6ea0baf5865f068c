package graft.ops

import graft.Q
import graft.functions.Exact._
import graft.functions.VectorFunctions
import graft.sources.{Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-6 (session 2) LLM-data-pipeline operators:
  *
  *  - [[qStripBoilerplate]] — the C4/RefinedWeb *cleaning* pass: remove
  *    cross-document repeated chunks and reassemble the cleaned text
  *    (complements q_boilerplate, which only scores the share).
  *  - [[qSemDedup]] — SemDeDup-style semantic dedup: k-means-cluster the
  *    embedding space, drop near-duplicates within each cluster
  *    (Abbas et al. 2023 "SemDeDup", public method).
  *  - [[qBpeMerges]] — distributed BPE merge-pair training iterations
  *    (the tokenizer-prep counterpart of q_vocab_coverage).
  *
  * Tokenization matches TextAnalysis/Retrieval (single-space split);
  * chunking matches CorpusQuality.qBoilerplate (8-token fixed chunks) so
  * the two boilerplate operators agree on what a "chunk" is.
  */
object PipelineOps2 {

  /** C4-style boilerplate *removal*: chunks appearing in >= 2 distinct
    * documents are dropped, the remainder is reassembled in original
    * order. Docs that were pure boilerplate keep an empty clean_text.
    *
    * At scale this is the same shuffle budget as q_boilerplate (one
    * chunk aggregation keyed on the chunk text — at 100 TB key on
    * xxhash64(chunk) instead, same plan shape) plus one doc-keyed
    * reassembly aggregation. No windows, no collect; chunk ids ride
    * along in the aggregation structs so order survives without a sort
    * of the corpus. */
  val qStripBoilerplate: Q = Q(
    "q_strip_boilerplate",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |pos AS (SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS ord FROM toks),
      |ch AS (SELECT doc_id, (ord - 1) // 8 AS chunk_id,
      |         string_agg(t, ' ' ORDER BY ord) AS chunk
      |       FROM pos GROUP BY 1, 2),
      |rep AS (SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs FROM ch GROUP BY 1),
      |fl AS (SELECT doc_id, chunk_id, chunk, ndocs FROM ch JOIN rep USING (chunk))
      |SELECT doc_id,
      |  COALESCE(string_agg(CASE WHEN ndocs < 2 THEN chunk END, ' ' ORDER BY chunk_id), '') AS clean_text,
      |  CAST(SUM(CASE WHEN ndocs < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
      |FROM fl GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pos = T.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "t")))
    // posexplode is 0-based, generate_subscripts 1-based: p div 8 == (ord-1)//8
    val ch = pos
      .groupBy(col("doc_id"), expr("p div 8").as("chunk_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("p"), col("t")))),
        x => x.getField("t")), " ").as("chunk"))
    val rep = ch.groupBy("chunk").agg(countDistinct(col("doc_id")).as("ndocs"))
    // collect_list skips nulls, so the when() keeps only non-boiler chunks
    ch.join(rep, "chunk")
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          sort_array(collect_list(
            when(col("ndocs") < 2, struct(col("chunk_id"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("clean_text"),
        sum(when(col("ndocs") < 2, 1).otherwise(0)).cast("long").as("n_kept"),
        sum(when(col("ndocs") >= 2, 1).otherwise(0)).cast("long").as("n_removed"))
      .select("doc_id", "clean_text", "n_kept", "n_removed")
      .orderBy("doc_id")
  }

  /** SemDeDup (Abbas et al. 2023): semantic dedup that avoids the O(n²)
    * all-pairs cosine by clustering first — pairwise comparison happens
    * only WITHIN a k-means cell. Decision rule (deterministic): drop x
    * iff some lower-id y in the same cell has cos(x,y) >= tau; keep
    * otherwise. Output is the full decision table (vec_id, cell, keep).
    *
    * At scale: the codebook is model-sized (fit on a hash-sample,
    * broadcast — see [[Similarity.fitKmeansCodebook]]); assignment is a
    * map-side projection; the within-cell self-join shuffles once on the
    * cell id and its cost is Σ|cell|² — bounded by cluster granularity
    * (grow k with the corpus), which is exactly the SemDeDup design
    * point. Pure near-dup pairs at even larger scale: the LSH path
    * (q_dedup_minhash_pick) remains the no-pairs alternative.
    *
    * Fully oracled (r10 — previously rows-only "cell ids come from the
    * fitted codebook"): [[OracleKit.kmeansCtes]] replays the codebook fit
    * bit-identically, so every cell id and keep/drop decision hash-matches
    * the DuckDB replay of the same within-cell pair rule. */
  private def semDedupOracleSql(k: Int = 8, iters: Int = 4, tau: Double = 0.38): String = {
    val vecs = "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
    val (ctes, cb) = OracleKit.kmeansCtes(vecs, k, iters)
    val cos = OracleKit.cosSql("s.v", "c.cent")
    (ctes ++ Seq(
      s"asg AS MATERIALIZED (SELECT id, v, cell FROM (SELECT s.id, s.v, c.cid AS cell," +
        s" ROW_NUMBER() OVER (PARTITION BY s.id ORDER BY $cos DESC, c.cid) AS rn" +
        s" FROM km_vecs s CROSS JOIN $cb c) WHERE rn = 1)",
      s"pr AS MATERIALIZED (SELECT DISTINCT a.id FROM asg a JOIN asg b ON a.cell = b.cell AND b.id < a.id" +
        s" WHERE round(${OracleKit.cosSql("a.v", "b.v")}, 6) >= $tau)"))
      .mkString("WITH ", ", ", " ") +
      "SELECT a.id AS vec_id, a.cell, CASE WHEN pr.id IS NULL THEN 1 ELSE 0 END AS keep " +
      "FROM asg a LEFT JOIN pr ON pr.id = a.id ORDER BY a.id"
  }

  val qSemDedup: Q = Q("q_semdedup", semDedupOracleSql()) { (s, d) =>
    val tau = 0.38
    val corpus = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val codebook = Similarity.fitKmeansCodebook(
      corpus.select(col("vec_id").as("id"), col("v")), k = 8)
    val assigned = corpus
      .select(col("vec_id"), col("v"),
        Similarity.nearestCell(col("v"), codebook).as("cell"),
        sqrt(VectorFunctions.dotProduct(col("v"), col("v"))).as("nrm"))
      .localCheckpoint(true)
    val a = assigned.select(col("vec_id"), col("cell"), col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("vec_id").as("id_b"), col("cell"),
      col("v").as("vb"), col("nrm").as("nb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_b") < col("vec_id") &&
        round(VectorFunctions.dotProduct(col("va"), col("vb")) / (col("na") * col("nb")), 6)
          >= tau)
      .select("vec_id").distinct()
      .withColumn("drop", lit(1))
    assigned.select("vec_id", "cell")
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("drop").isNotNull, 0).otherwise(1).as("keep"))
      .orderBy("vec_id")
  }

  /** D4 (Tirumala et al. 2023, "D4: Improving LLM Pretraining via Document
    * De-Duplication and Diversification"): after SemDeDup's within-cell
    * near-dup drop, ALSO drop the most PROTOTYPICAL survivors — the top
    * fraction closest (by cosine) to their cluster centroid — keeping the
    * cluster's diverse tail. The published recipe's two stages over one
    * shared clustering; output is the full decision table
    * (vec_id, cell, ccos, status ∈ kept|dup|proto).
    *
    * At scale this costs exactly SemDeDup plus one cell-partitioned
    * window over the survivors (cells are granularity-bounded; the window
    * key is the cell id, so no global sort) — assignment stays a map-side
    * projection against the broadcast codebook. Deterministic: the proto
    * quota ranks on (ccos DESC, vec_id), ties to the lower id.
    *
    * Fully oracled from birth (the r10 replay kit): the codebook CTEs are
    * [[OracleKit.kmeansCtes]]; both drop rules are plain SQL on top. */
  private def d4OracleSql(k: Int = 8, iters: Int = 4, tau: Double = 0.38, p: Double = 0.25): String = {
    val vecs = "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
    val (ctes, cb) = OracleKit.kmeansCtes(vecs, k, iters)
    val cos = OracleKit.cosSql("s.v", "c.cent")
    (ctes ++ Seq(
      s"asg AS MATERIALIZED (SELECT id, v, cell, round(${OracleKit.cosSql("v", "cent")}, 6) AS ccos FROM" +
        s" (SELECT id, v, cell, cent FROM (SELECT s.id, s.v, c.cid AS cell, c.cent," +
        s" ROW_NUMBER() OVER (PARTITION BY s.id ORDER BY $cos DESC, c.cid) AS rn" +
        s" FROM km_vecs s CROSS JOIN $cb c) WHERE rn = 1))",
      s"dup AS MATERIALIZED (SELECT DISTINCT a.id FROM asg a JOIN asg b ON a.cell = b.cell AND b.id < a.id" +
        s" WHERE round(${OracleKit.cosSql("a.v", "b.v")}, 6) >= $tau)",
      "surv AS MATERIALIZED (SELECT a.id, a.cell, a.ccos FROM asg a LEFT JOIN dup ON dup.id = a.id" +
        " WHERE dup.id IS NULL)",
      "quota AS (SELECT cell, CAST(floor(" + p + " * COUNT(*)) AS BIGINT) AS q FROM surv GROUP BY cell)",
      "prot AS (SELECT id FROM (SELECT s.id, s.cell," +
        " ROW_NUMBER() OVER (PARTITION BY s.cell ORDER BY s.ccos DESC, s.id) AS pr FROM surv s) z" +
        " JOIN quota ON quota.cell = z.cell WHERE z.pr <= quota.q)"))
      .mkString("WITH ", ", ", " ") +
      "SELECT a.id AS vec_id, a.cell, a.ccos," +
      " CASE WHEN dup.id IS NOT NULL THEN 'dup' WHEN prot.id IS NOT NULL THEN 'proto' ELSE 'kept' END AS status" +
      " FROM asg a LEFT JOIN dup ON dup.id = a.id LEFT JOIN prot ON prot.id = a.id ORDER BY a.id"
  }

  val qD4Diversify: Q = Q("q_d4_diversify", d4OracleSql()) { (s, d) =>
    val tau = 0.38; val p = 0.25; val k = 8
    val corpus = T.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val codebook = Similarity.fitKmeansCodebook(
      corpus.select(col("vec_id").as("id"), col("v")), k)
    val centArr = typedlit(codebook.map(_.toSeq).toSeq)
    val assigned = corpus
      .select(col("vec_id"), col("v"),
        Similarity.nearestCell(col("v"), codebook).as("cell"),
        sqrt(VectorFunctions.dotProduct(col("v"), col("v"))).as("nrm"))
      .withColumn("ccos",
        round(VectorFunctions.cosineSim(col("v"),
          element_at(centArr, (col("cell") + 1).cast("int"))), 6))
      .localCheckpoint(true)
    val a = assigned.select(col("vec_id"), col("cell"), col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("vec_id").as("id_b"), col("cell"),
      col("v").as("vb"), col("nrm").as("nb"))
    val dup = a.join(b, Seq("cell"))
      .filter(col("id_b") < col("vec_id") &&
        round(VectorFunctions.dotProduct(col("va"), col("vb")) / (col("na") * col("nb")), 6)
          >= tau)
      .select("vec_id").distinct()
      .withColumn("isDup", lit(1))
    val surv = assigned.select("vec_id", "cell", "ccos")
      .join(dup, Seq("vec_id"), "left").filter(col("isDup").isNull)
    val quota = surv.groupBy("cell")
      .agg(floor(lit(p) * count(lit(1))).cast("long").as("q"))
    val wProto = Window.partitionBy("cell").orderBy(col("ccos").desc, col("vec_id"))
    val proto = surv.withColumn("pr", row_number().over(wProto))
      .join(broadcast(quota), "cell")
      .filter(col("pr") <= col("q"))
      .select("vec_id").withColumn("isProto", lit(1))
    assigned.select("vec_id", "cell", "ccos")
      .join(dup, Seq("vec_id"), "left")
      .join(proto, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("ccos"),
        when(col("isDup").isNotNull, "dup")
          .when(col("isProto").isNotNull, "proto")
          .otherwise("kept").as("status"))
      .orderBy("vec_id")
  }

  /** Greedy left-to-right application of one BPE merge (l, r) -> l+r to a
    * symbol array, as a single fold (no UDF): the accumulator carries the
    * emitted prefix and one pending symbol; a pending `l` followed by `r`
    * becomes the merged symbol (which, as the new pending value, can no
    * longer match `l` — the standard non-overlapping greedy pass). */
  private[graft] def applyMerge(syms: Column, l: String, r: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    val flush = (acc: Column) =>
      when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend"))))
    aggregate(
      syms,
      init,
      (acc, sym) =>
        when(acc.getField("pend") === lit(l) && sym === lit(r),
          struct(acc.getField("out").as("out"), lit(l + r).as("pend")))
          .otherwise(struct(flush(acc).as("out"), sym.as("pend"))),
      acc => flush(acc))
  }

  /** One merge round's SQL. `bestSql(k)` defines the round's argmax CTE
    * (must yield `best\$k(l, r, c)`): BPE ranks on raw pair count;
    * WordPiece divides by the symbol unigram counts (likelihood gain). */
  private def bpeStepSql(k: Int, bestSql: Int => String = bpeBestSql): String = {
    val prev = s"w${k - 1}"
    s"""pairs$k AS (
       |  SELECT l, r, SUM(cnt) AS c FROM (
       |    SELECT cnt, syms[i] AS l, syms[i+1] AS r
       |    FROM $prev, unnest(range(1, len(syms))) t(i)
       |    WHERE len(syms) >= 2)
       |  GROUP BY 1, 2),
       |${bestSql(k)}
       |fold$k(w, cnt, pos, outs, pend) AS (
       |  SELECT w, cnt, 1, CAST([] AS VARCHAR[]), CAST(NULL AS VARCHAR) FROM $prev
       |  UNION ALL
       |  SELECT f.w, f.cnt, f.pos + 1,
       |    CASE WHEN f.pend = b.l AND s.sym = b.r THEN f.outs
       |         WHEN f.pend IS NULL THEN f.outs
       |         ELSE list_append(f.outs, f.pend) END,
       |    CASE WHEN f.pend = b.l AND s.sym = b.r THEN b.l || b.r ELSE s.sym END
       |  FROM fold$k f, best$k b,
       |    (SELECT w AS sw, syms[f2.i] AS sym, f2.i AS si
       |     FROM $prev, unnest(range(1, len(syms) + 1)) f2(i)) s(sw, sym, si)
       |  WHERE s.sw = f.w AND s.si = f.pos),
       |w$k AS MATERIALIZED (
       |  SELECT f.w, f.cnt,
       |    CASE WHEN f.pend IS NULL THEN f.outs ELSE list_append(f.outs, f.pend) END AS syms
       |  FROM fold$k f
       |  JOIN (SELECT w, MAX(pos) AS mp FROM fold$k GROUP BY w) m ON m.w = f.w AND m.mp = f.pos),
       |""".stripMargin
  }

  private def bpeOracleSql(steps: Int = 3): String = {
    val res = (1 to steps).map(k =>
      if (k == 1) s"""  SELECT 1 AS step, l AS "left", r AS "right", l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM best1"""
      else s"""  SELECT $k, l, r, l || r, CAST(c AS BIGINT) FROM best$k""")
      .mkString("\n  UNION ALL\n")
    bpeRoundsSql(steps) +
      s"""res AS (
         |$res)
         |SELECT CAST(step AS INT) AS step, "left", "right", merged, pair_count
         |FROM res ORDER BY step""".stripMargin
  }

  private def bpeBestSql(k: Int): String =
    s"best$k AS MATERIALIZED (SELECT l, r, c FROM pairs$k ORDER BY c DESC, l, r LIMIT 1),"

  /** WordPiece's likelihood-gain argmax: score = c(pair)/(c(l)·c(r)) over
    * the CURRENT round's symbol unigram counts (Schuster & Nakajima 2012;
    * the BERT tokenizer's training rule). Same tie order (score desc, l,
    * r); the ratio is one multiply + one divide in doubles — identical
    * IEEE shape both engines. */
  private def wpBestSql(k: Int): String = {
    val prev = s"w${k - 1}"
    s"""sc$k AS (SELECT sym, SUM(cnt) AS cs FROM (
       |    SELECT cnt, unnest(syms) AS sym FROM $prev) GROUP BY 1),
       |best$k AS MATERIALIZED (
       |  SELECT l, r, c,
       |    CAST(c AS DOUBLE) / (CAST(sl.cs AS DOUBLE) * CAST(sr.cs AS DOUBLE)) AS sc
       |  FROM pairs$k
       |  JOIN sc$k sl ON sl.sym = l JOIN sc$k sr ON sr.sym = r
       |  ORDER BY sc DESC, l, r
       |  LIMIT 1),""".stripMargin
  }

  /** Character-level word→symbols init (the BPE/WordPiece default). */
  private val charW0Sql: String =
    s"""  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    list_transform(range(1, length(w) + 1), i -> w[i]) AS syms
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY w""".stripMargin

  /** BYTE-level word→symbols init (q_bpe_bytes): each word's UTF-8
    * bytes as two-hex-char symbols — `hex(encode(w))` chunked by 2.
    * Uppercase hex on both engines; `strlen` is the BYTE count. */
  private val byteW0Sql: String =
    s"""  SELECT w, cnt, list_transform(range(1, strlen(w) + 1),
       |      i -> substr(hex(encode(w)), (2 * i - 1)::INT, 2)) AS syms
       |  FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
       |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |        WHERE length(w) > 0 GROUP BY w)""".stripMargin

  /** The shared merge-round machinery (w0 symbols + `steps` rounds of
    * pair-count/argmax/fold), common prefix of the BPE, byte-BPE and
    * WordPiece oracles. */
  private def bpeRoundsSql(steps: Int, bestSql: Int => String = bpeBestSql,
                           w0Sql: String = charW0Sql): String =
    s"""WITH RECURSIVE w0 AS MATERIALIZED (
       |$w0Sql),
       |""".stripMargin + (1 to steps).map(k => bpeStepSql(k, bestSql)).mkString

  /** The q_bpe_tokenize oracle: the [[bpeRoundsSql]] rounds, then the
    * merged-symbol table re-exploded into a corpus token frequency
    * top-20 — identical tie order (n desc, token). */
  private def bpeTokenizeOracleSql(steps: Int = 3): String =
    bpeRoundsSql(steps) +
      s"""tok AS (SELECT t.tok AS token, SUM(cnt) AS n
         |        FROM w$steps, unnest(syms) t(tok) GROUP BY 1)
         |SELECT token, CAST(n AS BIGINT) AS n FROM tok
         |ORDER BY n DESC, token LIMIT 20""".stripMargin

  /** Distributed BPE merge training, 3 iterations: corpus -> (word, count)
    * -> char symbols; each round counts adjacent symbol pairs (weighted by
    * word frequency), picks the argmax pair (ties: higher count, then
    * lexicographic), and applies the merge corpus-wide. Output: the merge
    * table (step, left, right, merged, pair_count) — the artifact a BPE
    * tokenizer trainer produces.
    *
    * At scale: the word-frequency table (vocab-sized, not corpus-sized)
    * is what iterates; pair counting is one explode + hash aggregation
    * per round; the argmax is a limit(1) on an aggregated table (driver
    * reads ONE row — model-sized, like the k-means codebook); the merge
    * application is a pure map-side fold ([[applyMerge]]). Plans stay
    * bounded via localCheckpoint per round (the iterative-operator
    * discipline from PLANS.md).
    *
    * Fully oracled (r10): the 3 rounds unroll in DuckDB after all —
    * [[bpeOracleSql]] replays each round as a pair-frequency aggregation
    * + argmax (same (count desc, l, r) tie order) + a PER-WORD recursive
    * fold reproducing [[applyMerge]]'s greedy-disjoint semantics exactly
    * (a string replace CANNOT: on an odd run like `aaa` the separator a
    * match consumes is the next match's opener, so replace yields
    * `[aa,a,a]` where the fold gives `[aa,aa]` on `aaaa`). The fold
    * recursion is vocab-sized × max-word-length — sub-second. The spec
    * additionally replays reference BPE on the collected word counts. */
  val qBpeMerges: Q = Q("q_bpe_merges", bpeOracleSql()) { (s, d) =>
    import s.implicits._
    val steps = 3
    val words = T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", split(col("w"), ""))
      .localCheckpoint(true)
    var cur = words
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (step <- 1 to steps) {
      val n = size(col("syms"))
      val pairs = cur
        .filter(n >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), n - 1),
          slice(col("syms"), lit(2), n - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
      val best = pairs.orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (best.nonEmpty) {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, l, r, l + r, c))
        cur = cur.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
      }
    }
    merges.result().toDF("step", "left", "right", "merged", "pair_count")
      .orderBy("step")
  }

  private def wordpieceOracleSql(steps: Int = 3): String = {
    val res = (1 to steps).map(k =>
      if (k == 1)
        s"""  SELECT 1 AS step, l AS "left", r AS "right", l || r AS merged, CAST(c AS BIGINT) AS pair_count, round(sc, 6) AS score FROM best1"""
      else s"""  SELECT $k, l, r, l || r, CAST(c AS BIGINT), round(sc, 6) FROM best$k""")
      .mkString("\n  UNION ALL\n")
    bpeRoundsSql(steps, wpBestSql) +
      s"""res AS (
         |$res)
         |SELECT CAST(step AS INT) AS step, "left", "right", merged, pair_count, score
         |FROM res ORDER BY step""".stripMargin
  }

  /** WordPiece merge training (Schuster & Nakajima 2012 — the BERT
    * tokenizer's rule): identical round structure to [[qBpeMerges]], but
    * each round merges the pair maximizing the LIKELIHOOD GAIN
    * c(pair)/(c(l)·c(r)) over the current symbol unigram counts — the
    * difference that makes WordPiece prefer rare-but-cohesive pairs
    * where BPE takes raw frequency. Output adds the winning score.
    *
    * Same scale shape as BPE (vocab-sized iteration, one pair aggregation
    * + one unigram aggregation per round, argmax = limit(1), map-side
    * fold merge); same oracle machinery with the argmax CTE swapped
    * ([[wpBestSql]] — the score ratio is one multiply + one divide in
    * doubles, identical IEEE shape both engines). */
  val qWordpieceMerges: Q = Q("q_wordpiece_merges", wordpieceOracleSql()) { (s, d) =>
    val steps = 3
    val words = T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", split(col("w"), ""))
      .localCheckpoint(true)
    var cur = words
    val merges = Seq.newBuilder[(Int, String, String, String, Long, Double)]
    for (step <- 1 to steps) {
      val n = size(col("syms"))
      val pairs = cur
        .filter(n >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), n - 1),
          slice(col("syms"), lit(2), n - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
      val scs = cur.select(col("cnt"), explode(col("syms")).as("sym"))
        .groupBy("sym").agg(sum(col("cnt")).as("cs"))
      val best = pairs
        .join(scs.select(col("sym").as("l"), col("cs").as("cl")), "l")
        .join(scs.select(col("sym").as("r"), col("cs").as("cr")), "r")
        .withColumn("sc", dbl(col("c")) / (dbl(col("cl")) * dbl(col("cr"))))
        .orderBy(col("sc").desc, col("l"), col("r")).limit(1).collect()
      if (best.nonEmpty) {
        val row = best(0)
        val (l, r) = (row.getString(row.fieldIndex("l")), row.getString(row.fieldIndex("r")))
        merges += ((step, l, r, l + r, row.getLong(row.fieldIndex("c")),
          row.getDouble(row.fieldIndex("sc"))))
        cur = cur.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
      }
    }
    import s.implicits._
    merges.result().toDF("step", "left", "right", "merged", "pair_count", "sc")
      .select(col("step"), col("left"), col("right"), col("merged"), col("pair_count"),
        round(col("sc"), 6).as("score"))
      .orderBy("step")
  }

  /** Each word's UTF-8 BYTES as two-hex-char symbols — the byte-level
    * alphabet (`hex(encode(w))` chunked by 2; uppercase hex on both
    * engines, so merge tie-breaks compare identically). */
  private def byteSymsCol: Column = {
    val hx = hex(encode(col("w"), "UTF-8"))
    transform(sequence(lit(1), octet_length(col("w"))), i => hx.substr(i * 2 - 1, lit(2)))
  }

  /** The word-frequency table with byte symbols — byte-BPE's w0. */
  private def byteWords(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", byteSymsCol)
      .localCheckpoint(true)

  /** The shared greedy merge-training loop over a (w, cnt, syms) table:
    * each round counts adjacent symbol pairs weighted by word frequency,
    * takes the (count desc, l, r) argmax (one driver row, model-sized),
    * and applies the merge corpus-wide as [[applyMerge]]'s map-side
    * fold; localCheckpoint per round bounds lineage. Returns the merge
    * table and the final symbol table. */
  private def mergeRounds(words: DataFrame, steps: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    var cur = words
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (step <- 1 to steps) {
      val n = size(col("syms"))
      val pairs = cur
        .filter(n >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), n - 1),
          slice(col("syms"), lit(2), n - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
      val best = pairs.orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (best.nonEmpty) {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, l, r, l + r, c))
        cur = cur.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
      }
    }
    (merges.result(), cur)
  }

  private def byteBpeOracleSql(steps: Int = 3): String = {
    val res = (1 to steps).map(k =>
      if (k == 1) s"""  SELECT 1 AS step, l AS "left", r AS "right", l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM best1"""
      else s"""  SELECT $k, l, r, l || r, CAST(c AS BIGINT) FROM best$k""")
      .mkString("\n  UNION ALL\n")
    bpeRoundsSql(steps, bpeBestSql, byteW0Sql) +
      s"""res AS (
         |$res)
         |SELECT CAST(step AS INT) AS step, "left", "right", merged, pair_count
         |FROM res ORDER BY step""".stripMargin
  }

  private def byteBpeTokenizeOracleSql(steps: Int = 3): String =
    bpeRoundsSql(steps, bpeBestSql, byteW0Sql) +
      s"""tok AS (SELECT t.tok AS token, SUM(cnt) AS n
         |        FROM w$steps, unnest(syms) t(tok) GROUP BY 1)
         |SELECT token, CAST(n AS BIGINT) AS n FROM tok
         |ORDER BY n DESC, token LIMIT 20""".stripMargin

  /** BYTE-LEVEL BPE with byte fallback (the GPT-2/tiktoken lineage —
    * Radford et al. 2019 §2.2; VERDICT r11 #3): identical greedy rounds
    * to [[qBpeMerges]], but the base alphabet is each word's UTF-8
    * BYTES, not its characters — so CJK / no-whitespace / emoji text
    * decomposes into ≤256 base symbols instead of an unbounded character
    * set, EVERY string is representable (byte fallback: a never-merged
    * byte is itself a token — no OOV), and multi-byte characters can
    * merge across their own byte boundaries exactly as GPT-2's
    * tokenizer does. Symbols are printable two-hex-char strings
    * (GPT-2's byte↔unicode bijection re-expressed for a columnar
    * engine): `merged = l || r` IS byte-sequence concatenation, and the
    * merge table stays ASCII-safe in any store.
    *
    * At scale: same posture as [[qBpeMerges]] — the vocab-sized word
    * table iterates, never the corpus; pair counting is one explode +
    * hash aggregation per round over O(total distinct-word bytes) rows;
    * the argmax is one driver row. On a no-whitespace corpus the
    * "words" are sentence-sized, which grows the explode linearly (the
    * byte count), not quadratically; a production trainer would add
    * GPT-2's regex pre-tokenization to cap word length — the engine
    * side is [[graft.ops.TextAnalysis]]'s matches machinery, composable
    * here unchanged.
    *
    * Oracle: the same round unrolling as [[bpeOracleSql]] with the w0
    * alphabet swapped to `hex(encode(w))` 2-char chunks
    * ([[byteW0Sql]]) — uppercase hex both engines, byte-exact on any
    * script ([[Utf8OracleSpec]]'s corpus would join this gate too). */
  val qBpeBytes: Q = Q("q_bpe_bytes", byteBpeOracleSql()) { (s, d) =>
    import s.implicits._
    val (merges, _) = mergeRounds(byteWords(T.documents(s, d)), 3)
    merges.toDF("step", "left", "right", "merged", "pair_count").orderBy("step")
  }

  /** The APPLY half of [[qBpeBytes]]: train the byte merges, tokenize
    * the corpus, ship the top-20 token frequencies (hex-byte tokens).
    * Together with [[qBpeBytes]] this closes train→apply for the
    * byte-level tokenizer the way [[qBpeTokenize]] does for the
    * char-level one. */
  val qBpeBytesTokenize: Q = Q("q_bpe_bytes_tokenize", byteBpeTokenizeOracleSql()) { (s, d) =>
    val (_, toks) = mergeRounds(byteWords(T.documents(s, d)), 3)
    toks.select(explode(col("syms")).as("token"), col("cnt"))
      .groupBy("token").agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)
  }

  /** GPT-2's pre-tokenizer pattern, LOOKAHEAD-FREE so Spark's Java regex
    * and DuckDB's RE2 split identically (both are leftmost-first on
    * alternation; GPT-2's original carries a `\s+(?!\S)` lookahead RE2
    * cannot express — dropping it only moves where a multi-space run
    * splits, never what bytes survive): contractions, space-prefixed
    * letter/digit/punctuation runs (the leading space rides WITH the
    * word — GPT-2's word-initial marker, which whitespace splitting
    * destroys), trailing whitespace runs.
    * Whitespace is the EXPLICIT class `[ \t\n\x0B\f\r]`, not `\s`:
    * Java's `\s` includes U+000B (vertical tab) while RE2's does not,
    * so a VT-bearing document would pre-tokenize differently on the two
    * engines and fail the gate as a bare diff (ADVICE r12). The
    * explicit class pins Java's interpretation in both dialects
    * (Utf8OracleSpec plants a VT doc). */
  private[graft] val preTokPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\x0B\\f\\r]+"

  private def preTokW0Sql: String = {
    val pat = preTokPattern.replace("'", "''")
    s"""  SELECT w, cnt, list_transform(range(1, strlen(w) + 1),
       |      i -> substr(hex(encode(w)), (2 * i - 1)::INT, 2)) AS syms
       |  FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
       |        FROM (SELECT unnest(regexp_extract_all(text, '$pat')) AS w FROM documents)
       |        WHERE strlen(w) > 0 GROUP BY w)""".stripMargin
  }

  private def bpePretokOracleSql(steps: Int = 3): String = {
    val res = (1 to steps).map(k =>
      if (k == 1) s"""  SELECT 1 AS step, l AS "left", r AS "right", l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM best1"""
      else s"""  SELECT $k, l, r, l || r, CAST(c AS BIGINT) FROM best$k""")
      .mkString("\n  UNION ALL\n")
    bpeRoundsSql(steps, bpeBestSql, preTokW0Sql) +
      s"""res AS (
         |$res)
         |SELECT CAST(step AS INT) AS step, "left", "right", merged, pair_count
         |FROM res ORDER BY step""".stripMargin
  }

  /** BYTE-LEVEL BPE over GPT-2 REGEX PRE-TOKENS (Radford et al. 2019
    * §2.2 — the full pipeline: regex pre-tokenize, then BPE over each
    * pre-token's bytes): where [[qBpeBytes]] splits on whitespace, this
    * splits with the contraction/letter-run/digit-run/punctuation-run
    * pattern, so merges respect linguistic boundaries ("don't" →
    * " don" + "'t", digits never merge into words, and the leading
    * space is part of the token — the word-initial marker every GPT-2
    * descendant vocabulary carries). The merge machinery, scale shape
    * and byte-fallback property are [[qBpeBytes]]'s unchanged; only the
    * word universe differs (one regexp_extract_all scan — codegen'd —
    * instead of split). Oracle: the same unrolled rounds with w0's
    * tokenizer swapped; the pattern is lookahead-free so both regex
    * dialects split identically (spec pins the splits cross-engine on
    * planted contraction/multi-space/multilingual text). */
  val qBpePretok: Q = Q("q_bpe_pretok", bpePretokOracleSql()) { (s, d) =>
    import s.implicits._
    val toks = T.documents(s, d).select(
      explode(regexp_extract_all(col("text"), lit(preTokPattern), lit(0))).as("w"))
    val words = toks.filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", byteSymsCol)
      .localCheckpoint(true)
    val (merges, _) = mergeRounds(words, 3)
    merges.toDF("step", "left", "right", "merged", "pair_count").orderBy("step")
  }

  /** One unigram E-step in DuckDB: probability table off v{k-1}, per-word
    * Viterbi (recursive CTE), token counts `cnts$k`. */
  private def unigramEStepSql(k: Int): String = {
    val prev = s"v${k - 1}"
    s"""tot$k AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM $prev),
       |edl$k AS MATERIALIZED (
       |  SELECT s.w, s.cnt, s.i,
       |    list({'j': s.j, 'p': CAST(v.n AS DOUBLE) / CAST(tot$k.t AS DOUBLE), 'tok': s.sub} ORDER BY s.j) AS es
       |  FROM subs s JOIN $prev v ON v.tok = s.sub, tot$k
       |  GROUP BY s.w, s.cnt, s.i),
       |fold$k(w, cnt, pos, acc) AS (
       |  SELECT w, cnt, 0, [{'negs': -1.0::DOUBLE, 'j': 0, 's': 1.0::DOUBLE, 't': []::VARCHAR[]}] FROM words
       |  UNION ALL
       |  SELECT f.w, f.cnt, f.pos + 1,
       |    list_append(f.acc, list_sort(list_transform(e.es, x ->
       |      {'negs': -(f.acc[x.j + 1].s * x.p), 'j': x.j,
       |       's': f.acc[x.j + 1].s * x.p,
       |       't': list_append(f.acc[x.j + 1].t, x.tok)}))[1])
       |  FROM fold$k f JOIN edl$k e ON e.w = f.w AND e.i = f.pos + 1),
       |seg$k AS MATERIALIZED (
       |  SELECT f.w, f.cnt, f.acc[len(f.acc)].t AS ts
       |  FROM fold$k f
       |  JOIN (SELECT w, MAX(pos) AS mp FROM fold$k GROUP BY w) m ON m.w = f.w AND m.mp = f.pos),
       |cnts$k AS (
       |  SELECT t.tok, CAST(SUM(cnt) AS BIGINT) AS n
       |  FROM seg$k, unnest(ts) AS t(tok) GROUP BY 1),
       |""".stripMargin
  }

  /** The matching M-step: floor/prune to `v$k`. */
  private def unigramMStepSql(k: Int, keepK: Int): String =
    s"""v$k AS MATERIALIZED (
       |  SELECT a.tok, CAST(GREATEST(COALESCE(c.n, 0), 1) AS BIGINT) AS n
       |  FROM alpha a LEFT JOIN cnts$k c ON c.tok = a.tok
       |  UNION ALL
       |  SELECT tok, n FROM (
       |    SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rk
       |    FROM cnts$k WHERE length(tok) > 1) WHERE rk <= $keepK),
       |""".stripMargin

  private def unigramRoundSql(k: Int, keepK: Int): String =
    unigramEStepSql(k) + unigramMStepSql(k, keepK)

  /** The q_unigram_lm oracle: the whole hard-EM loop replayed in DuckDB —
    * seed substring counts, then per round a probability table (one exact
    * BIGINT→DOUBLE division per token), the per-word Viterbi DP as a
    * RECURSIVE CTE advancing one word position per level (the
    * [[bpeStepSql]] fold discipline): the carried `acc` is the DP array of
    * best (score, tokens) per prefix, and each level's winner is a
    * `list_sort(...)[ 1 ]` argmax over the ≤`maxSubLen` in-vocab edges
    * ending at that position, keyed (negated score, start j) — ties to the
    * earliest start, exactly the Spark HOF's strict-> replace rule. Every
    * float op is +,*,/ on exact BIGINT→DOUBLE divisions (correctly rounded
    * IEEE — bit-identical across engines). NOT a `list_reduce` fold:
    * DuckDB 1.0's list_reduce fails to thread struct-typed accumulators
    * (each step sees the initial value again), so the per-word recurrence
    * must ride the recursive CTE like the BPE/WordPiece/substr oracles. */
  private def unigramOraclePreSql(seedTopN: Int = 80, maxWordLen: Int = 24,
                                  maxSubLen: Int = 4): String =
    s"""WITH RECURSIVE words AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt, length(w) AS len
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) BETWEEN 1 AND $maxWordLen GROUP BY w),
       |subs AS MATERIALIZED (
       |  SELECT w, cnt, CAST(j + l AS INT) AS i, CAST(j AS INT) AS j,
       |         substr(w, CAST(j + 1 AS INT), CAST(l AS INT)) AS sub
       |  FROM words, unnest(range(0, len)) AS tj(j), unnest(range(1, ${maxSubLen + 1})) AS tl(l)
       |  WHERE j + l <= len),
       |seed AS (SELECT sub AS tok, CAST(SUM(cnt) AS BIGINT) AS n FROM subs GROUP BY 1),
       |v0 AS MATERIALIZED (
       |  SELECT tok, n FROM seed WHERE length(tok) = 1
       |  UNION ALL
       |  SELECT tok, n FROM (
       |    SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rk
       |    FROM seed WHERE length(tok) > 1) WHERE rk <= $seedTopN),
       |alpha AS MATERIALIZED (SELECT tok FROM v0 WHERE length(tok) = 1),
       |""".stripMargin

  private def unigramOracleSql(steps: Int = 2, seedTopN: Int = 80,
                               keepK: Int = 40, maxWordLen: Int = 24,
                               maxSubLen: Int = 4): String =
    unigramOraclePreSql(seedTopN, maxWordLen, maxSubLen) +
      (1 to steps).map(k => unigramRoundSql(k, keepK)).mkString +
      s"""tfin AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM v$steps)
         |SELECT tok AS token, n, round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS p
         |FROM v$steps, tfin
         |ORDER BY n DESC, token LIMIT 30""".stripMargin

  /** Unigram-LM (SentencePiece) tokenizer training — Kudo 2018, the third
    * major tokenizer-training algorithm next to BPE ([[qBpeMerges]]) and
    * WordPiece ([[qWordpieceMerges]]), and the one T5/mT5-era pipelines
    * shipped. Hard-EM (Viterbi) variant:
    *
    *  - SEED: every substring of length 1..`maxSubLen` of every corpus
    *    word, counted over occurrences (weighted by word frequency);
    *    vocabulary = all single characters + the top-`seedTopN`
    *    multi-character substrings (count desc, token asc).
    *  - E-step: per distinct word, the maximum-probability segmentation
    *    under the current unigram model p(t) = n(t)/Σn — a Viterbi DP
    *    over word positions, run as ONE `aggregate` HOF fold per word
    *    over its in-vocab substring edges sorted (end, start): the
    *    accumulator carries best (score, tokens) per prefix position;
    *    ties break to the earliest start (strict >), so the decision is
    *    deterministic. All float math is products of exact BIGINT→DOUBLE
    *    divisions — no transcendentals, so the DP is bit-identical across
    *    engines (the oracle replays it as a DuckDB list_reduce).
    *  - M-step: token counts re-estimated from the best segmentations
    *    (weighted by word frequency); prune to the top-`keepK`
    *    multi-character tokens; every single character keeps a floor
    *    count of 1 (reachability — the lattice always has a path).
    *
    * At scale: the corpus is scanned ONCE (the word-frequency
    * aggregation); everything that iterates is vocab-sized (distinct
    * words × ≤4·len substring edges), the model is model-sized, and the
    * per-round shuffles are token-keyed aggregations with map-side
    * partial combine — the same posture as the BPE/WordPiece rounds.
    * Words longer than `maxWordLen` are excluded from training (their
    * subword statistics are covered by shorter words; keeps the DP fold
    * and the score product bounded).
    *
    * Output: the final vocabulary's top 30 tokens by (count desc, token)
    * with count and model probability (rounded 6). Reference analog: the
    * tokenizer-prep stage of an LLM data pipeline (SURVEY §2.4). */
  def unigramVocab(docs: DataFrame, textCol: String = "text", steps: Int = 2,
                   maxSubLen: Int = 4, seedTopN: Int = 80, keepK: Int = 40,
                   maxWordLen: Int = 24): DataFrame = {
    val (vocab, _) = unigramEm(docs, textCol, steps, maxSubLen, seedTopN,
      keepK, maxWordLen)
    // empty corpus -> empty vocab -> null sum (coalesced): empty result,
    // not an NPE (EmptyInputSweepSpec)
    val total = vocab.agg(coalesce(sum(col("n")), lit(0L))).collect()(0).getLong(0)
    vocab.select(col("tok").as("token"), col("n"),
        round(dbl(col("n")) / lit(total.toDouble), 6).as("p"))
      .orderBy(col("n").desc, col("token")).limit(30)
  }

  /** The shared unigram hard-EM core: `steps` (E,M) rounds. Returns
    * (final vocab with counts, a thunk for one MORE E-step against that
    * vocabulary — the corpus TOKENIZED under the trained model, which is
    * what [[qUnigramTokenize]] serves; a thunk because the training-only
    * caller must not pay its jobs). */
  private def unigramEm(docs: DataFrame, textCol: String, steps: Int,
                        maxSubLen: Int, seedTopN: Int, keepK: Int,
                        maxWordLen: Int): (DataFrame, () => DataFrame) = {
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")).between(1, maxWordLen))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("len", length(col("w")))
    // every (start j, length l) substring window, reused by all rounds
    val subs = words
      .select(col("w"), col("cnt"), col("len"),
        explode(sequence(lit(0), col("len") - 1)).as("j"))
      .select(col("w"), col("cnt"), col("j"),
        explode(sequence(lit(1), least(lit(maxSubLen), col("len") - col("j")))).as("l"))
      .select(col("w"), col("cnt"),
        (col("j") + col("l")).cast("int").as("i"), col("j").cast("int").as("j"),
        expr("substring(w, j + 1, l)").as("sub"))
      .localCheckpoint(true)
    val seed = subs.groupBy(col("sub").as("tok")).agg(sum(col("cnt")).as("n"))
    val singles = seed.filter(length(col("tok")) === 1)
    val wTop = Window.orderBy(col("n").desc, col("tok"))
    var vocab = singles.unionAll(
        seed.filter(length(col("tok")) > 1)
          .withColumn("rk", row_number().over(wTop)).filter(col("rk") <= seedTopN)
          .drop("rk"))
      .localCheckpoint(true)
    val alpha = singles.select("tok").localCheckpoint(true)
    // the Viterbi fold: acc[k] = best (score, tokens) for the k-char
    // prefix; edges arrive (i asc, j asc), and every position has its
    // single-char edge, so position i's first edge APPENDS and later
    // edges REPLACE only on a strictly better score (ties keep the
    // earliest start — deterministic)
    def viterbi(es: Column): Column = aggregate(
      es,
      array(struct(lit(1.0).as("s"), array().cast("array<string>").as("t"))),
      (acc, e) => {
        val prev = element_at(acc, e.getField("j") + 1)
        val candS = prev.getField("s") * e.getField("p")
        val cand = struct(candS.as("s"),
          concat(prev.getField("t"), array(e.getField("tok"))).as("t"))
        when(size(acc) === e.getField("i"), concat(acc, array(cand)))
          .when(candS > element_at(acc, e.getField("i") + 1).getField("s"),
            concat(slice(acc, lit(1), e.getField("i")), array(cand)))
          .otherwise(acc)
      })
    // one E-step: tokenize every word under the current model, count
    def eStep(v: DataFrame): DataFrame = {
      // model-sized total, collected like the BPE argmax (one tiny job);
      // coalesce: an empty corpus has an empty vocab and must flow
      // through as an empty result (the edges join below is then empty,
      // so the 0 total never reaches a division)
      val total = v.agg(coalesce(sum(col("n")), lit(0L))).collect()(0).getLong(0)
      val edges = subs
        .join(broadcast(v.withColumn("p", dbl(col("n")) / lit(total.toDouble))
          .select(col("tok"), col("p"))), col("sub") === col("tok"))
      edges
        .groupBy("w", "cnt")
        .agg(sort_array(collect_list(struct(col("i"), col("j"), col("p"), col("tok")))).as("es"))
        .select(col("cnt"), element_at(viterbi(col("es")), -1).getField("t").as("ts"))
        .select(col("cnt"), explode(col("ts")).as("tok"))
        .groupBy("tok").agg(sum(col("cnt")).as("n"))
    }
    for (_ <- 1 to steps) {
      val cnts = eStep(vocab)
      vocab = alpha
        .join(cnts, Seq("tok"), "left")
        .select(col("tok"), greatest(coalesce(col("n"), lit(0L)), lit(1L)).as("n"))
        .unionAll(cnts.filter(length(col("tok")) > 1)
          .withColumn("rk", row_number().over(wTop)).filter(col("rk") <= keepK)
          .drop("rk"))
        .localCheckpoint(true)
    }
    val fin = vocab
    (vocab, () => eStep(fin))
  }

  /** SURVEY §2.4 q_unigram_lm (VERDICT r10 #4 — the missing third of the
    * tokenizer family). */
  val qUnigramLm: Q = Q("q_unigram_lm", unigramOracleSql()) { (s, d) =>
    unigramVocab(T.documents(s, d))
  }

  private def unigramTokenizeOracleSql(steps: Int = 2, keepK: Int = 40): String =
    unigramOraclePreSql() +
      ((1 to steps).map(k => unigramRoundSql(k, keepK)) :+
        unigramEStepSql(steps + 1)).mkString +
      s"""fin AS (SELECT 1)
         |SELECT tok AS token, n FROM cnts${steps + 1}
         |ORDER BY n DESC, token LIMIT 20""".stripMargin

  /** Tokenizer APPLY for the unigram model — train ([[unigramVocab]]'s
    * EM) then run ONE more Viterbi E-step over the corpus under the
    * final vocabulary and emit the top-20 corpus token frequencies: the
    * train→apply pairing [[qBpeTokenize]] gives BPE, for the unigram
    * tokenizer. The apply pass is the same vocab-broadcast join + one
    * HOF fold per distinct word — corpus-frequency weighted, no
    * corpus-sized shuffle beyond the word-count aggregation the training
    * already pays. Oracle: the training rounds plus one extra E-step CTE,
    * reading the tokenize counts instead of the pruned vocab. */
  val qUnigramTokenize: Q = Q("q_unigram_tokenize", unigramTokenizeOracleSql()) { (s, d) =>
    val (_, tokCnts) = unigramEm(T.documents(s, d), "text", 2, 4, 80, 40, 24)
    tokCnts().select(col("tok").as("token"), col("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
  }

  /** Index-served AND search: documents containing ALL probe terms with
    * the summed term frequency — the serving shape behind
    * [[graft.sources.InvertedIndex]] (which persists the posting lists;
    * this in-plan twin keeps the same aggregate→intersect semantics under
    * the correctness gate). Reference analog: tcrd_app.py search served
    * from MySQL indexes rather than table scans.
    *
    * At scale the served path reads O(terms) index rows (pushed equality
    * filter on the sorted term column) and explodes df-bounded posting
    * lists; the corpus is never scanned — see InvertedIndexSpec for the
    * pushdown + equality proof. */
  val qSearchIndexed: Q = Q(
    "q_search_indexed",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |hit AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks
      |        WHERE t IN ('spark', 'join') GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_hits
      |FROM hit GROUP BY 1 HAVING COUNT(DISTINCT t) = 2 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val terms = Seq("spark", "join")
    val postings = T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    postings.groupBy("doc_id")
      .agg(countDistinct(col("term")).as("nt"), sum(col("tf")).cast("long").as("n_hits"))
      .filter(col("nt") === terms.size)
      .select("doc_id", "n_hits")
      .orderBy("doc_id")
  }

  /** Substring-level exact-duplicate detection: document pairs sharing at
    * least one exact 8-token span (every sliding 8-gram, not just the
    * chunk-aligned grid q_boilerplate uses) with the count of distinct
    * shared spans — the span-granular exact-dedup signal of the
    * dedup-duplicated-substrings line of work (Lee et al. 2022), the
    * missing granularity between q_dedup_exact (whole doc) and
    * q_dedup_ngram (Jaccard similarity).
    *
    * Plan: grams materialize map-side (transform over a bounded
    * sequence) and are xxhash64'd IN THE SAME PROJECTION — the join,
    * the distinct, and both shuffles key on 8-byte int64s exactly as
    * q_dedup_ngram hashes its shingles (Dedup.scala:54); no gram string
    * ever shuffles (4× less shuffle volume, long instead of string
    * comparisons — 7.3s → ~4s at sf0.1). 64-bit fingerprint equality
    * stands in for string equality, the standard exact-substring-dedup
    * trade (collision odds ~m²/2⁶⁵). Stop-word-heavy corpora cap gram
    * document-frequency first (the df column of sink_inverted) to bound
    * the per-gram pair fanout. */
  val qSpanDup: Q = Q(
    "q_span_dup",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |        array_to_string(l[i:i+7], ' ') AS gram
      |      FROM toks, UNNEST(generate_series(1, len(l) - 7)) AS t(i)),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.gram
      |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b, COUNT(*) AS n_shared
      |FROM p GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val toks = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .filter(size(col("l")) >= 8)
    // native codegen gram hasher (expr_ngram_hashes): bit-identical to
    // the interpreted transform+xxhash64 lambda, no gram strings built
    val g = toks
      .select(col("doc_id"),
        explode(graft.functions.NgramHashes(array_join(col("l"), " "), 8)).as("gh"))
      .distinct()
    val a = g.select(col("doc_id").as("id_a"), col("gh"))
    val b = g.select(col("doc_id").as("id_b"), col("gh"))
    a.join(b, "gh")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("id_a", "id_b")
  }

  /** Maximal shared-span extents per near-identical doc pair: the actual
    * output granularity of exact-substring dedup (Lee et al. 2022) — not
    * "how many grams match" ([[qSpanDup]]) but WHERE the copied regions
    * are and how long. Shared 8-gram start positions (in the left doc)
    * merge into maximal extents by the classic interval-merge window:
    * break when pos exceeds the running max end, prefix-sum the breaks
    * into extent ids, aggregate extent bounds. Per pair: extent count,
    * longest extent, total covered tokens — the "40% of doc A is a
    * verbatim lift from doc B" signal that drives span-level REMOVAL
    * (vs whole-doc dedup's drop decision).
    *
    * Scale: the gram join keys on xxhash64 int64s like qSpanDup; the
    * merge windows partition by (id_a, id_b) — bounded by a doc-pair's
    * gram count, never corpus-sized. */
  val qSpanExtents: Q = Q(
    "q_span_extents",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |g AS (SELECT doc_id, i AS pos, array_to_string(l[i:i+7], ' ') AS gram
      |      FROM toks, UNNEST(generate_series(1, len(l) - 7)) AS t(i)
      |      WHERE len(l) >= 8),
      |p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.pos
      |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
      |m AS (SELECT id_a, id_b, pos,
      |        CASE WHEN pos > COALESCE(MAX(pos + 8) OVER (PARTITION BY id_a, id_b
      |          ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |        THEN 1 ELSE 0 END AS brk
      |      FROM p),
      |grp AS (SELECT id_a, id_b, pos,
      |        SUM(brk) OVER (PARTITION BY id_a, id_b ORDER BY pos
      |          ROWS UNBOUNDED PRECEDING) AS gid
      |      FROM m),
      |sp AS (SELECT id_a, id_b, gid, MIN(pos) AS s, MAX(pos) + 8 AS e
      |       FROM grp GROUP BY 1, 2, 3)
      |SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_spans,
      |  CAST(MAX(e - s) AS BIGINT) AS longest_tokens,
      |  CAST(SUM(e - s) AS BIGINT) AS covered_tokens
      |FROM sp GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val toks = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .filter(size(col("l")) >= 8)
    val g = toks.select(col("doc_id"), posexplode(
        graft.functions.NgramHashes(array_join(col("l"), " "), 8)).as(Seq("p0", "gh")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("gh"))
    val p = g.select(col("doc_id").as("id_a"), col("pos"), col("gh"))
      .join(g.select(col("doc_id").as("id_b"), col("gh")), "gh")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "pos").distinct()
    val wPrev = Window.partitionBy("id_a", "id_b").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("id_a", "id_b").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.withColumn("brk",
        when(col("pos") > coalesce(max(col("pos") + 8).over(wPrev), lit(-1)), 1).otherwise(0))
      .withColumn("gid", sum(col("brk")).over(wCum))
      .groupBy("id_a", "id_b", "gid")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + 8).as("e"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_spans"),
        lng(max(col("e") - col("s"))).as("longest_tokens"),
        lng(sum(col("e") - col("s"))).as("covered_tokens"))
      .orderBy("id_a", "id_b")
  }

  /** Tokenizer apply: run the 3 learned BPE merges ([[qBpeMerges]]) over
    * the corpus and emit the resulting token (symbol) frequency table,
    * top-20 by count (ties: token asc) — the train→apply loop of a
    * tokenizer pipeline in one plan. The merge table is model-sized
    * (driver-held, like the k-means codebook); application is the same
    * pure map-side fold per merge; counting is one explode + hash
    * aggregation over the VOCAB-sized word table (corpus token counts
    * weight by word frequency — the corpus itself is touched once).
    * Rows-only: the spec replays reference BPE end-to-end. */
  /** Train `steps` BPE merges and apply them corpus-wide: the distinct
    * word-frequency table with each word's merged symbol sequence —
    * shared by [[qBpeTokenize]] (token frequencies) and
    * [[qTokenizerFertility]] (per-source tokenizer stats). */
  private def bpeTokenizedWords(docs: DataFrame, steps: Int): DataFrame = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", split(col("w"), ""))
      .localCheckpoint(true)
    var cur = words
    for (step <- 1 to steps) {
      val n = size(col("syms"))
      val pairs = cur
        .filter(n >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), n - 1),
          slice(col("syms"), lit(2), n - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
      val best = pairs.orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (best.nonEmpty) {
        cur = cur.withColumn("syms",
            applyMerge(col("syms"), best(0).getString(0), best(0).getString(1)))
          .localCheckpoint(true)
      }
    }
    cur
  }

  val qBpeTokenize: Q = Q("q_bpe_tokenize", bpeTokenizeOracleSql()) { (s, d) =>
    bpeTokenizedWords(T.documents(s, d), 3)
      .select(explode(col("syms")).as("token"), col("cnt"))
      .groupBy("token").agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)
  }

  private def fertilityOracleSql(steps: Int = 3): String =
    bpeRoundsSql(steps) +
      s"""sw AS (SELECT source, w, COUNT(*)::BIGINT AS cnt FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) > 0 GROUP BY 1, 2),
         |fj AS (SELECT s.source, s.cnt, len(m.syms)::BIGINT AS ntok,
         |         length(s.w)::BIGINT AS wl
         |       FROM sw s JOIN w$steps m ON m.w = s.w),
         |fagg AS (SELECT source, SUM(cnt) AS nw, SUM(cnt * ntok) AS nt,
         |          SUM(cnt * wl) AS nc,
         |          SUM(CASE WHEN ntok = 1 THEN cnt ELSE 0 END) AS ns
         |        FROM fj GROUP BY 1)
         |SELECT source, CAST(nw AS BIGINT) AS n_words, CAST(nt AS BIGINT) AS n_tokens,
         |  round(CAST(nt AS DOUBLE) / CAST(nw AS DOUBLE), 6) AS fertility,
         |  round(CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS chars_per_token,
         |  round(CAST(ns AS DOUBLE) / CAST(nw AS DOUBLE), 6) AS single_frac
         |FROM fagg ORDER BY source""".stripMargin

  /** Tokenizer EVALUATION — per-source fertility under the trained BPE
    * vocabulary (Rust et al. 2021, "How Good is Your Tokenizer?"): the
    * standard metric suite a pipeline runs before committing to a
    * tokenizer — fertility (tokens per word: 1.0 = every word one token,
    * higher = more fragmentation), chars per token (compression), and
    * the fraction of word occurrences left as a single token, all
    * occurrence-weighted and split by source so a domain whose text the
    * vocabulary fragments shows up as ITS row, not an average.
    *
    * At scale: training iterates the vocab-sized word table ([[
    * bpeTokenizedWords]]); the evaluation is one corpus scan to
    * (source, word) counts, a word-keyed join against the distinct-word
    * table (NOT hint-broadcast: distinct words of a web corpus grow with
    * the corpus — typos, URLs, numbers — so the join must be allowed to
    * degrade to a shuffle; AQE broadcasts it when it actually fits), and
    * a per-source aggregation. All ratios are single BIGINT→DOUBLE
    * divisions — exact both engines. */
  val qTokenizerFertility: Q = Q("q_tokenizer_fertility", fertilityOracleSql()) { (s, d) =>
    val docs = T.documents(s, d)
    val ntok = bpeTokenizedWords(docs, 3)
      .select(col("w"), size(col("syms")).cast("long").as("ntok"))
    val srcWords = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
    srcWords.join(ntok, "w")
      .withColumn("wl", length(col("w")).cast("long"))
      .groupBy("source")
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("ntok")).as("n_tokens"),
        sum(col("cnt") * col("wl")).as("nc"),
        sum(when(col("ntok") === 1, col("cnt")).otherwise(lit(0L))).as("ns"))
      .select(col("source"), col("n_words"), col("n_tokens"),
        round(dbl(col("n_tokens")) / dbl(col("n_words")), 6).as("fertility"),
        round(dbl(col("nc")) / dbl(col("n_tokens")), 6).as("chars_per_token"),
        round(dbl(col("ns")) / dbl(col("n_words")), 6).as("single_frac"))
      .orderBy("source")
  }

  /** Curriculum quality tiers: per-source quality quartiles (NTILE over
    * the q_quality_score formula, quality-desc with doc-id tie-break)
    * rolled up to a per-(source, tier) sampling plan — docs, token
    * supply, mean quality, a fixed tier→weight curriculum, and the
    * expected token yield. The "train on the best quartiles more"
    * pass between quality scoring (q_quality_score) and mix planning
    * (q_mix_plan).
    *
    * At scale: the NTILE window partitions by source (source-bounded
    * sort, never corpus-global); the rollup is one hash aggregation.
    * Mean quality sums DECIMAL(18,6) — order/partition-invariant. */
  val qQualityTiers: Q = Q(
    "q_quality_tiers",
    """WITH q AS (SELECT doc_id, source,
      |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tokens,
      |    round(0.4 * (CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|of|and|or|to|in)\b')) AS DOUBLE)
      |                 / CAST(len(string_split(trim(text), ' ')) AS DOUBLE))
      |        + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |                 / CAST(length(text) AS DOUBLE))
      |        + 0.3 * least(1.0, CAST(len(string_split(trim(text), ' ')) AS DOUBLE) / 100.0), 6) AS quality
      |  FROM documents),
      |t AS (SELECT source, tokens, quality,
      |        NTILE(4) OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS tier
      |      FROM q),
      |agg AS (SELECT source, tier, COUNT(*) AS n_docs,
      |          CAST(SUM(tokens) AS BIGINT) AS tokens,
      |          round(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_quality
      |        FROM t GROUP BY 1, 2)
      |SELECT source, tier, n_docs, tokens, avg_quality,
      |  CASE tier WHEN 1 THEN 1.0 WHEN 2 THEN 0.7 WHEN 3 THEN 0.4 ELSE 0.1 END AS sample_weight,
      |  CAST(round(tokens * (CASE tier WHEN 1 THEN 1.0 WHEN 2 THEN 0.7 WHEN 3 THEN 0.4 ELSE 0.1 END), 0) AS BIGINT) AS expected_tokens
      |FROM agg ORDER BY source, tier""".stripMargin) { (s, d) =>
    import graft.ops.TextAnalysis.matches
    val q = T.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"),
        lng(size(split(trim(col("text")), " "))).as("tokens"))
      .withColumn("quality", graft.ops.TextAnalysis.qualityScoreExpr(col("text")))
      .drop("text")
    val w = Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    val t = q.withColumn("tier", ntile(4).over(w))
    val weight = when(col("tier") === 1, 1.0).when(col("tier") === 2, 0.7)
      .when(col("tier") === 3, 0.4).otherwise(0.1)
    // the token-yield product must be DECIMAL-exact on both engines:
    // 365 * 0.7 is 255.5 in decimal (rounds 256) but 255.4999... in
    // binary doubles (rounds 255) — the oracle's CASE literal is DECIMAL
    val weightDec = when(col("tier") === 1, lit(BigDecimal("1.0")))
      .when(col("tier") === 2, lit(BigDecimal("0.7")))
      .when(col("tier") === 3, lit(BigDecimal("0.4")))
      .otherwise(lit(BigDecimal("0.1")))
    t.groupBy("source", "tier")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).cast("long").as("tokens"),
        round(dbl(sum(col("quality").cast(DecimalType(18, 6)))) / count(lit(1)), 6)
          .as("avg_quality"))
      .select(col("source"), lng(col("tier")).as("tier"), col("n_docs"), col("tokens"),
        col("avg_quality"), weight.as("sample_weight"),
        round(col("tokens").cast(DecimalType(18, 1)) * weightDec, 0)
          .cast("long").as("expected_tokens"))
      .orderBy("source", "tier")
  }

  /** RAG-style overlapping chunking: fixed 64-token windows at stride 48
    * (25% overlap), stable (doc_id, chunk_id) keys and token offsets —
    * the retrieval-corpus prep step between cleaning and embedding. All
    * map-side (sequence + explode + slice over the token array; no
    * shuffle before the output sort), so it streams at any scale and the
    * chunk count per doc is ceil((n-64)/48)+1, never data-dependent
    * state. Short docs yield exactly one (possibly short) chunk. */
  val qRagChunk: Q = Q(
    "q_rag_chunk",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id, i AS chunk_id, i*48 AS tok_offset,
      |  CAST(len(toks[i*48+1 : i*48+64]) AS BIGINT) AS n_toks,
      |  array_to_string(toks[i*48+1 : i*48+64], ' ') AS chunk
      |FROM t, LATERAL (SELECT unnest(generate_series(0,
      |  CAST(greatest(ceil((len(toks)-64)/48.0), 0) AS BIGINT))) AS i) g
      |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("i", explode(sequence(lit(0L),
        greatest(ceil((size(col("toks")) - lit(64)) / lit(48.0)), lit(0)).cast("long"))))
      .select(col("doc_id"), col("i").as("chunk_id"),
        (col("i") * 48).as("tok_offset"),
        lng(size(slice(col("toks"), (col("i") * 48 + 1).cast("int"), lit(64)))).as("n_toks"),
        array_join(slice(col("toks"), (col("i") * 48 + 1).cast("int"), lit(64)), " ")
          .as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Span-level dedup REMOVAL (the step after [[qSpanExtents]] detects):
    * rebuild each document's text with every 8-gram span that also
    * appears in a LOWER-id document stripped out — the keep-first policy
    * of exact-substring dedup (Lee et al. 2022), emitting the cleaned
    * corpus rather than a report. Overlapping hits merge into maximal
    * extents first, so mid-span tokens are cut exactly once.
    *
    * Scale: a position is covered iff min(doc_id) over docs containing
    * its gram is smaller than its own doc — so the pair join of
    * qSpanExtents collapses to ONE per-gram aggregation (gh → min doc,
    * 8-byte uniform keys) plus one hash join back; no doc-pair fanout at
    * any duplication rate. Interval merging windows per doc (bounded by
    * doc length, never corpus-sized), extents collapse to a per-doc
    * array, and the rebuild is a map-side filter-with-index HOF over the
    * token array — the corpus text itself never shuffles token-by-token. */
  val qSpanStrip: Q = Q(
    "q_span_strip",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |g AS (SELECT doc_id, i AS pos, array_to_string(l[i:i+7], ' ') AS gram
      |      FROM toks, UNNEST(generate_series(1, len(l) - 7)) AS t(i)
      |      WHERE len(l) >= 8),
      |mn AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY 1),
      |hit AS (SELECT g.doc_id AS id, g.pos FROM g JOIN mn USING (gram)
      |        WHERE mn.first_doc < g.doc_id),
      |m AS (SELECT id, pos,
      |        CASE WHEN pos > COALESCE(MAX(pos + 8) OVER (PARTITION BY id
      |          ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |        THEN 1 ELSE 0 END AS brk FROM hit),
      |grp AS (SELECT id, pos, SUM(brk) OVER (PARTITION BY id ORDER BY pos
      |          ROWS UNBOUNDED PRECEDING) AS gid FROM m),
      |sp AS (SELECT id, gid, MIN(pos) AS s, MAX(pos) + 8 AS e FROM grp GROUP BY 1, 2),
      |tok2 AS (SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS tok
      |         FROM toks),
      |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok2 t
      |         WHERE NOT EXISTS (SELECT 1 FROM sp c
      |           WHERE c.id = t.doc_id AND t.pos >= c.s AND t.pos < c.e))
      |SELECT d.doc_id, COALESCE(k.clean_text, '') AS clean_text,
      |  CAST(d.n_tok - COALESCE(k.n_kept, 0) AS BIGINT) AS n_dropped
      |FROM (SELECT doc_id, len(l) AS n_tok FROM toks) d
      |LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
      |             COUNT(*) AS n_kept FROM kept GROUP BY 1) k USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("l"))
    val g = toks.filter(size(col("l")) >= 8)
      .select(col("doc_id"), posexplode(
        graft.functions.NgramHashes(array_join(col("l"), " "), 8)).as(Seq("p0", "gh")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("gh"))
    val firstDoc = g.groupBy("gh").agg(min(col("doc_id")).as("first_doc"))
    val hit = g.join(firstDoc, "gh")
      .filter(col("first_doc") < col("doc_id"))
      .select(col("doc_id").as("id"), col("pos"))
    val wPrev = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ext = hit
      .withColumn("brk",
        when(col("pos") > coalesce(max(col("pos") + 8).over(wPrev), lit(-1)), 1).otherwise(0))
      .withColumn("gid", sum(col("brk")).over(wCum))
      .groupBy("id", "gid")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + 8).as("e"))
      .groupBy("id")
      .agg(collect_list(struct(col("s"), col("e"))).as("ext"))
    toks.join(ext, toks("doc_id") === ext("id"), "left")
      .withColumn("kept", filter(col("l"), (tok, i) =>
        !exists(coalesce(col("ext"), array().cast("array<struct<s:int,e:int>>")),
          e => (i + 1 >= e.getField("s")) && (i + 1 < e.getField("e")))))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("clean_text"),
        lng(size(col("l")) - size(col("kept"))).as("n_dropped"))
      .orderBy("doc_id")
  }

  /** Measure-after-treatment audit for [[qSpanStrip]]: shared-8-gram
    * (doc, position) incidence before vs after the strip, as one
    * (metric, value) card — the evidence that span-level dedup actually
    * removed the cross-doc duplication it targeted. `post` counts only
    * NEWLY-FORMED shared grams (cut edges joining previously-separated
    * tokens, or a later doc becoming the new first owner) — the
    * irreducible residue of one-pass span dedup; production pipelines
    * iterate the pass until this metric is ~0 (each pass is the same
    * plan). Scale: two runs of the strip/gram machinery (per-gram
    * min-doc aggregation, int64 keys) + two count aggregates — no new
    * shuffle shapes. */
  val qStripAudit: Q = Q(
    "q_strip_audit",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |g AS (SELECT doc_id, i AS pos, array_to_string(l[i:i+7], ' ') AS gram
      |      FROM toks, UNNEST(generate_series(1, len(l) - 7)) AS t(i)
      |      WHERE len(l) >= 8),
      |mn AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY 1),
      |hit AS (SELECT g.doc_id AS id, g.pos FROM g JOIN mn USING (gram)
      |        WHERE mn.first_doc < g.doc_id),
      |m AS (SELECT id, pos,
      |        CASE WHEN pos > COALESCE(MAX(pos + 8) OVER (PARTITION BY id
      |          ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |        THEN 1 ELSE 0 END AS brk FROM hit),
      |grp AS (SELECT id, pos, SUM(brk) OVER (PARTITION BY id ORDER BY pos
      |          ROWS UNBOUNDED PRECEDING) AS gid FROM m),
      |sp AS (SELECT id, gid, MIN(pos) AS s, MAX(pos) + 8 AS e FROM grp GROUP BY 1, 2),
      |tok2 AS (SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS tok
      |         FROM toks),
      |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok2 t
      |         WHERE NOT EXISTS (SELECT 1 FROM sp c
      |           WHERE c.id = t.doc_id AND t.pos >= c.s AND t.pos < c.e)),
      |clean AS (SELECT doc_id, list(tok ORDER BY pos) AS l FROM kept GROUP BY 1),
      |g2 AS (SELECT doc_id, array_to_string(l[i:i+7], ' ') AS gram
      |       FROM clean, UNNEST(generate_series(1, len(l) - 7)) AS t(i)
      |       WHERE len(l) >= 8),
      |mn2 AS (SELECT gram, MIN(doc_id) AS first_doc FROM g2 GROUP BY 1)
      |SELECT metric, val FROM (
      |  SELECT 'pre_dup_positions' AS metric,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS val, 0 AS o
      |  UNION ALL SELECT 'post_dup_positions',
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM g2 JOIN mn2 USING (gram)
      |     WHERE mn2.first_doc < g2.doc_id), 1
      |  UNION ALL SELECT 'tokens_removed',
      |    (SELECT CAST(SUM(e - s) AS BIGINT) FROM sp), 2) ORDER BY o""".stripMargin) { (s, d) =>
    val toks = T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("l"))
    def gramHashes(t: DataFrame): DataFrame = t
      .filter(size(col("l")) >= 8)
      .select(col("doc_id"), posexplode(
        graft.functions.NgramHashes(array_join(col("l"), " "), 8)).as(Seq("p0", "gh")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("gh"))
    def dupPositions(g: DataFrame): DataFrame = g
      .join(g.groupBy("gh").agg(min(col("doc_id")).as("first_doc")), "gh")
      .filter(col("first_doc") < col("doc_id"))
      .select(col("doc_id").as("id"), col("pos"))
    val hit = dupPositions(gramHashes(toks)).localCheckpoint(true)
    val wPrev = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sp = hit
      .withColumn("brk",
        when(col("pos") > coalesce(max(col("pos") + 8).over(wPrev), lit(-1)), 1).otherwise(0))
      .withColumn("gid", sum(col("brk")).over(wCum))
      .groupBy("id", "gid")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + 8).as("e"))
    val ext = sp.groupBy("id").agg(collect_list(struct(col("s"), col("e"))).as("ext"))
    val clean = toks.join(ext, toks("doc_id") === ext("id"), "left")
      .select(col("doc_id"), filter(col("l"), (tok, i) =>
        !exists(coalesce(col("ext"), array().cast("array<struct<s:int,e:int>>")),
          e => (i + 1 >= e.getField("s")) && (i + 1 < e.getField("e")))).as("l"))
    val pre = hit.agg(count(lit(1)).as("v"))
      .select(lit("pre_dup_positions").as("metric"), lng(col("v")).as("val"), lit(0).as("o"))
    val post = dupPositions(gramHashes(clean)).agg(count(lit(1)).as("v"))
      .select(lit("post_dup_positions").as("metric"), lng(col("v")).as("val"), lit(1).as("o"))
    val removed = sp.agg(sum(col("e") - col("s")).as("v"))
      .select(lit("tokens_removed").as("metric"), lng(col("v")).as("val"), lit(2).as("o"))
    pre.unionByName(post).unionByName(removed).orderBy("o").select("metric", "val")
  }

  val all: Seq[Q] = Seq(qStripBoilerplate, qSemDedup, qD4Diversify, qBpeMerges, qWordpieceMerges, qUnigramLm, qUnigramTokenize, qTokenizerFertility, qSearchIndexed,
    qSpanDup, qSpanExtents, qBpeTokenize, qBpeBytes, qBpeBytesTokenize,
    qBpePretok, qQualityTiers, qRagChunk, qSpanStrip, qStripAudit)
}
