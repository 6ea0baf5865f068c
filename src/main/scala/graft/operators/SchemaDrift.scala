package graft.operators

import graft.Q
import graft.sources.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Schema-drift reconciliation between two releases of a feed
  * (SURVEY.md §2.2 q_schema_drift): classify every column as
  * same / changed / renamed / added / removed — where RENAMES are
  * detected by CONTENT, not by name. Upstream feeds rename columns
  * between releases all the time (the reference's loaders hard-code a
  * fresh column map almost every release — e.g. the per-release header
  * remaps in `loaders/load-GTEx.py` / `python/csv2sql.py` usage); a
  * loader that only diffs header names sees a rename as
  * removed+added and silently drops the data.
  *
  * Mechanism: one pass per side computes a per-column PROFILE — non-null
  * count plus an order-independent content fingerprint (sum of per-value
  * 60-bit md5 ints, the [[ProvenanceOps.rowFingerprint]] family). Columns
  * sharing a name compare directly (same iff identical multiset);
  * orphaned old/new columns pair up as renames iff their (fingerprint,
  * count) match exactly, deterministically rank-ordered so even
  * duplicate-content columns pair stably.
  *
  * Scale: the profile pass is one map-side explode of each row into
  * (column, value) pairs + one aggregation — #cols × rows pairs, no
  * joins, no second scan. Classification then runs on #cols-sized
  * profiles: planner-sized at any corpus size.
  */
object SchemaDrift {

  import ProvenanceOps.contentFp

  /** (column, non-null count, order-independent content fingerprint) for
    * every column of `df` — ONE pass, map-side pair explosion. Values
    * compare via their canonical string cast. */
  def columnProfiles(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val kvs = df.columns.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val agg = df.select(explode(map(kvs.toSeq: _*)).as(Seq("c", "v")))
      .groupBy("c")
      .agg(count(col("v")).as("n"), contentFp(col("v")).as("fp"))
    // a zero-row frame still HAS a schema: every column profiles as
    // (n=0, fp=null) instead of vanishing from the report entirely
    df.columns.toSeq.toDF("c").join(agg, Seq("c"), "left")
      .na.fill(0L, Seq("n"))
  }

  /** Classify the drift between two column-profile frames. */
  def drift(oldP: DataFrame, newP: DataFrame): DataFrame = {
    val o = oldP.select(col("c").as("old_col"), col("n").as("old_n"),
      col("fp").as("old_fp"))
    val n = newP.select(col("c").as("new_col"), col("n").as("new_n"),
      col("fp").as("new_fp"))
    val byName = o.join(n, col("old_col") === col("new_col"), "full_outer")
    val matched = byName
      .filter(col("old_col").isNotNull && col("new_col").isNotNull)
      .select(col("old_col"), col("new_col"),
        when(col("old_fp") <=> col("new_fp") && col("old_n") === col("new_n"),
          "same").otherwise("changed").as("status"))
    // orphans pair as renames on exact (fingerprint, count); rank within
    // equal profiles makes duplicate-content columns pair deterministically
    val orphO = byName.filter(col("new_col").isNull)
      .select(col("old_col"), col("old_n"), col("old_fp"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("old_fp", "old_n").orderBy("old_col")))
    val orphN = byName.filter(col("old_col").isNull)
      .select(col("new_col"), col("new_n"), col("new_fp"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("new_fp", "new_n").orderBy("new_col")))
    // zero-count profiles carry no content evidence — an empty column is
    // never CLAIMED as a rename, it reports removed/added instead
    val pairCond = col("old_fp") === col("new_fp") &&
      col("old_n") === col("new_n") && col("old_n") > 0 &&
      orphO("rk") === orphN("rk")
    val renamed = orphO.join(orphN, pairCond)
      .select(col("old_col"), col("new_col"), lit("renamed").as("status"))
    val removed = orphO.join(orphN, pairCond, "left_anti")
      .select(col("old_col"), lit(null).cast("string").as("new_col"),
        lit("removed").as("status"))
    val added = orphN.join(orphO, pairCond, "left_anti")
      .select(lit(null).cast("string").as("old_col"), col("new_col"),
        lit("added").as("status"))
    matched.unionByName(renamed).unionByName(removed).unionByName(added)
      .orderBy(coalesce(col("old_col"), col("new_col")), col("status"))
  }

  private def fpSql(v: String): String =
    s"CAST(SUM(('0x' || substr(md5($v), 1, 15))::BIGINT) % 4611686018427387904 AS BIGINT)"

  /** Demo carve: the "new release" renames text→body, drops n_chars,
    * adds lang, and silently rewrites a sliver of source (doc_id%50=0
    * uppercased) — one column of every drift class. */
  val qSchemaDrift: Q = Q(
    "q_schema_drift",
    s"""WITH oldp AS (
       |  SELECT 'doc_id' AS c, COUNT(doc_id) AS n, ${fpSql("CAST(doc_id AS VARCHAR)")} AS fp FROM documents
       |  UNION ALL SELECT 'text', COUNT(text), ${fpSql("text")} FROM documents
       |  UNION ALL SELECT 'source', COUNT(source), ${fpSql("source")} FROM documents
       |  UNION ALL SELECT 'n_chars', COUNT(n_chars), ${fpSql("CAST(n_chars AS VARCHAR)")} FROM documents),
       |newp AS (
       |  SELECT 'doc_id' AS c, COUNT(doc_id) AS n, ${fpSql("CAST(doc_id AS VARCHAR)")} AS fp FROM documents
       |  UNION ALL SELECT 'body', COUNT(text), ${fpSql("text")} FROM documents
       |  UNION ALL SELECT 'source', COUNT(source), ${fpSql("CASE WHEN doc_id % 50 = 0 THEN upper(source) ELSE source END")} FROM documents
       |  UNION ALL SELECT 'lang', COUNT(lang), ${fpSql("lang")} FROM documents),
       |byname AS (
       |  SELECT o.c AS old_col, o.n AS old_n, o.fp AS old_fp,
       |         nw.c AS new_col, nw.n AS new_n, nw.fp AS new_fp
       |  FROM oldp o FULL JOIN newp nw ON o.c = nw.c),
       |matched AS (
       |  SELECT old_col, new_col,
       |    CASE WHEN old_fp IS NOT DISTINCT FROM new_fp AND old_n = new_n
       |         THEN 'same' ELSE 'changed' END AS status
       |  FROM byname WHERE old_col IS NOT NULL AND new_col IS NOT NULL),
       |orph_o AS (
       |  SELECT old_col, old_n, old_fp,
       |    row_number() OVER (PARTITION BY old_fp, old_n ORDER BY old_col) AS rk
       |  FROM byname WHERE new_col IS NULL),
       |orph_n AS (
       |  SELECT new_col, new_n, new_fp,
       |    row_number() OVER (PARTITION BY new_fp, new_n ORDER BY new_col) AS rk
       |  FROM byname WHERE old_col IS NULL),
       |renamed AS (
       |  SELECT o.old_col, a.new_col, 'renamed' AS status
       |  FROM orph_o o JOIN orph_n a
       |    ON o.old_fp = a.new_fp AND o.old_n = a.new_n AND o.old_n > 0 AND o.rk = a.rk),
       |removed AS (
       |  SELECT o.old_col, CAST(NULL AS VARCHAR) AS new_col, 'removed' AS status
       |  FROM orph_o o WHERE NOT EXISTS (
       |    SELECT 1 FROM orph_n a
       |    WHERE o.old_fp = a.new_fp AND o.old_n = a.new_n AND o.old_n > 0 AND o.rk = a.rk)),
       |added AS (
       |  SELECT CAST(NULL AS VARCHAR) AS old_col, a.new_col, 'added' AS status
       |  FROM orph_n a WHERE NOT EXISTS (
       |    SELECT 1 FROM orph_o o
       |    WHERE o.old_fp = a.new_fp AND o.old_n = a.new_n AND o.old_n > 0 AND o.rk = a.rk))
       |SELECT * FROM (
       |  SELECT * FROM matched UNION ALL SELECT * FROM renamed
       |  UNION ALL SELECT * FROM removed UNION ALL SELECT * FROM added)
       |ORDER BY COALESCE(old_col, new_col), status""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val oldRel = docs.select(col("doc_id"), col("text"), col("source"),
      col("n_chars"))
    val newRel = docs.select(col("doc_id"), col("text").as("body"),
      when(col("doc_id") % 50 === 0, upper(col("source")))
        .otherwise(col("source")).as("source"),
      col("lang"))
    drift(columnProfiles(oldRel), columnProfiles(newRel))
  }

  /** Apply a drift report: project the NEW release back into the OLD
    * schema so every downstream consumer keeps working — renamed columns
    * come back under their canonical names, surviving columns pass
    * through, removed columns re-appear as typed nulls (schema-stable
    * downstream; their absence is the drift report's business to
    * surface, not a downstream crash), and added columns are dropped
    * (they have no consumer yet — promote them by updating the canonical
    * schema, not by surprise). `oldSchema` supplies column order and the
    * types for null re-adds. Planner-sized: the report is #cols rows;
    * the result is one projection over `newRel`. */
  def applyDrift(newRel: DataFrame, report: DataFrame,
                 oldSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val rows = report.collect()
    val renamedTo = rows.filter(_.getAs[String]("status") == "renamed")
      .map(r => r.getAs[String]("old_col") -> r.getAs[String]("new_col")).toMap
    val removed = rows.filter(_.getAs[String]("status") == "removed")
      .map(_.getAs[String]("old_col")).toSet
    val cols = oldSchema.fields.map { f =>
      if (removed.contains(f.name)) lit(null).cast(f.dataType).as(f.name)
      else col(renamedTo.getOrElse(f.name, f.name)).as(f.name)
    }
    newRel.select(cols.toSeq: _*)
  }

  /** The drift → repair handoff, oracled: repair the drifted "new
    * release" back into the old schema and emit its column PROFILES —
    * text recovered from body byte-for-byte, the changed source column
    * passing through as-is, n_chars present-but-empty. The oracle
    * recomputes the same profiles from the carve directly. */
  val qDriftRepair: Q = Q(
    "q_drift_repair",
    s"""SELECT 'doc_id' AS c, COUNT(doc_id) AS n, ${fpSql("CAST(doc_id AS VARCHAR)")} AS fp FROM documents
       |UNION ALL SELECT 'text', COUNT(text), ${fpSql("text")} FROM documents
       |UNION ALL SELECT 'source', COUNT(source), ${fpSql("CASE WHEN doc_id % 50 = 0 THEN upper(source) ELSE source END")} FROM documents
       |UNION ALL SELECT 'n_chars', CAST(0 AS BIGINT), CAST(NULL AS BIGINT)
       |ORDER BY c""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val oldRel = docs.select(col("doc_id"), col("text"), col("source"),
      col("n_chars"))
    val newRel = docs.select(col("doc_id"), col("text").as("body"),
      when(col("doc_id") % 50 === 0, upper(col("source")))
        .otherwise(col("source")).as("source"),
      col("lang"))
    val report = drift(columnProfiles(oldRel), columnProfiles(newRel))
    val repaired = applyDrift(newRel, report, oldRel.schema)
    columnProfiles(repaired).orderBy("c")
  }

  val all: Seq[Q] = Seq(qSchemaDrift, qDriftRepair)
}
