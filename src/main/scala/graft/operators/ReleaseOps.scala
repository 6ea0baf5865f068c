package graft.operators

import graft.Q
import graft.sources.{Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multi-release ledger analytics — the N-release extension of
  * [[ProvenanceOps.qReleaseDiff]]'s 2-release screen.
  *
  * The reference ships a new numbered release every few months and its
  * build notes track each dataset ACROSS releases, not just against the
  * previous one (doc/TCRD_Build_Notes.txt release tables;
  * perl/TCRD_TDLevol.txt follows TDL assignments over six releases).
  * Given a ledger with one (release, dataset, n_rows, content_fp) row per
  * dataset per release — exactly what [[ProvenanceOps.record]] appends on
  * every tracked load — these operators answer the warehouse questions a
  * point diff cannot:
  *
  *   - q_release_history: per-dataset trajectory over the whole release
  *     sequence — when it appeared, whether it ever skipped a release,
  *     how its row count moved, how often content churned with NO row
  *     movement (the silent-rewrite class only fingerprints catch) —
  *     folded to one stability class per dataset.
  *   - q_rebuild_plan: downstream invalidation — which derived artifacts
  *     (search indexes, TDL rollups, serving bundles) must rebuild given
  *     what changed, with the per-dependency reason. The reference
  *     recomputes ALL derived tables every release because it cannot
  *     answer this question; with a ledger the rebuild set is exact.
  *
  * Scale: both operators run over LEDGER rows — O(#datasets × #releases),
  * planner-sized no matter how big the data files are. The only scan in
  * the demos below is the deterministic carve that fabricates K releases
  * from `documents` (stand-in for K real loads); the analytics consume
  * only its per-dataset aggregates. The dependency map joins broadcast.
  */
object ReleaseOps {

  import ProvenanceOps.contentFp

  private val K = 4 // releases r = 0..3

  /** Deterministic carve of `documents` into release r's per-dataset
    * ledger rows (source = dataset). The rules are chosen so every
    * trajectory class appears:
    *   - presence: si < 14+2r (two sources join per release: late adds)
    *     and si != r (release r drops exactly source si=r: a gap);
    *   - rows: even si lose doc_id%7 >= 7-r per release (shrink),
    *     si%5==4 odd gain doc_id%7 < 4+r (grow), others keep all;
    *   - content: si%3==0 rewrites rows doc_id%11==r (fp churn, and for
    *     row-stable sources churn with NO row movement).
    * 7 and 11 are coprime to the testdata's source = doc_id%20 striping,
    * so the row rules actually bite per-source. */
  private def releaseLedger(docs: DataFrame, r: Int): DataFrame = {
    val si = substring(col("source"), 4, 3).cast("int")
    val keepRows = when(si % 2 === 0, col("doc_id") % 7 < lit(7 - r))
      .when(si % 5 === 4, col("doc_id") % 7 < lit(4 + r))
      .otherwise(lit(true))
    val content = when(si % 3 === 0 && col("doc_id") % 11 === lit(r),
      concat(col("text"), lit("!"))).otherwise(col("text"))
    docs.filter(si < lit(14 + 2 * r) && si =!= lit(r) && keepRows)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"), contentFp(content).as("fp"))
      .select(lit(r).as("r"), col("source"), col("n_rows"), col("fp"))
  }

  private def releaseLedgerSql(r: Int): String =
    s"""SELECT $r AS r, source, COUNT(*) AS n_rows,
       |  CAST(SUM(('0x' || substr(md5(CASE WHEN si % 3 = 0 AND doc_id % 11 = $r THEN text || '!' ELSE text END), 1, 15))::BIGINT)
       |    % 4611686018427387904 AS BIGINT) AS fp
       |FROM (SELECT *, CAST(substr(source, 4) AS INT) AS si FROM documents) d
       |WHERE si < ${14 + 2 * r} AND si <> $r
       |  AND (CASE WHEN si % 2 = 0 THEN doc_id % 7 < ${7 - r}
       |            WHEN si % 5 = 4 THEN doc_id % 7 < ${4 + r}
       |            ELSE TRUE END)
       |GROUP BY source""".stripMargin

  /** Per-dataset trajectory over the K-release ledger, one stability
    * class per dataset. `n_content_only` counts adjacent-release
    * transitions where the fingerprint moved but the row count did not —
    * the class a row-count-only ledger is structurally blind to, and the
    * reason [[ProvenanceOps.record]] stores content_fp at all. A
    * transition across a gap (dataset skipped a release) is counted in
    * `n_gaps`, not in the change tallies — "changed vs two releases ago"
    * and "changed vs last release" are different claims. */
  val qReleaseHistory: Q = Q(
    "q_release_history",
    s"""WITH rel AS (
       |${(0 until K).map(releaseLedgerSql).mkString("", "\nUNION ALL\n", "")}),
       |t AS (
       |  SELECT *, lag(r) OVER w AS prev_r, lag(n_rows) OVER w AS prev_n,
       |    lag(fp) OVER w AS prev_fp
       |  FROM rel WINDOW w AS (PARTITION BY source ORDER BY r)),
       |h AS (
       |  SELECT source AS dataset, COUNT(*) AS n_present,
       |    MIN(r) AS first_r, MAX(r) AS last_r,
       |    arg_max(n_rows, r) - arg_min(n_rows, r) AS net_delta,
       |    CAST(SUM(CASE WHEN prev_r = r - 1 AND n_rows <> prev_n THEN 1 ELSE 0 END) AS BIGINT) AS n_row_changes,
       |    CAST(SUM(CASE WHEN prev_r = r - 1 AND n_rows = prev_n AND fp <> prev_fp THEN 1 ELSE 0 END) AS BIGINT) AS n_content_only,
       |    CAST(SUM(CASE WHEN prev_r IS NOT NULL AND prev_r < r - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps
       |  FROM t GROUP BY source)
       |SELECT dataset, n_present, first_r, last_r, net_delta,
       |  n_row_changes, n_content_only, n_gaps,
       |  CASE WHEN n_gaps > 0 THEN 'intermittent'
       |       WHEN first_r > 0 THEN 'late_added'
       |       WHEN n_row_changes = 0 AND n_content_only > 0 THEN 'content_churn'
       |       WHEN net_delta < 0 THEN 'shrinking'
       |       WHEN net_delta > 0 THEN 'growing'
       |       ELSE 'stable' END AS klass
       |FROM h ORDER BY dataset""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val rel = (0 until K).map(releaseLedger(docs, _)).reduce(_.unionAll(_))
    val w = Window.partitionBy("source").orderBy("r")
    val t = rel
      .withColumn("prev_r", lag(col("r"), 1).over(w))
      .withColumn("prev_n", lag(col("n_rows"), 1).over(w))
      .withColumn("prev_fp", lag(col("fp"), 1).over(w))
    val adjacent = col("prev_r") === col("r") - 1
    val h = t.groupBy(col("source").as("dataset"))
      .agg(count(lit(1)).as("n_present"),
        min(col("r")).as("first_r"), max(col("r")).as("last_r"),
        (expr("max_by(n_rows, r)") - expr("min_by(n_rows, r)")).as("net_delta"),
        sum(when(adjacent && col("n_rows") =!= col("prev_n"), 1L)
          .otherwise(0L)).as("n_row_changes"),
        sum(when(adjacent && col("n_rows") === col("prev_n") &&
          col("fp") =!= col("prev_fp"), 1L).otherwise(0L)).as("n_content_only"),
        sum(when(col("prev_r").isNotNull && col("prev_r") < col("r") - 1, 1L)
          .otherwise(0L)).as("n_gaps"))
    h.select(col("dataset"), col("n_present"), col("first_r"), col("last_r"),
        col("net_delta"), col("n_row_changes"), col("n_content_only"),
        col("n_gaps"),
        when(col("n_gaps") > 0, "intermittent")
          .when(col("first_r") > 0, "late_added")
          .when(col("n_row_changes") === 0 && col("n_content_only") > 0,
            "content_churn")
          .when(col("net_delta") < 0, "shrinking")
          .when(col("net_delta") > 0, "growing")
          .otherwise("stable").as("klass"))
      .orderBy("dataset")
  }

  /** Artifact → dataset dependency map for the rebuild-plan demo. Stands
    * in for the warehouse's derived-table lineage (the reference's
    * search indexes / TDL rollups / serving bundles, each built from a
    * known set of loaded datasets). `art_idle` depends only on datasets
    * the diff carve leaves untouched — the planner must prove a
    * no-rebuild, not just flag everything. */
  private val Deps: Seq[(String, String)] = Seq(
    "art_core" -> "src0", "art_core" -> "src1", "art_core" -> "src2",
    "art_core" -> "src16",
    "art_search" -> "src8", "art_search" -> "src9", "art_search" -> "src10",
    "art_stats" -> "src5", "art_stats" -> "src6",
    "art_idle" -> "src6", "art_idle" -> "src7",
    "art_mixed" -> "src7", "art_mixed" -> "src19")

  private def depsSqlValues: String =
    Deps.map { case (a, s) => s"('$a', '$s')" }.mkString(", ")

  /** (dataset, kind) change classes between [[ProvenanceOps.qReleaseDiff]]'s
    * old and new carves — kind ∈ added/removed/rows/content/unchanged.
    * Shared by [[qRebuildPlan]] (the screen) and [[rebuildChanged]] (the
    * executor). Datasets-sized. */
  def releaseDiffKinds(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    def release(pred: Column, content: Column): DataFrame =
      docs.filter(pred).groupBy("source")
        .agg(count(lit(1)).as("n_rows"), contentFp(content).as("fp"))
    val old = release(col("doc_id") % 10 =!= 3 && col("source") =!= "src16",
        col("text"))
      .select(col("source").as("src_o"), col("n_rows").as("old_n"),
        col("fp").as("old_fp"))
    val nw = release(
        col("doc_id") % 10 =!= 3 && col("source") =!= "src5" &&
          !(col("doc_id") % 13 === 5 && col("source") <= "src4"),
        when(col("doc_id") % 13 === 0 && col("source") >= "src8",
          concat(col("text"), lit("!"))).otherwise(col("text")))
      .select(col("source").as("src_n"), col("n_rows").as("new_n"),
        col("fp").as("new_fp"))
    old.join(nw, col("src_o") === col("src_n"), "full_outer")
      .select(coalesce(col("src_o"), col("src_n")).as("dataset"),
        when(col("old_n").isNull, "added")
          .when(col("new_n").isNull, "removed")
          .when(col("old_n") =!= col("new_n"), "rows")
          .when(!(col("old_fp") <=> col("new_fp")), "content")
          .otherwise("unchanged").as("kind"))
  }

  /** Downstream invalidation from the release diff: per artifact, which
    * dependencies changed (and how), and whether a rebuild is needed.
    * Reuses [[ProvenanceOps.qReleaseDiff]]'s old/new carve verbatim so
    * the change classes are the proven ones. The diff side is
    * O(#datasets); the dependency map is a literal — at any scale this
    * join broadcasts, and the rebuild decision never touches data files. */
  val qRebuildPlan: Q = Q(
    "q_rebuild_plan",
    s"""WITH old AS (
       |  SELECT source, COUNT(*) AS n_rows,
       |    CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT) % 4611686018427387904 AS BIGINT) AS fp
       |  FROM documents WHERE doc_id % 10 <> 3 AND source <> 'src16' GROUP BY source),
       |nw AS (
       |  SELECT source, COUNT(*) AS n_rows,
       |    CAST(SUM(('0x' || substr(md5(CASE WHEN doc_id % 13 = 0 AND source >= 'src8' THEN text || '!' ELSE text END), 1, 15))::BIGINT)
       |      % 4611686018427387904 AS BIGINT) AS fp
       |  FROM documents
       |  WHERE doc_id % 10 <> 3 AND source <> 'src5'
       |    AND NOT (doc_id % 13 = 5 AND source <= 'src4')
       |  GROUP BY source),
       |diff AS (
       |  SELECT COALESCE(old.source, nw.source) AS dataset,
       |    CASE WHEN old.n_rows IS NULL THEN 'added'
       |         WHEN nw.n_rows IS NULL THEN 'removed'
       |         WHEN old.n_rows <> nw.n_rows THEN 'rows'
       |         WHEN old.fp IS DISTINCT FROM nw.fp THEN 'content'
       |         ELSE 'unchanged' END AS kind
       |  FROM old FULL JOIN nw ON old.source = nw.source),
       |deps(artifact, dataset) AS (VALUES $depsSqlValues)
       |SELECT deps.artifact, COUNT(*) AS n_deps,
       |  CAST(SUM(CASE WHEN diff.kind IS NOT NULL AND diff.kind <> 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       |  CAST(SUM(CASE WHEN diff.kind IS NOT NULL AND diff.kind <> 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) > 0 AS rebuild,
       |  COALESCE(string_agg(CASE WHEN diff.kind IS NOT NULL AND diff.kind <> 'unchanged'
       |    THEN deps.dataset || ':' || diff.kind END, ','
       |    ORDER BY deps.dataset || ':' || diff.kind), '') AS reasons
       |FROM deps LEFT JOIN diff ON deps.dataset = diff.dataset
       |GROUP BY deps.artifact ORDER BY deps.artifact""".stripMargin) { (s, d) =>
    import s.implicits._
    val diff = releaseDiffKinds(s, d)
    val deps = Deps.toDF("artifact", "dep_dataset")
    val changed = col("kind").isNotNull && col("kind") =!= "unchanged"
    deps.join(broadcast(diff), col("dep_dataset") === col("dataset"), "left")
      .groupBy(col("artifact"))
      .agg(count(lit(1)).as("n_deps"),
        sum(when(changed, 1L).otherwise(0L)).as("n_changed"),
        (sum(when(changed, 1L).otherwise(0L)) > 0).as("rebuild"),
        array_join(array_sort(collect_list(when(changed,
          concat(col("dep_dataset"), lit(":"), col("kind"))))), ",")
          .as("reasons"))
      .orderBy("artifact")
  }

  /** One derived artifact: its name, the datasets it reads, and how to
    * build it from the corpus. `build` receives the full input frame —
    * dependency filtering is the build's own business (an index over
    * three sources filters to them; a global stat reads everything it
    * declared). */
  final case class Artifact(name: String, deps: Seq[String],
                            build: DataFrame => DataFrame)

  /** Execute a rebuild plan: rebuild exactly the artifacts whose
    * dependency set intersects the changed datasets in `diffKinds`
    * ((dataset, kind) rows, kind 'unchanged' = untouched), leave every
    * other artifact's bytes alone, and append one ledger row PER REBUILT
    * artifact. Returns name → rebuilt?.
    *
    * This is [[qRebuildPlan]] executed: the reference recomputes every
    * derived table each release because it has no change ledger; with
    * one, a release that touched 3 of 40 datasets rebuilds only the
    * artifacts downstream of those 3. The decision reads datasets-sized
    * metadata (one small collect); each rebuild is that artifact's own
    * job; untouched artifacts cost ZERO I/O — at 100 TB the savings are
    * the point, and the untouched-bytes guarantee is what makes the
    * rebuild safely resumable (rerunning after a crash redoes only
    * rebuilt artifacts — overwrite writes are idempotent).
    */
  def rebuildChanged(input: DataFrame, artifacts: Seq[Artifact],
                     diffKinds: DataFrame, outDir: String, provDir: String,
                     loadedAtUs: Long): Map[String, Boolean] = {
    val changed = diffKinds.filter(col("kind") =!= "unchanged")
      .select("dataset").collect().map(_.getString(0)).toSet
    artifacts.map { a =>
      val stale = a.deps.exists(changed)
      if (stale) {
        val out = a.build(input)
        // tracked write: the ledger fingerprint reads back the PERSISTED
        // bytes, so a crash between write and ledger append re-runs into
        // the same idempotent overwrite
        ProvenanceOps.writeWithProvenance(
          out, s"$outDir/${a.name}",
          concat_ws("\u0001", out.columns.map(col).toSeq: _*),
          dataset = a.name, source = s"rebuild@$loadedAtUs",
          loadedAtUs = loadedAtUs, provDir = provDir)
      }
      a.name -> stale
    }.toMap
  }

  val all: Seq[Q] = Seq(qReleaseHistory, qRebuildPlan)
}
