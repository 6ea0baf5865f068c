package graft.operators

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Warehouse-maintenance operators: the reference's loaders are all
  * "diff the incoming release against the warehouse, then ins/upd/del"
  * (loaders/TCRD.py ins_/upd_ helpers) plus build-notes referential
  * audits (doc/TCRD_Build_Notes.txt QC). These are their set-based Spark
  * forms — one full-outer join / one left join per audit edge instead of
  * row-at-a-time cursor loops.
  */
object LoaderOps {

  /** Snapshot delta detection: classify every key across two table
    * versions as insert / delete / update in ONE full-outer join on the
    * key — the loader-diff primitive. The two "releases" are carved
    * deterministically out of `orders` (old: keys with k%10 != 3; new:
    * keys with k%10 != 7, prices bumped 5% where k%13 = 0) so the diff is
    * reproducible. All price math is DECIMAL-exact (SURVEY.md §5); at
    * scale this is a single co-partitioned shuffle on the key. */
  val qDeltaDetect: Q = Q(
    "q_delta_detect",
    """WITH o AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS p FROM orders),
      |old AS (SELECT o_orderkey AS k, p FROM o WHERE o_orderkey % 10 <> 3),
      |nw AS (SELECT o_orderkey AS k,
      |  CASE WHEN o_orderkey % 13 = 0 THEN CAST(p * CAST(1.05 AS DECIMAL(3,2)) AS DECIMAL(16,4))
      |       ELSE CAST(p AS DECIMAL(16,4)) END AS p
      |  FROM o WHERE o_orderkey % 10 <> 7)
      |SELECT COALESCE(old.k, nw.k) AS o_orderkey,
      |  CASE WHEN old.k IS NULL THEN 'insert' WHEN nw.k IS NULL THEN 'delete' ELSE 'update' END AS change,
      |  CAST(old.p AS DOUBLE) AS old_price, CAST(nw.p AS DOUBLE) AS new_price
      |FROM old FULL JOIN nw ON old.k = nw.k
      |WHERE old.k IS NULL OR nw.k IS NULL OR old.p <> nw.p
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = T.orders(s, d).select(col("o_orderkey"), dec2(col("o_totalprice")).as("p"))
    val old = o.filter(col("o_orderkey") % 10 =!= 3)
      .select(col("o_orderkey").as("k_old"), col("p").as("old_p"))
    val nw = o.filter(col("o_orderkey") % 10 =!= 7)
      .select(col("o_orderkey").as("k_new"),
        when(col("o_orderkey") % 13 === 0,
          (col("p") * lit(1.05).cast(DecimalType(3, 2))).cast(DecimalType(16, 4)))
          .otherwise(col("p").cast(DecimalType(16, 4))).as("new_p"))
    old.join(nw, col("k_old") === col("k_new"), "full_outer")
      .filter(col("k_old").isNull || col("k_new").isNull || col("old_p") =!= col("new_p"))
      .select(coalesce(col("k_old"), col("k_new")).as("o_orderkey"),
        when(col("k_old").isNull, "insert").when(col("k_new").isNull, "delete")
          .otherwise("update").as("change"),
        dbl(col("old_p")).as("old_price"), dbl(col("new_p")).as("new_price"))
      .orderBy("o_orderkey")
  }

  /** One referential-integrity audit edge: child LEFT JOIN parent on the
    * FK, count rows and orphans. */
  private def fkEdge(label: String, child: DataFrame, ck: Column,
                     parent: DataFrame, pk: Column): DataFrame =
    child.join(parent, ck === pk, "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(pk.isNull, 1L).otherwise(0L)).as("n_orphans"))
      .select(lit(label).as("fk"), col("n_rows"), col("n_orphans"))

  /** Referential-integrity audit over every FK edge of the star schema —
    * the build-notes QC pass, as six independent left-join aggregates
    * unioned (each runs in parallel; the dim sides broadcast). A non-zero
    * orphan count is the "dangling xref" signal the reference checks for
    * after each load. */
  val qFkIntegrity: Q = Q(
    "q_fk_integrity",
    """SELECT * FROM (
      |SELECT 'customer.c_nationkey->nation' AS fk, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |UNION ALL
      |SELECT 'lineitem.l_orderkey->orders', COUNT(*), CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |UNION ALL
      |SELECT 'lineitem.l_partkey->part', COUNT(*), CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |UNION ALL
      |SELECT 'lineitem.l_suppkey->supplier', COUNT(*), CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |UNION ALL
      |SELECT 'orders.o_custkey->customer', COUNT(*), CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |UNION ALL
      |SELECT 'supplier.s_nationkey->nation', COUNT(*), CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey)
      |ORDER BY fk""".stripMargin) { (s, d) =>
    val nation = broadcast(T.nation(s, d))
    fkEdge("customer.c_nationkey->nation",
        T.customer(s, d), col("c_nationkey"), nation, col("n_nationkey"))
      .union(fkEdge("lineitem.l_orderkey->orders",
        T.lineitem(s, d), col("l_orderkey"), T.orders(s, d), col("o_orderkey")))
      .union(fkEdge("lineitem.l_partkey->part",
        T.lineitem(s, d), col("l_partkey"), T.part(s, d), col("p_partkey")))
      .union(fkEdge("lineitem.l_suppkey->supplier",
        T.lineitem(s, d), col("l_suppkey"), T.supplier(s, d), col("s_suppkey")))
      .union(fkEdge("orders.o_custkey->customer",
        T.orders(s, d), col("o_custkey"), T.customer(s, d), col("c_custkey")))
      .union(fkEdge("supplier.s_nationkey->nation",
        T.supplier(s, d), col("s_nationkey"), nation, col("n_nationkey")))
      .orderBy("fk")
  }

  /** Deterministic string aggregation: per-group sorted roster string —
    * the reference's "assemble a target's description/synonym list from
    * its member rows" pattern (loaders/load-HGNC.py synonym lists; every
    * `GROUP_CONCAT` in tcrd_app.py). collect_list is order-nondeterministic
    * under parallelism, so the array is sorted before joining — identical
    * output on any partitioning, matching string_agg(... ORDER BY). */
  val qStringAgg: Q = Q(
    "q_string_agg",
    """SELECT n_name, COUNT(*) AS n_suppliers,
      |  string_agg(s_name, ',' ORDER BY s_name) AS roster
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    T.supplier(s, d)
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        concat_ws(",", array_sort(collect_list(col("s_name")))).as("roster"))
      .orderBy("n_name")
  }

  /** Source-priority attribute reconciliation: when many sources propose
    * a value for the same entity attribute, keep the highest-priority
    * source's value with a total tie-break — the reference's xref dedup
    * rule (loaders/load-UniProtXRefs.py: one row per (target, type,
    * value), best source wins). One candidate-build join tree + one
    * entity-keyed window shuffle. */
  val qSourcePriority: Q = Q(
    "q_source_priority",
    """WITH cand AS (SELECT DISTINCT l_partkey AS pk, s_suppkey AS sk, n_name, n_nationkey % 4 AS prio
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey)
      |SELECT pk AS partkey, n_name AS origin, CAST(prio AS BIGINT) AS priority, n_cand
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY prio, n_name, sk) AS rn,
      |        COUNT(*) OVER (PARTITION BY pk) AS n_cand FROM cand)
      |WHERE rn = 1 ORDER BY partkey""".stripMargin) { (s, d) =>
    // distinct FIRST on the two long keys (supplier→nation is functional,
    // so deduping before the dim joins is equivalent and the shuffle
    // carries 16 bytes/row instead of strings)
    val cand = T.lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(T.supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
        col("n_name"), (col("n_nationkey") % 4).as("prio"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("pk")
    cand
      .withColumn("rn", row_number().over(w.orderBy(col("prio"), col("n_name"), col("sk"))))
      .withColumn("n_cand", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("pk").as("partkey"), col("n_name").as("origin"),
        lng(col("prio")).as("priority"), col("n_cand"))
      .orderBy("partkey")
  }

  /** Bulk ID resolution with staged fallback — the `tcrd_app.py --qfile`
    * shape (python/tcrd_app.py:37 find_targets: resolve a FILE of query
    * strings to targets by symbol, then synonyms/xrefs): each probe
    * resolves at the best (lowest) stage — exact name, then first-token,
    * then second-token — ties to the lowest key; unresolved probes come
    * back with stage -1. Every stage is an EQUI-join of the broadcast
    * probe set against a derived key (full name / token columns) — the
    * LIKE-based formulation would be a nested-loop scan per probe; keyed
    * stages make bulk resolution one hash-join pass per stage at any
    * probe-file size, which is why real resolvers precompute synonym/xref
    * key tables (and why sink_inverted exists). */
  val qIdResolve: Q = Q(
    "q_id_resolve",
    """WITH probes(q) AS (VALUES ('large bolt'),('blue rod'),('large'),('cold'),
      |    ('bolt'),('rod'),('widget'),('nosuchthing')),
      |p AS (SELECT p_partkey, p_name, string_split(p_name, ' ') AS toks FROM part),
      |m AS (
      |  SELECT q, 0 AS stage, p_partkey, p_name FROM probes JOIN p ON p.p_name = probes.q
      |  UNION ALL
      |  SELECT q, 1, p_partkey, p_name FROM probes JOIN p ON p.toks[1] = probes.q
      |  UNION ALL
      |  SELECT q, 2, p_partkey, p_name FROM probes JOIN p ON p.toks[2] = probes.q),
      |best AS (SELECT q, stage, p_partkey, p_name,
      |           ROW_NUMBER() OVER (PARTITION BY q ORDER BY stage, p_partkey) AS rn
      |         FROM m)
      |SELECT probes.q AS query, CAST(COALESCE(b.stage, -1) AS INT) AS stage,
      |       b.p_partkey, b.p_name
      |FROM probes LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.q = probes.q
      |ORDER BY query""".stripMargin) { (s, d) =>
    import s.implicits._
    val probes = Seq("large bolt", "blue rod", "large", "cold",
      "bolt", "rod", "widget", "nosuchthing").toDF("q")
    val p = T.part(s, d).select(col("p_partkey"), col("p_name"),
      split(col("p_name"), " ").as("toks"))
    def stage(n: Int, key: Column): DataFrame =
      p.join(broadcast(probes), key === col("q"))
        .select(col("q"), lit(n).as("stage"), col("p_partkey"), col("p_name"))
    val m = stage(0, col("p_name"))
      .unionByName(stage(1, col("toks").getItem(0)))
      .unionByName(stage(2, col("toks").getItem(1)))
    val best = m.groupBy("q")
      .agg(min(struct(col("stage"), col("p_partkey"), col("p_name"))).as("b"))
      .select(col("q"), col("b.stage").as("stage"),
        col("b.p_partkey").as("p_partkey"), col("b.p_name").as("p_name"))
    probes.join(best, Seq("q"), "left")
      .select(col("q").as("query"),
        coalesce(col("stage"), lit(-1)).as("stage"),
        col("p_partkey"), col("p_name"))
      .orderBy("query")
  }

  /** Remap a key column through a curated patch table (old_id → new_id):
    * one broadcast left join + coalesce — the set-based form of the
    * reference's hand-written cross-release identity repairs
    * (SQL/update_geneids7.sql: `UPDATE protein SET geneid = ... WHERE
    * sym = ...` between releases). `df` must not already carry columns
    * named old_id/new_id. The patch is curation-sized → broadcast; the
    * fact side streams map-side, no shuffle. */
  def patchKeys(df: DataFrame, keyCol: String, patch: DataFrame): DataFrame = {
    // a malformed patch is a curation error this op exists to catch, not
    // propagate: a duplicate old_id would FAN OUT the fact (the SQL UPDATE
    // this replaces can never duplicate rows), and a null new_id would
    // silently revert to the old key via the coalesce. Validate up front —
    // the patch is curation-sized, so this is a tiny driver-side check.
    val bad = patch.select("old_id", "new_id")
      .groupBy("old_id")
      .agg(count(lit(1)).as("c"),
        sum(when(col("new_id").isNull, 1L).otherwise(0L)).as("nulls"))
      .filter(col("c") > 1 || col("nulls") > 0)
      .limit(5).collect()
    require(bad.isEmpty,
      s"patchKeys: malformed patch (duplicate old_id or null new_id): " +
        bad.map(_.get(0)).mkString(", "))
    df.join(broadcast(patch.select("old_id", "new_id")),
        df(keyCol) === col("old_id"), "left")
      .withColumn(keyCol, coalesce(col("new_id"), df(keyCol)))
      .drop("old_id", "new_id")
  }

  /** Composed stable-ID remediation — apply the patch, persist the
    * repaired snapshot, record provenance, and re-verify FK integrity in
    * ONE call (the full update_geneids7.sql workflow, not just the
    * UPDATE): returns the audit metrics; throws nothing — a non-zero
    * orphans_after is the caller's signal to NOT promote the snapshot. */
  def remediateTracked(factNew: DataFrame, fk: String, dim: DataFrame,
                       dimKey: String, patch: DataFrame, outPath: String,
                       provDir: String, loadedAtUs: Long,
                       source: String = "id_patch"): Map[String, Long] = {
    val spark = factNew.sparkSession
    val patched = patchKeys(factNew, fk, patch)
    patched.write.mode("overwrite").parquet(outPath)
    val persisted = spark.read.parquet(outPath)
    // fingerprint the WHOLE persisted row, not just the key: a ledger row
    // must distinguish "same keys, different payload" re-runs
    ProvenanceOps.record(persisted,
      graft.sources.FanOut.contentAllColumns(persisted),
      s"remediated:$fk", source, loadedAtUs, provDir)
    val dimK = broadcast(dim.select(col(dimKey).as("__dk")))
    val after = persisted.join(dimK, col(fk) === col("__dk"), "left")
      .agg(sum(when(col("__dk").isNull, 1L).otherwise(0L))).head().getLong(0)
    Map(
      "patch_size" -> patch.count(),
      "patched_fact_rows" ->
        factNew.join(broadcast(patch), factNew(fk) === col("old_id"), "left_semi").count(),
      "orphans_after" -> after)
  }

  /** The remediation workflow as an oracle-checked query. The scenario is
    * the reference's release-over-release identity drift: the new release
    * migrated every c_custkey ≡ 0 (mod 97) to key+1000000 (dim_new), the
    * fact table still references the retired keys, and the curated patch
    * maps old → new. Output: FK orphans before the patch (the drift), the
    * patch's size and reach, and orphans after (must be 0 — the promote
    * gate). Dim keys and the patch broadcast; each audit edge is one
    * map-side join over the fact. */
  val qIdRemediate: Q = Q(
    "q_id_remediate",
    """WITH patch AS (
      |  SELECT c_custkey AS old_id, c_custkey + 1000000 AS new_id
      |  FROM customer WHERE c_custkey % 97 = 0),
      |dim_new AS (
      |  SELECT CASE WHEN c_custkey % 97 = 0 THEN c_custkey + 1000000
      |              ELSE c_custkey END AS c_custkey FROM customer),
      |o_patched AS (
      |  SELECT COALESCE(p.new_id, o.o_custkey) AS o_custkey
      |  FROM orders o LEFT JOIN patch p ON o.o_custkey = p.old_id),
      |m AS (
      |  SELECT 'orphans_after' AS metric,
      |    CAST(SUM(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value
      |  FROM o_patched o LEFT JOIN dim_new d ON o.o_custkey = d.c_custkey
      |  UNION ALL
      |  SELECT 'orphans_before',
      |    CAST(SUM(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders o LEFT JOIN dim_new d ON o.o_custkey = d.c_custkey
      |  UNION ALL
      |  SELECT 'patch_size', COUNT(*) FROM patch
      |  UNION ALL
      |  SELECT 'patched_fact_rows', COUNT(*)
      |  FROM orders o JOIN patch p ON o.o_custkey = p.old_id)
      |SELECT metric, value FROM m ORDER BY metric""".stripMargin) { (s, d) =>
    val cust = T.customer(s, d)
    val patch = cust.filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("old_id"),
        (col("c_custkey") + 1000000L).as("new_id"))
    val dimNew = broadcast(cust.select(
      when(col("c_custkey") % 97 === 0, col("c_custkey") + 1000000L)
        .otherwise(col("c_custkey")).as("c_custkey")))
    val orders = T.orders(s, d)
    val patched = patchKeys(orders, "o_custkey", patch)
    def orphans(label: String, fact: DataFrame): DataFrame =
      fact.join(dimNew, fact("o_custkey") === dimNew("c_custkey"), "left")
        .agg(sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("value"))
        .select(lit(label).as("metric"), col("value"))
    orphans("orphans_after", patched)
      .unionByName(orphans("orphans_before", orders))
      .unionByName(patch.agg(count(lit(1)).as("value"))
        .select(lit("patch_size").as("metric"), col("value")))
      .unionByName(orders
        .join(broadcast(patch), col("o_custkey") === col("old_id"), "left_semi")
        .agg(count(lit(1)).as("value"))
        .select(lit("patched_fact_rows").as("metric"), col("value")))
      .orderBy("metric")
  }

  val all: Seq[Q] = Seq(qDeltaDetect, qFkIntegrity, qStringAgg, qSourcePriority,
    qIdResolve, qIdRemediate)
}
