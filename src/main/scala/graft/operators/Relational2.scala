package graft.operators

import graft.Q
import graft.functions.Exact._
import graft.sources.{Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 relational shapes not yet covered by §2.2: set operators,
  * explicit GROUPING SETS, above-average correlated filtering, and
  * min-per-group join-back (TPC-H Q2/Q17 flavors). All reference analogs
  * are loader/app SQL patterns (tcrd_app.py ad-hoc queries, loader QC
  * comparisons across releases).
  */
object Relational2 {

  /** EXCEPT / INTERSECT / UNION over customer key sets (release-over-
    * release membership diffing — "which targets appeared/vanished"). Set
    * ops plan as distinct aggregations co-partitioned on the full row — at
    * scale each is exactly one shuffle on the compared key. */
  val qSetOps: Q = Q(
    "q_set_ops",
    """WITH f AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
      |o AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
      |SELECT 'f_except_o' AS op, COUNT(*) AS n FROM (SELECT k FROM f EXCEPT SELECT k FROM o)
      |UNION ALL
      |SELECT 'f_intersect_o', COUNT(*) FROM (SELECT k FROM f INTERSECT SELECT k FROM o)
      |UNION ALL
      |SELECT 'f_union_o', COUNT(*) FROM (SELECT k FROM f UNION SELECT k FROM o)
      |ORDER BY op""".stripMargin) { (s, d) =>
    val orders = T.orders(s, d)
    def keys(status: String) =
      orders.filter(col("o_orderstatus") === status)
        .select(col("o_custkey").as("k")).distinct()
    val f = keys("F"); val o = keys("O")
    def counted(op: String, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
    counted("f_except_o", f.except(o))
      .union(counted("f_intersect_o", f.intersect(o)))
      .union(counted("f_union_o", f.union(o).distinct()))
      .orderBy("op")
  }

  /** Explicit GROUPING SETS with GROUPING() provenance flags — the QC
    * report shape where each dimension is totalled independently (one
    * Expand + one shuffle; no per-set rescan). SQL-expressed: the Dataset
    * rollup/cube API can't state arbitrary set lists. */
  val qGroupingSets: Q = Q(
    "q_grouping_sets",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status, CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_priority, status, priority""".stripMargin) { (s, d) =>
    T.orders(s, d).createOrReplaceTempView("graft_gs_orders")
    s.sql(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status, CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM graft_gs_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_priority, status, priority""".stripMargin)
  }

  /** Above-average correlated filter (TPC-H Q17 flavor): entities whose
    * metric exceeds their group's mean. The correlated scalar subquery is
    * decorrelated by hand into one aggregate + one broadcast join — the
    * plan every engine should reach, stated directly. Mean from exact
    * integer sums. */
  val qAboveAvg: Q = Q(
    "q_above_avg",
    """WITH c AS (SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders
      |  FROM customer JOIN orders ON o_custkey = c_custkey GROUP BY 1, 2),
      |seg AS (SELECT c_mktsegment, CAST(SUM(n_orders) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1)
      |SELECT c_custkey, c.c_mktsegment, n_orders,
      |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS seg_avg
      |FROM c JOIN seg ON c.c_mktsegment = seg.c_mktsegment
      |WHERE CAST(n_orders AS DOUBLE) > CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = T.customer(s, d).select("c_custkey", "c_mktsegment")
      .join(T.orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_mktsegment").agg(count(lit(1)).as("n_orders"))
    val seg = c.groupBy("c_mktsegment")
      .agg(sum(col("n_orders")).as("s"), count(lit(1)).as("n"))
      .withColumnRenamed("c_mktsegment", "seg_key")
    val avg = dbl(col("s")) / dbl(col("n"))
    c.join(broadcast(seg), col("c_mktsegment") === col("seg_key"))
      .filter(dbl(col("n_orders")) > avg)
      .select(col("c_custkey"), col("c_mktsegment"), col("n_orders"),
        round(avg, 6).as("seg_avg"))
      .orderBy("c_custkey")
  }

  /** Min-cost supplier per part (TPC-H Q2 flavor): per-group minimum
    * joined back to recover the argmin row, lowest-key tie-break. Two
    * shuffles on the part key; the min table is the small side. The
    * reference's "pick the best xref/nearest row per target" pattern
    * (loaders/load-KEGGNearestTclins.py) as pure relational algebra. */
  val qMinCostSupplier: Q = Q(
    "q_min_cost_supplier",
    """WITH costs AS (SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS best
      |  FROM lineitem GROUP BY 1, 2),
      |pmin AS (SELECT l_partkey, MIN(best) AS mn FROM costs GROUP BY 1)
      |SELECT c.l_partkey AS partkey, c.l_suppkey AS suppkey, CAST(c.best AS DOUBLE) AS best_price
      |FROM costs c JOIN pmin ON c.l_partkey = pmin.l_partkey AND c.best = pmin.mn
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY c.l_partkey ORDER BY c.l_suppkey) = 1
      |ORDER BY partkey""".stripMargin) { (s, d) =>
    val costs = T.lineitem(s, d)
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(dec2(col("l_extendedprice"))).as("best"))
    val pmin = costs.groupBy(col("l_partkey").as("pk"))
      .agg(min(col("best")).as("mn"))
    val w = Window.partitionBy("l_partkey").orderBy("l_suppkey")
    costs.join(pmin, col("l_partkey") === col("pk") && col("best") === col("mn"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"),
        dbl(col("best")).as("best_price"))
      .orderBy("partkey")
  }

  /** Chi-square contingency terms for a 2-way categorical table: observed
    * vs expected under independence, per-cell contribution. The
    * enrichment-statistics shape the reference applies to family/TDL
    * cross-tabs (doc/TCRD_Build_Notes.txt QC; load-DrugableEpigenomeTDLInfos
    * groupings). Margins come from exact integer sums; expected/chi² are
    * fixed-shape final doubles, so cross-engine identical. */
  val qChiSquare: Q = Q(
    "q_chi_square",
    """WITH obs AS (SELECT c_mktsegment AS seg, o_orderstatus AS status, COUNT(*) AS o
      |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
      |rm AS (SELECT seg, CAST(SUM(o) AS BIGINT) AS rs FROM obs GROUP BY 1),
      |cm AS (SELECT status, CAST(SUM(o) AS BIGINT) AS cs FROM obs GROUP BY 1),
      |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs)
      |SELECT seg, status, o AS observed,
      |  round(CAST(rs AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS expected,
      |  round(pow(CAST(o AS DOUBLE) - CAST(rs AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE), 2)
      |    / (CAST(rs AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS chi2_term
      |FROM obs JOIN rm USING (seg) JOIN cm USING (status) CROSS JOIN tot
      |ORDER BY seg, status""".stripMargin) { (s, d) =>
    val obs = T.orders(s, d)
      .join(broadcast(T.customer(s, d).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("o"))
    val rm = obs.groupBy("seg").agg(sum(col("o")).as("rs"))
    val cm = obs.groupBy("status").agg(sum(col("o")).as("cs"))
    val tot = obs.agg(sum(col("o")).as("n"))
    val expected = dbl(col("rs")) * dbl(col("cs")) / dbl(col("n"))
    obs.join(broadcast(rm), "seg").join(broadcast(cm), "status")
      .crossJoin(broadcast(tot))
      .select(col("seg"), col("status"), col("o").as("observed"),
        round(expected, 6).as("expected"),
        round(pow(dbl(col("o")) - expected, 2) / expected, 6).as("chi2_term"))
      .orderBy("seg", "status")
  }

  /** Top-3 order values per segment via the custom mergeable TopKAgg
    * (bounded k-heap per group, map-side partials — the exchange carries
    * ≤ k longs per group per partition instead of every row; see
    * functions/TopKAgg.scala). Values in exact integer cents; the oracle
    * states the same result as a window rank. */
  val qTopkAgg: Q = Q(
    "q_topk_agg",
    """WITH j AS (SELECT c_mktsegment AS seg,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |SELECT seg, rnk, CAST(cents AS DOUBLE) / 100 AS price
      |FROM (SELECT seg, cents, ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents DESC) AS rnk FROM j)
      |WHERE rnk <= 3 ORDER BY seg, rnk""".stripMargin) { (s, d) =>
    val j = T.orders(s, d)
      .join(broadcast(T.customer(s, d).select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        (dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    j.groupBy("seg")
      .agg(graft.functions.TopKAgg(col("cents"), 3).as("top"))
      .select(col("seg"), posexplode(col("top")).as(Seq("pos", "cents")))
      .select(col("seg"), (col("pos") + 1).cast("long").as("rnk"),
        (dbl(col("cents")) / 100).as("price"))
      .orderBy("seg", "rnk")
  }

  val all: Seq[Q] = Seq(qSetOps, qGroupingSets, qAboveAvg, qMinCostSupplier,
    qChiSquare, qTopkAgg)
}
