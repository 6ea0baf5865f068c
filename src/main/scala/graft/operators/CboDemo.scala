package graft.operators

import graft.Q
import graft.functions.Exact.{discPrice, sumDbl}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Cost-based join reorder, demonstrated end-to-end at bench scale
  * (SURVEY.md §2.5 conf_cbo_stats — the bench-scale demo VERDICT r6
  * queued as an r8 candidate).
  *
  * The reference ANALYZEs its MySQL tables after every load so the
  * planner can order multi-table detail-page joins; the Spark-native
  * equivalent is catalog `CatalogStatistics` + `spark.sql.cbo.enabled` +
  * `joinReorder`. This operator runs a four-table star join DECLARED in
  * a stats-hostile order — the two largest tables first, with no join
  * predicate between them — and lets the cost-based reorderer recover
  * the selective order (filtered dims in, fact last) from injected
  * statistics. CboReorderSpec pins that the reorder actually happens
  * (the optimized join tree differs from the rule-based one and the
  * fact table is no longer joined first); this query pins that the
  * ANSWER is unchanged by the reorder, hash-matched against the oracle.
  *
  * At 100 TB the declared order is the difference between shuffling the
  * fact table against an unfiltered dimension and broadcasting two
  * filtered dims — CBO makes the good plan independent of how the user
  * wrote the FROM clause. Stats here come from ANALYZE (one scan, the
  * loader's commit hook); [[graft.sources.SidecarStats.registerWithStats]]
  * produces the same `CatalogStatistics` scan-free from the zone sidecar
  * when the table was written with one.
  */
object CboDemo {

  val CboConfs: Seq[(String, String)] = Seq(
    "spark.sql.cbo.enabled" -> "true",
    "spark.sql.cbo.joinReorder.enabled" -> "true")

  /** The columns whose statistics the reorderer consults: join keys (NDV
    * drives the join cardinality estimate) and filter columns (NDV drives
    * selectivity). ANALYZE only these — FOR ALL COLUMNS would scan every
    * column of the fact table to build stats the planner never reads. */
  private val StatsCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderpriority"),
    "customer" -> Seq("c_custkey", "c_nationkey", "c_mktsegment"),
    "nation" -> Seq("n_nationkey"))

  /** Register `names` as external catalog tables over `dir`'s parquet
    * (no copy — LOCATION points at the existing files) and ANALYZE each
    * for row counts + planner-relevant column stats. Idempotent. */
  def registerAnalyzed(s: SparkSession, dir: String, names: Seq[String]): Unit =
    names.foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS cbo_$t")
      s.sql(s"CREATE TABLE cbo_$t USING parquet LOCATION '$dir/$t.parquet'")
      val cols = StatsCols.getOrElse(t, Seq.empty)
      if (cols.nonEmpty)
        s.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR COLUMNS ${cols.mkString(", ")}")
      else
        s.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS")
    }

  /** The stats-hostile declared order: fact first, then customer (no
    * predicate links them — only reordering can avoid a cartesian/late
    * filter), dims last. Built from the catalog tables so CBO sees the
    * injected statistics. */
  def starPlan(s: SparkSession): DataFrame =
    s.table("cbo_lineitem")
      .join(s.table("cbo_customer").filter(col("c_mktsegment") === "BUILDING"))
      .join(s.table("cbo_orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey") &&
          col("c_custkey") === col("o_custkey"))
      .join(s.table("cbo_nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        sumDbl(discPrice(col("l_extendedprice"), col("l_discount")))
          .as("revenue"))
      .orderBy("n_name")

  /** Runs [[starPlan]] WITH cost-based reorder active (confs set for the
    * duration of the action, then restored — the result is materialized
    * eagerly so the CBO plan is the one that executes). */
  val qCboStar: Q = Q(
    "q_cbo_star",
    """SELECT n_name, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderpriority = '1-URGENT'
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    val prev = CboConfs.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      CboConfs.foreach { case (k, v) => s.conf.set(k, v) }
      registerAnalyzed(s, d, Seq("lineitem", "orders", "customer", "nation"))
      val df = starPlan(s)
      // aggregate result is nation-sized: materialize under the CBO confs
      // so the reordered plan is the one measured, then hand back a local
      // relation (conf restore must not re-plan the returned frame)
      s.createDataFrame(df.collect().toList.asJava, df.schema)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  val all: Seq[Q] = Seq(qCboStar)
}
