package graft

import graft.operators.CboDemo
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Cost-based join reorder is load-bearing (SURVEY.md §2.5
  * conf_cbo_stats, bench-scale demo q_cbo_star): with catalog statistics
  * present, `spark.sql.cbo.joinReorder` rewrites a stats-hostile declared
  * join order — and the rewrite changes the plan, not the answer. */
class CboReorderSpec extends SparkSpec {

  /** Catalog-table leaves of the optimized join tree, left-to-right —
    * the join order the planner actually chose. */
  private def joinLeaves(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.catalogTable.map(_.identifier.table).getOrElse("anon")
    }

  test("with stats, joinReorder changes the join order but not the answer") {
    CboDemo.registerAnalyzed(spark, SmallDir,
      Seq("lineitem", "orders", "customer", "nation"))

    var ruleBased: Seq[String] = Nil
    var ruleRows: Array[org.apache.spark.sql.Row] = Array.empty
    withConf("spark.sql.cbo.enabled" -> "false",
      "spark.sql.cbo.joinReorder.enabled" -> "false") {
      val df = CboDemo.starPlan(spark)
      ruleBased = joinLeaves(df)
      ruleRows = df.collect()
    }

    var costBased: Seq[String] = Nil
    var cboRows: Array[org.apache.spark.sql.Row] = Array.empty
    withConf(CboDemo.CboConfs: _*) {
      val df = CboDemo.starPlan(spark)
      costBased = joinLeaves(df)
      cboRows = df.collect()
    }

    assert(ruleBased.size == 4 && costBased.size == 4,
      s"expected 4 join leaves: rule=$ruleBased cbo=$costBased")
    assert(costBased != ruleBased,
      s"stats did not change the join order: both $ruleBased")
    assert(costBased.head != "cbo_lineitem",
      s"fact table still joined first under CBO: $costBased")
    assert(cboRows.toSeq == ruleRows.toSeq,
      "reorder changed the answer")
    assert(cboRows.nonEmpty)
  }

  test("q_cbo_star executes the reordered plan and restores session confs") {
    val before = spark.conf.getOption("spark.sql.cbo.enabled")
    val out = CboDemo.qCboStar.fn(spark, SmallDir)
    assert(out.count() > 0)
    assert(spark.conf.getOption("spark.sql.cbo.enabled") == before,
      "q_cbo_star leaked CBO confs into the session")
  }
}
