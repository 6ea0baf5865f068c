package graft

import graft.operators.Relational

/** Regression guards for the physical-plan properties PLANS.md documents:
  * if a future change drops a broadcast or un-pushes a filter, these fail
  * before the benchmark does. */
class PlanShapeSpec extends SparkSpec {

  private def executed(q: graft.Q): String = {
    val df = q.fn(spark, TinyDir)
    df.collect()
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("region volume: all five dim joins broadcast, region filter pushed") {
    val plan = executed(Relational.qRegionVolume)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4, plan)
    assert(plan.contains("EqualTo(r_name,ASIA)"), plan)
  }

  test("pricing summary: shipdate predicate reaches the parquet scan") {
    val plan = executed(Relational.q1PricingSummary)
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan)
    assert(plan.contains("codegen id"), plan) // whole-stage codegen spans
  }

  test("enrich join: lineitem-free star join reads only needed columns") {
    val plan = executed(Relational.qEnrichJoin)
    assert(!plan.contains("l_orderkey"), plan) // no stray fact scan
    assert(plan.contains("ReadSchema: struct<c_custkey"), plan)
  }
}
