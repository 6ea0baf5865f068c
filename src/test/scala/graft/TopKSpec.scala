package graft

import graft.plans.{TopK, TopKPerKeyExec, TopKQueries}
import graft.operators.Relational
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("TopKPerKey equals window-rank filter under a total ordering") {
    val viaWindow = Relational.qWindowTopk.fn(spark, SmallDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val viaCustom = TopKQueries.qTopkCustom.fn(spark, SmallDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(viaCustom == viaWindow)
  }

  test("plan contains partial+final TopKPerKeyExec with an exchange between") {
    val df = TopK.perKey(
      spark.read.parquet(s"$TinyDir/orders.parquet"),
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 2)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString()
    assert("TopKPerKey".r.findAllIn(plan).size >= 2, s"plan:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"plan:\n$plan")
    assert(!plan.contains("Window"), s"plan:\n$plan")
  }

  test("k exceeding group size keeps all rows; results deterministic") {
    import spark.implicits._
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 3.0), ("b", 3L, 9.0))
      .toDF("k", "id", "v")
    val got = TopK.perKey(df, Seq(col("k")), Seq(col("v").desc, col("id").asc), 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 3L)))
    val top1 = TopK.perKey(df, Seq(col("k")), Seq(col("v").desc, col("id").asc), 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(top1 == Set(("a", 1L), ("b", 3L)))
  }
}
