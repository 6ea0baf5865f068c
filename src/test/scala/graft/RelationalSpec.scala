package graft

import graft.operators.Relational
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("q1 aggregates reconcile with independent SQL computation") {
    Tables.registerAll(spark, TinyDir)
    val q1 = Relational.q1PricingSummary.fn(spark, TinyDir)
    val viaSql = spark.sql(
      """SELECT CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'""".stripMargin)
      .head().getDouble(0)
    val fromQ1 = q1.agg(sum("sum_qty")).head().getDouble(0)
    assert(math.abs(fromQ1 - viaSql) < 1e-9)
  }

  test("q1 output is deterministic across runs") {
    val a = Relational.q1PricingSummary.fn(spark, TinyDir).collect().toSeq
    val b = Relational.q1PricingSummary.fn(spark, TinyDir).collect().toSeq
    assert(a == b)
  }

  test("semi + anti join partition the customer set relative to their predicates") {
    val customers = Tables.customer(spark, TinyDir).count()
    val semi = Relational.qSemiJoin.fn(spark, TinyDir).count()
    val anti = Relational.qAntiJoin.fn(spark, TinyDir).count()
    assert(semi <= customers && anti <= customers)
    assert(semi > 0 && anti >= 0)
  }

  test("pivot row totals equal unpivoted sum") {
    val p = Relational.qPivot.fn(spark, TinyDir)
    val total = p.select(sum(col("A") + col("N") + col("R"))).head().getDouble(0)
    val direct = spark.read.parquet(s"$TinyDir/lineitem.parquet")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(total - direct) < 1e-6)
  }

  test("rollup grand total equals customer count") {
    val r = Relational.qRollup.fn(spark, TinyDir)
    val grand = r.filter(col("region") === "ALL" && col("nation") === "ALL")
      .select("n_customers").head().getLong(0)
    assert(grand == Tables.customer(spark, TinyDir).count())
  }

  test("window topk keeps at most 3 per brand, ranked") {
    val t = Relational.qWindowTopk.fn(spark, TinyDir)
    val maxPerBrand = t.groupBy("p_brand").count().agg(max("count")).head().getLong(0)
    assert(maxPerBrand <= 3)
    assert(t.filter(col("rnk") > 3).isEmpty)
  }

  test("zscore means ~0 within each segment") {
    val z = Relational.qZscore.fn(spark, TinyDir)
    val means = z.groupBy("c_mktsegment").agg(avg("z").as("m")).collect()
    means.foreach(r => assert(math.abs(r.getDouble(1)) < 1e-6))
  }
}
