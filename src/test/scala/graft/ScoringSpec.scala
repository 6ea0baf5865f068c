package graft

import graft.operators.Scoring
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class ScoringSpec extends SparkSpec {

  test("cdf is within (0,1] and monotone in count within a segment") {
    val c = Scoring.qCdf.fn(spark, TinyDir)
    assert(c.filter(col("cdf") <= 0 || col("cdf") > 1).isEmpty)
    // max count in each segment must have cdf == 1
    val top = c.withColumn("mx", max("cnt").over(
      org.apache.spark.sql.expressions.Window.partitionBy("c_mktsegment")))
      .filter(col("cnt") === col("mx"))
    assert(top.filter(col("cdf") =!= 1.0).isEmpty)
  }

  test("tau is within [0,1]") {
    val t = Scoring.qTau.fn(spark, TinyDir)
    assert(t.filter(col("tau") < 0 || col("tau") > 1).isEmpty)
  }

  test("tdl classes are exhaustive and exclusive") {
    val t = Scoring.qTdl.fn(spark, TinyDir)
    val classes = t.select("tdl").distinct().collect().map(_.getString(0)).toSet
    assert(classes.subsetOf(Set("Tclin", "Tchem", "Tbio", "Tdark")))
    assert(t.count() == spark.read.parquet(s"$TinyDir/customer.parquet").count())
  }

  test("tinx novelty: sum over parts of novelty equals number of pubs (orders)") {
    // sum_t sum_{pubs(t)} 1/|targets(pub)| == sum_pubs 1 == |pubs with >=1 part|
    val n = Scoring.qTinxNovelty.fn(spark, TinyDir)
    val total = n.agg(sum("novelty")).head().getDouble(0)
    val pubs = spark.read.parquet(s"$TinyDir/lineitem.parquet")
      .select("l_orderkey").distinct().count()
    assert(math.abs(total - pubs) < 0.01, s"$total vs $pubs")
  }

  test("consensus mode yields one row per customer with orders") {
    val m = Scoring.qConsensusMode.fn(spark, TinyDir)
    assert(m.count() == spark.read.parquet(s"$TinyDir/orders.parquet")
      .select("o_custkey").distinct().count())
    assert(m.groupBy("o_custkey").count().filter(col("count") > 1).isEmpty)
  }

  test("hll sketch distinct is within 5% of exact per supplier") {
    // the query carries the oracled exact half + the 5% flag; every
    // group's flag must hold
    val r = Scoring.qSketchDistinct.fn(spark, SmallDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Boolean]("rel_err_le_5pct"),
        s"supplier ${row.get(0)}: estimate strays beyond 5% of ${row.get(1)}")
    }
    // independent numeric bound on the raw estimates
    val raw = graft.sources.Tables.lineitem(spark, SmallDir)
      .groupBy("l_suppkey")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    raw.foreach { row =>
      val approx = row.getLong(1).toDouble
      val exact = row.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"supplier ${row.get(0)}: $approx vs $exact")
    }
  }

  test("ann topk returns exactly 5 neighbors per probe with descending cos") {
    val a = Similarity.qAnnTopk.fn(spark, TinyDir)
    val counts = a.groupBy("query_id").count().collect()
    counts.foreach(r => assert(r.getLong(1) >= 5)) // >=5 with rank ties
    // rank 1 has the max cos per query
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
    val bad = a.withColumn("mx", max("cos").over(w))
      .filter(col("rnk") === 1 && col("cos") =!= col("mx"))
    assert(bad.isEmpty)
  }
}
