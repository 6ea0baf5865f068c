package graft

import graft.sources.{Buckets, Tables}
import org.apache.spark.sql.functions._

/** The bucketed layout's whole point is plan shape: a join of two
  * same-bucketed tables must run with ZERO exchanges. Assert that, plus
  * result equivalence to the plain (shuffling) join. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with no exchange and matches the plain join") {
    val dir = java.nio.file.Files.createTempDirectory("bucketed").toString
    val li = Tables.lineitem(spark, SmallDir)
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val ord = Tables.orders(spark, SmallDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
    Buckets.writeBucketedExternal(li, "li_b", s"$dir/li", "l_orderkey", 8)
    Buckets.writeBucketedExternal(ord, "ord_b", s"$dir/ord", "l_orderkey", 8)
    try {
      // forbid broadcast so the planner's only shuffle-free option is the
      // bucket-colocated sort-merge join
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val j = Buckets.bucketJoin(spark, "li_b", "ord_b", "l_orderkey")
        val n = j.count()
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
        val plain = li.join(ord, "l_orderkey").count()
        assert(n == plain, s"bucketed=$n plain=$plain")
      }
      // aggregation on the bucket key also rides the layout: no exchange
      // before the partial/final aggregate pair collapses into one stage
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val agg = spark.table("li_b").groupBy("l_orderkey")
          .agg(sum("l_extendedprice").as("s"))
        agg.count()
        val plan = agg.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucket-key aggregation shuffled:\n$plan")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val dir = java.nio.file.Files.createTempDirectory("bucketed2").toString
    val li = Tables.lineitem(spark, TinyDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, TinyDir)
      .select(col("o_orderkey").as("l_orderkey"))
    Buckets.writeBucketedExternal(li, "li_b4", s"$dir/li", "l_orderkey", 4)
    Buckets.writeBucketedExternal(ord, "ord_b2", s"$dir/ord", "l_orderkey", 2)
    try {
      val j = Buckets.bucketJoin(spark, "li_b4", "ord_b2", "l_orderkey")
      assert(j.count() == li.join(ord, "l_orderkey").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b4")
      spark.sql("DROP TABLE IF EXISTS ord_b2")
    }
  }
}
