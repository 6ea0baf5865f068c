package graft

import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning posture (SURVEY.md §2.5 conf_dpp): a join
  * against a FILTERED dimension prunes the partitioned fact scan at
  * RUNTIME — the partition filter is the broadcast dim's key set, so the
  * fact side reads only the partitions the join can match. At 100 TB
  * with date/source-partitioned facts this is the difference between
  * scanning one partition and scanning the table; these tests pin that
  * the default-on behavior actually fires on our layouts (it depends on
  * a selective scan-side predicate and a reusable broadcast — both easy
  * to lose silently). */
class DppSpec extends SparkSpec {

  private lazy val dppDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp")
      .toFile.getAbsolutePath
    T.lineitem(spark, TinyDir)
      .write.partitionBy("l_returnflag").mode("overwrite")
      .parquet(s"$tmp/fact")
    import spark.implicits._
    Seq(("A", "accepted"), ("N", "new"), ("R", "returned"))
      .toDF("rf", "klass")
      .write.mode("overwrite").parquet(s"$tmp/dim")
    tmp
  }

  private def starJoin() = {
    val fact = spark.read.parquet(s"$dppDir/fact")
    val dim = spark.read.parquet(s"$dppDir/dim")
      .filter(col("klass") === "returned") // selective dim predicate
    fact.join(dim, col("l_returnflag") === col("rf"))
      .groupBy(col("rf"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
  }

  test("a filtered dim join prunes the partitioned fact scan at runtime") {
    val q = starJoin()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    // and pruning never changes the answer: equal to the static pushdown
    val result = q.collect()
    assert(result.length == 1 && result.head.getAs[String]("rf") == "R")
    val static = spark.read.parquet(s"$dppDir/fact")
      .filter(col("l_returnflag") === "R")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .collect().head
    assert(result.head.getAs[Long]("n") == static.getAs[Long]("n"))
    assert(result.head.getAs[Double]("qty") == static.getAs[Double]("qty"))
  }

  test("the conf is load-bearing: disabling DPP removes the runtime filter") {
    withConf("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
      val plan = starJoin().queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("dynamicpruning"),
        "DPP expression present with the optimization disabled — test premise broken")
    }
  }
}
