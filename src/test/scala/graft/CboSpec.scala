package graft

import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** Cost-based-optimization posture (SURVEY.md §2.5 conf_cbo_stats): the
  * engine's answer to "how does a 1000-executor plan stop guessing" is
  * ANALYZE TABLE after each load (catalog row counts + column NDV/
  * min/max/histograms) with `spark.sql.cbo.enabled` — estimates then
  * propagate through filters and joins instead of falling back to file
  * sizes. These tests pin that the propagation actually happens. */
class CboSpec extends SparkSpec {

  /** Drop a managed table AND its on-disk warehouse location. DROP TABLE
    * alone is not idempotent across crashed runs: a prior JVM that died
    * after writing files but before (or without) registering the table in
    * this run's fresh in-memory catalog leaves an orphan directory, and
    * the next CREATE fails with LOCATION_ALREADY_EXISTS. */
  private def dropManaged(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(wh, name)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(loc)
    }
  }

  test("ANALYZE TABLE gives the optimizer exact row counts and filtered-join estimates") {
    dropManaged("cbo_li")
    dropManaged("cbo_supp")
    T.lineitem(spark, TinyDir).select("l_orderkey", "l_suppkey", "l_quantity")
      .write.saveAsTable("cbo_li")
    T.supplier(spark, TinyDir).select("s_suppkey", "s_nationkey")
      .write.saveAsTable("cbo_supp")
    val actual = spark.table("cbo_li").count()
    spark.sql("ANALYZE TABLE cbo_li COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE cbo_supp COMPUTE STATISTICS FOR ALL COLUMNS")
    withConf("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      // exact table cardinality reaches the plan
      val scanStats = spark.table("cbo_li").queryExecution.optimizedPlan.stats
      assert(scanStats.rowCount.contains(BigInt(actual)),
        s"catalog rowCount ${scanStats.rowCount} != $actual")
      // estimates survive a filter + join instead of degrading to None
      val q = spark.table("cbo_li")
        .filter(col("l_quantity") > 25)
        .join(spark.table("cbo_supp"),
          col("l_suppkey") === col("s_suppkey"))
      val st = q.queryExecution.optimizedPlan.stats
      assert(st.rowCount.isDefined, "join estimate lost row count under CBO")
      assert(st.rowCount.get > 0 && st.rowCount.get <= BigInt(actual) * 2,
        s"implausible join estimate ${st.rowCount}")
      // the filter's selectivity was actually applied (estimate strictly
      // below the unfiltered join's)
      val unfiltered = spark.table("cbo_li")
        .join(spark.table("cbo_supp"), col("l_suppkey") === col("s_suppkey"))
        .queryExecution.optimizedPlan.stats
      assert(st.rowCount.get < unfiltered.rowCount.get,
        s"filter selectivity ignored: ${st.rowCount} vs ${unfiltered.rowCount}")
    }
  }

  test("without ANALYZE the same plan has no row-count estimate (the posture is load-bearing)") {
    dropManaged("cbo_raw")
    T.supplier(spark, TinyDir).select("s_suppkey", "s_nationkey")
      .write.saveAsTable("cbo_raw")
    withConf("spark.sql.cbo.enabled" -> "true") {
      val st = spark.table("cbo_raw").filter(col("s_nationkey") > 5)
        .queryExecution.optimizedPlan.stats
      assert(st.rowCount.isEmpty,
        s"unexpected rowCount ${st.rowCount} without stats — test premise broken")
    }
  }
}
