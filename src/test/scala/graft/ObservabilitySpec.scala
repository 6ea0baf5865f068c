package graft

import graft.operators.Observability
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** obs_metrics: observe()-collected QC counters equal an independent
  * recompute over the persisted data — one scan, exact metrics. */
class ObservabilitySpec extends SparkSpec {

  test("observedWrite metrics match a recompute over the written files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_obs").toFile.getAbsolutePath
    val li = T.lineitem(spark, TinyDir)
      .select("l_orderkey", "l_extendedprice", "l_returnflag")
    val m = Observability.observedWrite(li, s"$dir/li", "l_orderkey", "l_extendedprice")
    val back = spark.read.parquet(s"$dir/li")
      .agg(count(lit(1)), min("l_extendedprice"), max("l_extendedprice"),
        sum(col("l_extendedprice").cast("decimal(38,6)")))
      .head()
    assert(m("n_rows") == back.getLong(0))
    assert(m("null_keys") == 0L && m("null_values") == 0L)
    assert(m("v_min") == back.getDouble(1))
    assert(m("v_max") == back.getDouble(2))
    assert(m("v_sum") == back.getDecimal(3))
  }

  test("observed() attaches metrics without changing the result") {
    val li = T.lineitem(spark, TinyDir).select("l_orderkey", "l_quantity")
    val (obsDf, obs) = Observability.observed(li,
      Seq(count(lit(1)).as("n"), sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("big")))
    val rows = obsDf.count()
    assert(rows == li.count())
    val m = obs.get
    assert(m("n") == rows)
    assert(m("big") == li.filter(col("l_quantity") > 25).count())
  }
}
