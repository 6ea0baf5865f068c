package graft

import graft.operators.LoaderOps
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

class Round7OpsSpec extends SparkSpec {

  test("patchKeys remaps exactly the patched keys, leaves the rest") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val patch = Seq((2L, 200L)).toDF("old_id", "new_id")
    val got = LoaderOps.patchKeys(df, "k", patch)
      .orderBy("v").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (200L, "b"), (3L, "c")))
  }

  test("q_id_remediate: the patch closes every drift orphan") {
    val m = operators.LoaderOps.qIdRemediate.fn(spark, SmallDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("patch_size") >= 1L, s"degenerate scenario: $m")
    // every order referencing a migrated key is an orphan before the patch
    // and exactly those rows get remapped — after the patch, zero orphans
    assert(m("orphans_before") == m("patched_fact_rows"), m.toString)
    assert(m("patched_fact_rows") >= 1L, s"scenario has no drifted facts: $m")
    assert(m("orphans_after") == 0L, m.toString)
  }

  test("remediateTracked: patched snapshot persisted, ledger row recorded, FK re-verified") {
    val dir = java.nio.file.Files.createTempDirectory("graft_remediate").toFile.getAbsolutePath
    val cust = T.customer(spark, TinyDir)
    val patch = cust.filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("old_id"), (col("c_custkey") + 1000000L).as("new_id"))
    val dimNew = cust.select(
      when(col("c_custkey") % 97 === 0, col("c_custkey") + 1000000L)
        .otherwise(col("c_custkey")).as("c_custkey"))
    val audit = LoaderOps.remediateTracked(
      T.orders(spark, TinyDir), "o_custkey", dimNew, "c_custkey", patch,
      outPath = s"$dir/orders_patched", provDir = s"$dir/prov",
      loadedAtUs = 7L, source = "update_geneids_r7")
    assert(audit("orphans_after") == 0L, audit.toString)
    assert(audit("patch_size") >= 1L)
    // the persisted snapshot carries the new ids
    val persisted = spark.read.parquet(s"$dir/orders_patched")
    assert(persisted.count() == T.orders(spark, TinyDir).count())
    assert(persisted.filter(col("o_custkey") >= 1000000L).count() ==
      audit("patched_fact_rows"))
    // ledger: one row, caller-supplied batch time, right row count
    val prov = spark.read.parquet(s"$dir/prov").collect()
    assert(prov.length == 1)
    assert(prov.head.getAs[String]("dataset") == "remediated:o_custkey")
    assert(prov.head.getAs[String]("source") == "update_geneids_r7")
    assert(prov.head.getAs[Long]("loaded_at_us") == 7L)
    assert(prov.head.getAs[Long]("n_rows") == persisted.count())
  }

  test("SURVEY §2 and SparkEntry.queries stay in sync (the coverage contract)") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val start = text.indexOf("## §2")
    val end = text.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md §2/§3 markers missing")
    val s2 = text.substring(start, end)
    val keys = SparkEntry.queries.keySet
    val missingRows = keys.filterNot(s2.contains)
    assert(missingRows.isEmpty,
      s"queries with no SURVEY §2 row: ${missingRows.toSeq.sorted.mkString(", ")}")
    val mentioned = "\\bq_[a-z0-9_]+".r.findAllIn(s2).toSet
    val phantom = mentioned -- keys
    assert(phantom.isEmpty,
      s"SURVEY §2 names queries that don't exist: ${phantom.toSeq.sorted.mkString(", ")}")
  }
}
