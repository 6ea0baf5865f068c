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

  test("patchKeys rejects malformed patches (duplicate old_id, null new_id)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dup = Seq((2L, 200L), (2L, 201L)).toDF("old_id", "new_id")
    val ex1 = intercept[IllegalArgumentException] {
      LoaderOps.patchKeys(df, "k", dup).collect()
    }
    assert(ex1.getMessage.contains("malformed patch"))
    val withNull = Seq((2L, Some(200L)), (1L, None))
      .toDF("old_id", "new_id")
    val ex2 = intercept[IllegalArgumentException] {
      LoaderOps.patchKeys(df, "k", withNull).collect()
    }
    assert(ex2.getMessage.contains("malformed patch"))
  }

  test("q_release_diff surfaces every change class, including added/removed datasets") {
    val rows = operators.ProvenanceOps.qReleaseDiff.fn(spark, SmallDir).collect()
      .map(r => r.getAs[String]("dataset") ->
        (r.getAs[Long]("rows_delta"), r.getAs[Boolean]("content_changed"),
          r.getAs[Boolean]("content_only_change"), r.getAs[String]("status")))
      .toMap
    assert(rows("src16")._4 == "added" && rows("src16")._1 > 0)
    assert(rows("src5")._4 == "removed" && rows("src5")._1 < 0)
    assert(rows("src8")._4 == "common" && rows("src8")._3, "content-only class missing")
    assert(rows("src6")._4 == "common" && !rows("src6")._2, "unchanged class missing")
    assert(rows.exists { case (_, (d, c, co, st)) => st == "common" && d < 0 && c && !co },
      "row-count-change class missing")
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

  test("q_hybrid_rrf: fused scores are consistent with the rank algebra") {
    val rows = SparkEntry.queries("q_hybrid_rrf")(spark, SmallDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (rl, rs) = (Option(r.get(1)).map(_.toString.toLong),
        Option(r.get(2)).map(_.toString.toLong))
      assert(rl.isDefined || rs.isDefined, s"doc in neither list: $r")
      val expect = rl.map(x => math.rint(1e6 / (60 + x)) / 1e6).getOrElse(0.0) +
        rs.map(x => math.rint(1e6 / (60 + x)) / 1e6).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-9,
        s"rrf score mismatch: got ${r.getDouble(3)} want $expect from ($rl, $rs)")
    }
    // fused order is by score desc — a doc present in BOTH lists at rank 1
    // would dominate; at minimum the list is sorted and positive
    val scores = rows.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse && scores.forall(_ > 0))
  }

  test("q_mmr_rerank: first pick is the most relevant; picks distinct; diversity bites") {
    val rows = SparkEntry.queries("q_mmr_rerank")(spark, SmallDir).collect()
    assert(rows.length == 10)
    val ids = rows.map(_.getLong(1)).toSeq
    assert(ids.distinct == ids, "duplicate picks")
    // rank 1 must be the relevance argmax (penalty is zero there)
    assert(rows.head.getDouble(3) == 0.0)
    val rels = rows.map(_.getDouble(2)).toSeq
    assert(rels.head == rels.max, "first pick not the most relevant")
    // diversity must actually bite: at least one later pick is NOT the
    // next-most-relevant candidate (otherwise MMR degenerated to top-k)
    assert(rels != rels.sorted.reverse || rows.map(_.getDouble(3)).exists(_ > 0),
      "MMR output identical to plain top-k with zero penalties — suspicious")
  }

  test("welch t-test: detects a real mean shift, stays silent on identical groups") {
    import spark.implicits._
    // groups A/B identical distribution; C shifted by +5 with same spread
    val rows =
      (1 to 300).map(i => (i.toLong, "A", 10.0 + (i % 7))) ++
      (1 to 300).map(i => (i + 1000L, "B", 10.0 + ((i + 3) % 7))) ++
      (1 to 300).map(i => (i + 2000L, "C", 15.0 + (i % 7)))
    val dir = java.nio.file.Files.createTempDirectory("graft_ab").toString
    rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("user_id", col("event_id"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = operators.Stats.qAbTest.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(5), r.getBoolean(7))).toMap
    assert(!m(("A", "B"))._2, s"A vs B falsely significant: ${m(("A", "B"))}")
    assert(m(("A", "C"))._2 && m(("B", "C"))._2, s"shift missed: $m")
    assert(math.abs(m(("A", "C"))._1) > math.abs(m(("A", "B"))._1))
  }

  test("rank-sum test: detects a median shift a heavy outlier hides from the t-test") {
    import spark.implicits._
    // A and B share a median-shifted core; A additionally carries one
    // huge outlier that inflates variance (the t-test killer)
    val rows =
      (1 to 200).map(i => (i.toLong, "A", 10.0 + (i % 5))) ++
      Seq((900L, "A", 100000.0)) ++
      (1 to 200).map(i => (i + 1000L, "B", 13.0 + (i % 5)))
    val dir = java.nio.file.Files.createTempDirectory("graft_rs").toString
    rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("user_id", col("event_id"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rs = operators.Stats.qRankSum.fn(spark, dir).collect().head
    assert(rs.getBoolean(7), s"rank-sum must flag the median shift: $rs")
    // Cliff's delta must point the same way as the shift (B > A core)
    assert(rs.getDouble(6) < -0.3, s"effect size should be strongly negative: $rs")
    val t = operators.Stats.qAbTest.fn(spark, dir).collect().head
    assert(!t.getBoolean(7),
      s"scenario broken: t-test should be blinded by the outlier, got $t")
  }

  test("BH correction rejects a subset of raw rejections, step-up rule exact") {
    val rows = SparkEntry.queries("q_fdr_correction")(spark, SmallDir).collect()
    assert(rows.length == 10, "5 event types -> 10 pairwise tests")
    val m = rows.length.toLong
    // reject_bh => reject_raw (BH threshold i*q/m <= q), and the step-up
    // rule: rejected ranks are exactly 1..kmax
    val bhRanks = rows.filter(_.getBoolean(7)).map(_.getLong(4)).sorted.toSeq
    rows.foreach { r =>
      if (r.getBoolean(7)) assert(r.getBoolean(6), s"BH rejected but raw not: $r")
      assert(math.abs(r.getDouble(5) - math.rint(0.05 * r.getLong(4) / m * 1e6) / 1e6) < 1e-9)
    }
    assert(bhRanks == (1L to bhRanks.length.toLong).toSeq,
      s"step-up rejections must be a prefix of the p-rank order: $bhRanks")
  }

  test("q_eval_ndcg: scores are in (0,1] and dcg <= idcg") {
    val rows = SparkEntry.queries("q_eval_ndcg")(spark, SmallDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(idcg > 0 && dcg >= 0 && dcg <= idcg + 1e-9, r.toString)
      assert(ndcg >= 0 && ndcg <= 1.0 + 1e-9, r.toString)
    }
    // a perfect-retrieval synthetic check: probes whose labels dominate
    // the corpus should not all score 0 (the ranking carries signal)
    assert(rows.map(_.getDouble(4)).sum > 0, "all-zero nDCG: no label signal")
  }
}
