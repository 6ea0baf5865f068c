package graft

import graft.operators.ReleaseOps
import org.apache.spark.sql.Row

/** Multi-release ledger analytics (SURVEY.md §2 q_release_history /
  * q_rebuild_plan): the trajectory fold classifies every dataset, every
  * class the carve plants actually appears, and the rebuild planner can
  * prove a NO-rebuild — not just flag everything. */
class ReleaseOpsSpec extends SparkSpec {

  private lazy val history: Map[String, Row] =
    ReleaseOps.qReleaseHistory.fn(spark, SmallDir).collect()
      .map(r => r.getAs[String]("dataset") -> r).toMap

  test("every planted trajectory class appears at sf0.01") {
    val classes = history.values.map(_.getAs[String]("klass")).toSet
    val expected = Set("stable", "shrinking", "growing", "content_churn",
      "late_added", "intermittent")
    assert(expected.subsetOf(classes),
      s"missing classes: ${expected -- classes} (got $classes)")
  }

  test("known datasets land in their planted class") {
    // src1 is dropped exactly at release 1 (si == r) then returns: a gap
    assert(history("src1").getAs[String]("klass") == "intermittent")
    assert(history("src1").getAs[Long]("n_gaps") == 1L)
    // src0 joins at r=1 (dropped only at r=0, an absent PREFIX, not a gap)
    assert(history("src0").getAs[String]("klass") == "late_added")
    assert(history("src0").getAs[Int]("first_r") == 1)
    assert(history("src0").getAs[Long]("n_gaps") == 0L)
    // src3: odd (row-stable), si%3==0 (content rewritten each release) —
    // the fingerprint-only churn class a row-count ledger cannot see
    val s3 = history("src3")
    assert(s3.getAs[String]("klass") == "content_churn")
    assert(s3.getAs[Long]("n_row_changes") == 0L)
    assert(s3.getAs[Long]("n_content_only") > 0L)
    // src4 (even) loses a doc_id%7 stratum per release; src9 gains one
    assert(history("src4").getAs[String]("klass") == "shrinking")
    assert(history("src4").getAs[Long]("net_delta") < 0L)
    assert(history("src9").getAs[String]("klass") == "growing")
    // src5: odd, no grow rule, si%3!=0, never dropped — fully quiet
    assert(history("src5").getAs[String]("klass") == "stable")
    // late adds appear exactly when presence admits them (si < 14+2r)
    assert(history("src16").getAs[Int]("first_r") == 2)
    assert(history("src19").getAs[Int]("first_r") == 3)
  }

  test("trajectory invariants hold for every dataset") {
    history.values.foreach { r =>
      val present = r.getAs[Long]("n_present")
      assert(present >= 1L && present <= 4L)
      val first = r.getAs[Int]("first_r"); val last = r.getAs[Int]("last_r")
      assert(first <= last)
      // transitions counted never exceed adjacent-present pairs
      val transitions = r.getAs[Long]("n_row_changes") +
        r.getAs[Long]("n_content_only")
      assert(transitions <= present - 1,
        s"${r.getAs[String]("dataset")}: $transitions transitions, $present present")
    }
  }

  test("rebuild planner: exact reasons, and art_idle proves a no-rebuild") {
    val plan = ReleaseOps.qRebuildPlan.fn(spark, SmallDir).collect()
      .map(r => r.getAs[String]("artifact") -> r).toMap
    // src6/src7 are untouched by the diff carve → no rebuild, empty reasons
    val idle = plan("art_idle")
    assert(!idle.getAs[Boolean]("rebuild"))
    assert(idle.getAs[Long]("n_changed") == 0L)
    assert(idle.getAs[String]("reasons") == "")
    // art_core depends on src16 which exists only in the NEW release
    val core = plan("art_core")
    assert(core.getAs[Boolean]("rebuild"))
    assert(core.getAs[String]("reasons").contains("src16:added"))
    // art_stats depends on src5 which the new release dropped
    assert(plan("art_stats").getAs[String]("reasons").contains("src5:removed"))
    // art_search: src8/src9 get the text tweak → content or rows, never 'added'
    val search = plan("art_search")
    assert(search.getAs[Boolean]("rebuild"))
    assert(!search.getAs[String]("reasons").contains("added"))
    // reasons are sorted and only name actual dependencies
    plan.values.foreach { r =>
      val reasons = r.getAs[String]("reasons")
      if (reasons.nonEmpty) {
        val entries = reasons.split(",").toSeq
        assert(entries == entries.sorted, s"unsorted reasons: $reasons")
        assert(entries.size == r.getAs[Long]("n_changed"))
      }
    }
  }
}
