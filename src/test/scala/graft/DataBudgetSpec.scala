package graft

/** q_data_budget semantics (exact values oracle-pinned; this pins the
  * allocation's INVARIANTS): epochs are contiguous from 1, the budget is
  * never exceeded but is filled greedily, and marginal value ordering
  * holds — no granted candidate is worth less than a denied one. */
class DataBudgetSpec extends SparkSpec {

  test("budget respected, epochs contiguous, greedy marginal-value order") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_data_budget")(spark, TinyDir).collect()
    assert(rows.nonEmpty)
    // the budget base is 2x the tokens of ALL sources (from the documents
    // table) — summing unique_tokens over OUTPUT rows understates it when
    // a source's epoch-1 candidate falls past the greedy cut and the
    // source is absent from the output entirely (ADVICE r13)
    val allTokens = sources.Tables.documents(spark, TinyDir)
      .agg(sum(size(split(col("text"), " "))).cast("long")).collect()(0).getLong(0)
    val budget = 2 * allTokens
    val uniq = rows.map(r => r.getLong(1)).sum
    assert(uniq <= allTokens, "output sources are a subset of the corpus")
    val used = rows.map(r => r.getLong(3)).sum
    assert(used <= budget, s"used $used over budget $budget")
    rows.foreach { r =>
      val (n, e, usedS, eff) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(e >= 1 && e <= 8)
      assert(usedS == e * n, "cost is whole epochs")
      val wantEff = (0 until e.toInt).map(k => n.toDouble * math.pow(0.5, k)).sum
      assert(math.abs(eff - wantEff) < 1e-6, s"effective tokens $eff != $wantEff")
    }
    // greedy exchange property: the cheapest granted marginal value is
    // >= the most valuable DENIED next epoch of any source whose next
    // epoch would still have fit the leftover budget
    val minGranted = rows.map { r =>
      r.getLong(1).toDouble * math.pow(0.5, r.getLong(2).toDouble - 1)
    }.min
    val leftover = budget - used
    rows.foreach { r =>
      val (n, e) = (r.getLong(1), r.getLong(2))
      if (e < 8 && n <= leftover) {
        val nextVal = n.toDouble * math.pow(0.5, e.toDouble)
        assert(nextVal <= minGranted + 1e-9,
          s"denied epoch of value $nextVal fits the budget but a cheaper " +
            s"grant $minGranted was made — not greedy")
      }
    }
  }
}
