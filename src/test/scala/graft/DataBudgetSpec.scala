package graft

/** q_data_budget semantics (exact values oracle-pinned; this pins the
  * allocation's INVARIANTS): epochs are contiguous from 1, the budget is
  * never exceeded but is filled greedily, and marginal value ordering
  * holds — no granted candidate is worth less than a denied one. */
class DataBudgetSpec extends SparkSpec {

  test("budget respected, epochs contiguous, greedy marginal-value order") {
    val rows = SparkEntry.queries("q_data_budget")(spark, TinyDir).collect()
    assert(rows.nonEmpty)
    val uniq = rows.map(r => r.getLong(1)).sum
    val used = rows.map(r => r.getLong(3)).sum
    assert(used <= 2 * uniq, s"used $used over budget ${2 * uniq}")
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
    val leftover = 2 * uniq - used
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
