package graft

/** q_unimax waterfilling semantics on a planted SKEWED corpus — the bench
  * corpus's 20 uniform sources never trigger the epoch cap (oracle still
  * pins the arithmetic there); capping is the operator's point, so it is
  * exercised here against an independent reference loop. */
class UnimaxSpec extends SparkSpec {

  // sources with wildly different supplies: tiny ones must cap at 4 epochs
  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_unimax").toString
    import spark.implicits._
    // src0: 2 tokens; src1: 10; src2: 100; src3: 1000 (one doc each)
    val rows = Seq(
      (0L, "a b", "en", "src0", 3L),
      (1L, Seq.fill(10)("w").mkString(" "), "en", "src1", 19L),
      (2L, Seq.fill(100)("w").mkString(" "), "en", "src2", 199L),
      (3L, Seq.fill(1000)("w").mkString(" "), "en", "src3", 1999L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("skewed supplies: small sources cap at 4 epochs, residual spreads over the rest") {
    val out = SparkEntry.queries("q_unimax")(spark, plantedDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    // reference waterfilling loop (ascending capacity)
    val supplies = Map("src0" -> 2L, "src1" -> 10L, "src2" -> 100L, "src3" -> 1000L)
    val budget = supplies.values.sum / 2 // 556
    var remaining = budget
    var left = supplies.size
    val want = scala.collection.mutable.Map[String, Long]()
    supplies.toSeq.sortBy { case (s, n) => (4 * n, s) }.foreach { case (src, n) =>
      val share = remaining / left
      val a = math.min(4 * n, share)
      want(src) = a; remaining -= a; left -= 1
    }
    out.foreach { case (src, (supply, cap, alloc, capped)) =>
      assert(supply == supplies(src) && cap == 4 * supply)
      assert(alloc == want(src), s"$src: allocated $alloc, reference loop says ${want(src)}")
      assert((capped == 1) == (alloc == cap), s"$src: capped flag inconsistent")
    }
    // the point of the planted skew: at least one capped, at least one not
    assert(out.values.exists(_._4 == 1), "no source capped — the skew failed to bite")
    assert(out.values.exists(_._4 == 0), "all sources capped")
  }

  test("uniform corpus: allocations are budget-exhaustive up to flooring, never above cap") {
    val out = SparkEntry.queries("q_unimax")(spark, TinyDir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val budget = out.map(_._1).sum / 2
    val total = out.map(_._3).sum
    assert(out.forall { case (_, cap, a) => a <= cap })
    // floor() loses < N tokens
    assert(total <= budget && budget - total < out.length,
      s"allocated $total of $budget with ${out.length} sources")
  }
}
