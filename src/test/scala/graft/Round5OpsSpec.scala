package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-5 operators, beyond the DuckDB hash
  * match: skyline dominance laws, autocomplete shape, PSI non-negativity,
  * transition-matrix stochasticity. */
class Round5OpsSpec extends SparkSpec {

  test("skyline: mutually non-dominating, and every other part is dominated") {
    val parts = graft.sources.Tables.part(spark, TinyDir)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val sky = operators.Analytics2.qSkyline.fn(spark, TinyDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominates(a: (Long, Double, Int), b: (Long, Double, Int)): Boolean =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    assert(sky.nonEmpty)
    for (a <- sky; b <- sky) assert(!dominates(a, b), s"$a dominates $b inside the skyline")
    val skySet = sky.map(_._1).toSet
    for (p <- parts if !skySet(p._1))
      assert(sky.exists(s => dominates(s, p)), s"$p survives outside the skyline")
  }

  test("autocomplete: <=3 completions per prefix, each extending its prefix, ranked by count") {
    val rows = operators.Analytics2.qAutocomplete.fn(spark, TinyDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (p, tok, _, rn) =>
      assert(tok.startsWith(p)); assert(rn >= 1 && rn <= 3)
    }
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to g.size).toSeq)
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sortBy(-_).toSeq)
    }
  }

  test("dist drift: psi >= 0 and n_langs bounded by the corpus language count") {
    val nLangs = graft.sources.Tables.documents(spark, TinyDir)
      .select("lang").distinct().count()
    val rows = operators.Analytics2.qDistDrift.fn(spark, TinyDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0, s"PSI must be non-negative: $r")
      assert(r.getLong(1) <= nLangs)
    }
  }

  test("event transitions: rows are a stochastic matrix and count all in-session steps") {
    val t = operators.Analytics2.qEventTransitions.fn(spark, TinyDir)
    val probSums = t.groupBy("cur").agg(sum(col("prob")).as("p")).collect()
    probSums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4,
      s"P(.|${r.getString(0)}) sums to ${r.getDouble(1)}"))
    val totalSteps = t.agg(sum(col("cnt"))).collect()(0).getLong(0)
    val expected = graft.sources.Tables.events(spark, TinyDir)
      .groupBy("user_id").count()
      .agg(sum(col("count") - 1)).collect()(0).getLong(0)
    assert(totalSteps == expected)
  }
}
