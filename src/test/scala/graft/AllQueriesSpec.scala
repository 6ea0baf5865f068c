package graft

/** Every SparkEntry query must execute end-to-end on sf0.001 — the cheap
  * in-repo twin of the driver's Verify gate. Catches a broken query at
  * `sbt test` time instead of at round scoring. */
class AllQueriesSpec extends SparkSpec {

  test("oracle map only names registered queries, all with column parity") {
    val qnames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
    assert(qnames.size >= 130)
  }

  SparkEntry.allQ.foreach { q =>
    test(s"${q.name} runs on sf0.001 and returns rows") {
      val df = q.fn(spark, TinyDir)
      val n = df.count()
      assert(n > 0, s"${q.name} returned no rows")
      assert(df.columns.nonEmpty)
    }
  }
}
