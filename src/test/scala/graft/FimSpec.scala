package graft

/** q_fim semantics (exact values oracle-pinned; this pins the
  * transform's INVARIANTS): the three segments reconstruct the original
  * document exactly, the hash-rate selection sits near the 50% target,
  * and short docs pass through untransformed. */
class FimSpec extends SparkSpec {

  test("PSM segments reconstruct the source; rate ~50%; short docs pass through") {
    val docs = sources.Tables.documents(spark, TinyDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q_fim")(spark, TinyDir).collect()
    assert(rows.length == docs.size)
    val P = "<fim_prefix>"; val S = "<fim_suffix>"; val M = "<fim_middle>"
    var fimCount = 0
    rows.foreach { r =>
      val (id, fim, np, nm, ns, t) =
        (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
      val orig = docs(id)
      if (!fim) {
        assert(t == orig, s"doc $id: non-FIM must pass through")
        assert(np == 0 && nm == 0 && ns == 0)
      } else {
        fimCount += 1
        assert(t.startsWith(P))
        val body = t.stripPrefix(P)
        val si = body.indexOf(S); val mi = body.indexOf(M)
        assert(si >= 0 && mi > si, s"doc $id: sentinels out of order: $t")
        val prefix = body.substring(0, si)
        val suffix = body.substring(si + S.length, mi)
        val middle = body.substring(mi + M.length)
        assert(prefix + middle + suffix == orig,
          s"doc $id: segments must reconstruct the original")
        // q_fim counts CODE POINTS (Spark's length()); JVM String.length
        // is UTF-16 code units — they diverge on astral chars (ADVICE r13)
        def cp(s: String): Long = s.codePointCount(0, s.length).toLong
        assert(cp(prefix) == np && cp(middle) == nm && cp(suffix) == ns)
        assert(cp(orig) >= 20)
      }
    }
    val rate = fimCount.toDouble / rows.length
    assert(rate > 0.35 && rate < 0.65, s"FIM rate $rate far from the 50% target")
  }
}
