package graft

import org.apache.spark.sql.functions._

/** q_dsir semantics (exact values are oracle-pinned; this pins the
  * method's DISCRIMINATIVE behavior on a planted corpus). */
class DsirSpec extends SparkSpec {

  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    import spark.implicits._
    // even sources = target domain (the query's stand-in rule). Target text
    // is "alpha"-flavored; raw pool is "zeta"-flavored; doc 100 is a raw
    // doc written in the target's vocabulary, doc 101 a deeply raw one.
    val target = (0 until 8).map(i => (i.toLong * 2, s"alpha beta gamma alpha beta delta alpha beta", "en", s"src${i * 2}", 40L))
    val raw = (0 until 8).map(i => (i.toLong * 2 + 1, s"zeta eta theta zeta eta iota zeta eta", "en", s"src${i * 2 + 1}", 38L))
    val probes = Seq(
      (100L, "alpha beta gamma alpha beta delta", "en", "src1", 33L),
      (101L, "zeta eta theta zeta eta iota", "en", "src3", 28L))
    (target ++ raw ++ probes).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a raw doc in the target's vocabulary outscores one in the pool's; selection follows") {
    val out = SparkEntry.queries("q_dsir")(spark, plantedDir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    val (wTargetish, selTargetish) = out(100L)
    val (wRawish, selRawish) = out(101L)
    assert(wTargetish > wRawish,
      s"target-vocabulary doc scored $wTargetish <= raw-vocabulary doc $wRawish")
    assert(selTargetish == 1, "target-vocabulary raw doc must be selected")
    assert(selRawish == 0, "pool-vocabulary raw doc must not be selected")
  }

  test("n_grams is tokens-1 for every real-corpus doc; every doc is scored") {
    val out = SparkEntry.queries("q_dsir")(spark, TinyDir).collect()
    val toks = graft.sources.Tables.documents(spark, TinyDir)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("want"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.length == toks.size)
    out.foreach(r => assert(r.getLong(1) == toks(r.getLong(0)),
      s"doc ${r.getLong(0)}: n_grams ${r.getLong(1)} != ${toks(r.getLong(0))}"))
  }
}
