package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

/** q_bootstrap_ci semantic pins: the CI brackets the point estimate,
  * narrows with sample size, and the md5-derived Poisson weights make the
  * whole computation a pure function of the data (determinism is swept
  * globally by DeterminismSpec; the oracle gate hash-matches DuckDB). */
class BootstrapSpec extends SparkSpec {

  test("bootstrap CI brackets the mean and narrows with n") {
    import spark.implicits._
    // one source with 60 docs, one with 600 — same value distribution
    val docs = ((1 to 60).map(i => (i.toLong, "small", 100L + i % 50)) ++
      (1001 to 1600).map(i => (i.toLong, "large", 100L + i % 50)))
      .toDF("doc_id", "source", "n_chars")
      .withColumn("text", lit("x")) // schema parity; text unused here
    val out = bootstrapOn(docs)
    val m = out.collect().map(r => r.getString(0) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    for ((src, (mean, lo, hi)) <- m) {
      assert(lo < hi, s"$src: degenerate CI [$lo, $hi]")
      assert(lo <= mean && mean <= hi, s"$src: mean $mean outside CI [$lo, $hi]")
    }
    val widthSmall = m("small")._3 - m("small")._2
    val widthLarge = m("large")._3 - m("large")._2
    assert(widthLarge < widthSmall,
      s"CI must narrow with n: large=$widthLarge small=$widthSmall")
  }

  test("a 1-doc source still gets a non-null degenerate CI (lo == hi == mean)") {
    import spark.implicits._
    val docs = Seq((1L, "tiny", 500L)).toDF("doc_id", "source", "n_chars")
      .withColumn("text", lit("x"))
    val r = bootstrapOn(docs).collect().head
    assert(!r.isNullAt(3) && !r.isNullAt(4), s"null CI bound: $r")
    assert(r.getDouble(3) == 500.0 && r.getDouble(4) == 500.0 &&
      r.getDouble(2) == 500.0, r.toString)
  }

  test("q_bootstrap_ci runs on the corpus with sane rows") {
    val out = Stats.qBootstrapCi.fn(spark, TinyDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(4), s"ci_lo > ci_hi in $r")
    }
  }

  /** Run the same pipeline as q_bootstrap_ci but over an in-memory docs
    * frame (source/doc_id/n_chars), via a temp parquet dir. */
  private def bootstrapOn(docs: org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_boot").toString
    docs.select("doc_id", "text", "source", "n_chars")
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Stats.qBootstrapCi.fn(spark, dir)
  }
}
