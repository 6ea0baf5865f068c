package graft

import graft.functions.RollingHash
import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {

  /** Reference: direct polynomial hash of each substring, no rolling. */
  private def direct(s: String, n: Int): Array[Long] = {
    val b = s.getBytes("UTF-8")
    (0 to b.length - n).map { i =>
      var h = 0L
      for (j <- i until i + n) h = h * 1000003L + (b(j) & 0xffL)
      h
    }.toArray
  }

  test("rolling hash equals direct substring hashing") {
    import spark.implicits._
    val samples = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaa", "abc", "", "unicode: héllo wörld ünïcode")
    val df = samples.toDF("t")
    for (n <- Seq(3, 8, 16)) {
      val got = df.select(RollingHash(col("t"), n)).collect()
        .map(_.getSeq[Long](0).toArray)
      samples.zip(got).foreach { case (s, arr) =>
        assert(arr.sameElements(direct(s, n)), s"mismatch for '$s' n=$n")
      }
    }
  }

  test("identical substrings produce identical window hashes") {
    import spark.implicits._
    val df = Seq("xxjump over the fencexx", "yyyjump over the fenceyy").toDF("t")
    val sets = df.select(RollingHash(col("t"), 10)).collect()
      .map(_.getSeq[Long](0).toSet)
    assert(sets(0).intersect(sets(1)).size >= 5) // shared middle text
  }

  test("winnowed fingerprints find the planted near-dup docs as candidates") {
    val nearDups = Dedup.qDedupNgram.fn(spark, TinyDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fps = TextAnalysis.winnowedFingerprints(
      graft.sources.Tables.documents(spark, TinyDir), "doc_id", "text", 16, 8)
    val a = fps.select(col("id").as("id_a"), col("fp"))
    val b = fps.select(col("id").as("id_b"), col("fp"))
    val cands = a.join(b, Seq("fp")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (nearDups.isEmpty) 1.0
      else nearDups.intersect(cands).size.toDouble / nearDups.size
    assert(recall >= 0.9, s"winnow recall $recall over ${nearDups.size} pairs")
  }
}
