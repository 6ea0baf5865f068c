package graft

import org.apache.spark.sql.functions._

/** q_dedup_substr (ExactSubstr profile) semantics on a planted corpus —
  * exact values on the real corpus are oracle-pinned. */
class DedupSubstrSpec extends SparkSpec {

  private val L = 50

  private def planted(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_substr").toString
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a shared >=L-byte substring is found in both docs as one maximal span") {
    val shared = ("x" * 31) + "the quick brown fox jumps over the lazy dog again" // 80 bytes
    assert(shared.length == 80)
    val a = "AAAA-" + shared + "!TAIL-A unique ending one"
    val b = "BBBBBBBB_" + shared + "=other tail entirely different"
    val c = "no repeats here at all, completely unique text " + ("z" * 60)
    val out = SparkEntry.queries("q_dedup_substr")(spark, planted(Seq(1L -> a, 2L -> b, 3L -> c)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // windows of the 80-byte shared run: 80-L+1 = 31 per doc, all merged: span = 80 bytes
    assert(out(1L)._1 == 1 && out(1L)._2 == 80, s"doc 1 got ${out(1L)}")
    assert(out(2L)._1 == 1 && out(2L)._2 == 80, s"doc 2 got ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 0.0)), s"unique doc got ${out(3L)}")
  }

  test("full duplicates report the whole document as one repeated span") {
    val t = "identical documents are the degenerate case of exact substring dedup " + ("y" * 40)
    val out = SparkEntry.queries("q_dedup_substr")(spark, planted(Seq(1L -> t, 2L -> t)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    Seq(1L, 2L).foreach { id =>
      assert(out(id)._1 == 1 && out(id)._2 == t.length && out(id)._3 == 1.0, s"doc $id: ${out(id)}")
    }
  }

  test("two disjoint shared runs separated by > L unique bytes stay two spans") {
    val r1 = "first shared run of text long enough to cross the L" // 52
    val r2 = "second shared run also long enough to cross the Lxx" // 52
    assert(r1.length >= L && r2.length >= L)
    val gapA = " " + ("a" * 60) + " "
    val gapB = " " + ("b" * 60) + " "
    val out = SparkEntry.queries("q_dedup_substr")(
        spark, planted(Seq(1L -> (r1 + gapA + r2), 2L -> (r2 + gapB + r1))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2 && out(2L) == 2, s"expected 2 spans each, got $out")
  }
}
