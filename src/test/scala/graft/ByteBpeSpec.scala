package graft

import graft.ops.PipelineOps2
import org.apache.spark.sql.functions._

/** q_bpe_bytes semantics (exact values oracle-pinned; this pins the
  * METHOD on mixed-script text, where byte-level is the point). */
class ByteBpeSpec extends SparkSpec {

  /** Reference byte-BPE: greedy rounds over hex-byte symbols. */
  private def refByteBpe(wordCnt: Seq[(String, Long)], steps: Int)
      : (Seq[(Int, String, String, String, Long)], Seq[(Vector[String], Long)]) = {
    def hexSyms(w: String): Vector[String] =
      w.getBytes("UTF-8").toVector.map(b => f"${b & 0xff}%02X")
    var syms: Seq[(Vector[String], Long)] = wordCnt.map { case (w, c) => (hexSyms(w), c) }
    val merges = (1 to steps).flatMap { step =>
      val pairCounts = syms.flatMap { case (ss, c) => ss.zip(ss.tail).map(p => (p, c)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairCounts.isEmpty) None
      else {
        val ((l, r), c) = pairCounts.toSeq.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        syms = syms.map { case (ss, cnt) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) { out += (l + r); i += 2 }
            else { out += ss(i); i += 1 }
          }
          (out.result(), cnt)
        }
        Some((step, l, r, l + r, c))
      }
    }
    (merges, syms)
  }

  private def wordCounts(dir: String): Seq[(String, Long)] =
    sources.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq

  test("merge table equals reference byte-BPE on the bench corpus") {
    val got = SparkEntry.queries("q_bpe_bytes")(spark, TinyDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val (expected, _) = refByteBpe(wordCounts(TinyDir), 3)
    assert(got.toSeq == expected, s"got=${got.toSeq} expected=$expected")
  }

  test("mixed-script corpus: byte merges cross multi-byte char boundaries, nothing degrades to OOV") {
    import spark.implicits._
    // CJK (3-byte chars, no useful whitespace split), accented Latin and
    // emoji — the corpus the char-level family degrades on
    val docs = Seq(
      (0L, "日本語 日本語 日本語 テスト", "ja", "s0"),
      (1L, "日本語のテキスト 日本語のテキスト", "ja", "s0"),
      (2L, "café café café crème brûlée", "fr", "s1"),
      (3L, "🚀🚀🚀 emoji 🚀🚀 mix", "en", "s1"),
      (4L, "Ω Ω Ω plain mix café", "el", "s2"))
      .map { case (i, t, l, s) => (i, t, l, s, t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft_bytebpe").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q_bpe_bytes")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val (expected, finalSyms) = refByteBpe(wordCounts(dir), 3)
    assert(got.toSeq == expected, s"got=${got.toSeq} expected=$expected")
    // the top merge must be an intra-character byte pair (日 = E6 97 A5
    // dominates): byte-level merges cross what chars can't express
    assert(got.head._2.length == 2 && got.head._3.length == 2,
      "first merge must join two base bytes")
    // byte fallback: every word reconstructs exactly from its merged
    // symbols' bytes — no OOV, any script
    val words = wordCounts(dir).map(_._1)
    val rebuilt = refByteBpe(words.map(_ -> 1L), 3)._2.map { case (ss, _) =>
      val bytes = ss.flatMap(s => s.grouped(2).map(Integer.parseInt(_, 16).toByte))
      new String(bytes.toArray, "UTF-8")
    }
    assert(rebuilt == words, "every word must reconstruct from its byte tokens")

    // and the tokenize leg agrees with the local replay end-to-end
    val gotTok = SparkEntry.queries("q_bpe_bytes_tokenize")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val wantTok = refByteBpe(wordCounts(dir), 3)._2
      .flatMap { case (ss, c) => ss.map(_ -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(20)
    assert(gotTok.toSeq == wantTok, s"got=${gotTok.toSeq} want=$wantTok")
  }

  test("pre-tokenizer: contractions split, leading space rides with the word, digits separate") {
    import spark.implicits._
    val texts = Seq(
      "The fox's 42 jumps, isn't it?  ok",
      "it'll we've I'm you're don't",
      "café 3.14 naïve")
    val got = texts.toDF("text").select(
        regexp_extract_all(col("text"), lit(PipelineOps2.preTokPattern), lit(0)).as("t"))
      .collect().map(_.getSeq[String](0).toList)
    // reference: the same pattern through plain Java regex — the Spark
    // side must be a pure regexp_extract_all with no extra semantics
    val p = java.util.regex.Pattern.compile(PipelineOps2.preTokPattern)
    val want = texts.map { t =>
      val m = p.matcher(t); val b = List.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }
    assert(got.toList == want, s"got=$got want=$want")
    // the GPT-2 conventions the whitespace splitter destroys:
    assert(got.head.contains("'s"), "contraction must be its own token")
    assert(got.head.contains(" quick") || got.head.contains(" fox"),
      "word-initial space must ride with the word")
    assert(got.head.contains(" 42"), "digit runs split from letters")
    assert(got(1) == List("it", "'ll", " we", "'ve", " I", "'m", " you", "'re", " don", "'t"))
  }

  test("base alphabet is bounded by 256 byte symbols (char-level is unbounded on CJK)") {
    import spark.implicits._
    val docs = Seq((0L, "日本語のテキストを処理する分散エンジン", "ja", "s0"))
      .map { case (i, t, l, s) => (i, t, l, s, t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft_bytebpe2").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val syms = wordCounts(dir).flatMap { case (w, _) =>
      w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X")
    }.toSet
    assert(syms.forall(s => s.length == 2 && s.forall("0123456789ABCDEF".contains(_))))
    assert(syms.size <= 256)
  }
}
