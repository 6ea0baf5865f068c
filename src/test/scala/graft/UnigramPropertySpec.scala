package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll

/** The unigram-LM trainer against an exact in-memory reference on random
  * corpora (the PropertySpec discipline): seed substring counts, the
  * per-word Viterbi (strict-> tie rule, earliest start wins), hard-EM
  * count re-estimation with the single-char floor, and the final
  * (count desc, token) top-30 — every float op replicated as the same
  * product of BIGINT→DOUBLE divisions, so the comparison is EXACT, not
  * approximate. Random small-alphabet corpora probe the tie-break and
  * prune edges the planted UnigramLmSpec cannot enumerate. */
class UnigramPropertySpec extends SparkSpec {

  private val (steps, maxSubLen, seedTopN, keepK, maxWordLen) = (2, 4, 80, 40, 24)

  private def refUnigram(texts: Seq[String]): Seq[(String, Long, Double)] = {
    val words: Map[String, Long] = texts
      .flatMap(_.split(" ", -1))
      .filter(w => w.length >= 1 && w.length <= maxWordLen)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    def topMulti(counts: Map[String, Long], k: Int): Seq[(String, Long)] =
      counts.filter(_._1.length > 1).toSeq
        .sortBy { case (t, n) => (-n, t) }.take(k)
    val seed: Map[String, Long] = words.toSeq
      .flatMap { case (w, c) =>
        for {
          j <- 0 until w.length
          l <- 1 to math.min(maxSubLen, w.length - j)
        } yield (w.substring(j, j + l), c)
      }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val singles0 = seed.filter(_._1.length == 1)
    var vocab: Map[String, Long] = singles0 ++ topMulti(seed, seedTopN)
    val alpha = singles0.keySet
    def viterbi(w: String, p: Map[String, Double]): Seq[String] = {
      val best = Array.fill(w.length + 1)(0.0)
      val toks = Array.fill(w.length + 1)(List.empty[String])
      best(0) = 1.0
      for (i <- 1 to w.length) {
        var set = false
        // j ascending = the HOF's (i, j) edge order: first in-vocab edge
        // appends, later edges replace only on a STRICTLY better score
        for (j <- math.max(0, i - maxSubLen) until i) {
          val sub = w.substring(j, i)
          p.get(sub).foreach { ps =>
            val cand = best(j) * ps
            if (!set || cand > best(i)) { best(i) = cand; toks(i) = sub :: toks(j); set = true }
          }
        }
      }
      toks(w.length).reverse
    }
    def eStep(v: Map[String, Long]): Map[String, Long] = {
      val total = v.values.sum
      val p = v.map { case (t, n) => t -> n.toDouble / total.toDouble }
      words.toSeq
        .flatMap { case (w, c) => viterbi(w, p).map(_ -> c) }
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    }
    for (_ <- 1 to steps) {
      val cnts = eStep(vocab)
      vocab = alpha.map(t => t -> math.max(cnts.getOrElse(t, 0L), 1L)).toMap ++
        topMulti(cnts, keepK)
    }
    val total = vocab.values.sum
    vocab.toSeq.sortBy { case (t, n) => (-n, t) }.take(30)
      .map { case (t, n) =>
        (t, n, java.math.BigDecimal.valueOf(n.toDouble / total.toDouble)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
      }
  }

  test("q_unigram_lm equals the in-memory hard-EM reference on random corpora") {
    import spark.implicits._
    val genWord = for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val genCorpus = for {
      nw <- Gen.choose(2, 5)
      pool <- Gen.listOfN(nw, genWord)
      nd <- Gen.choose(1, 3)
      docs <- Gen.listOfN(nd, for {
        k <- Gen.choose(1, 8)
        ws <- Gen.listOfN(k, Gen.oneOf(pool))
      } yield ws.mkString(" "))
    } yield docs
    val prop: Prop = forAll(genCorpus) { texts =>
      val dir = java.nio.file.Files.createTempDirectory("graft_uniprop").toString
      texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q_unigram_lm")(spark, dir)
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      val want = refUnigram(texts)
      if (got != want) println(s"corpus=$texts\n got=$got\nwant=$want")
      got == want
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
