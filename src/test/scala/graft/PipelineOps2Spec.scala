package graft

import graft.ops.{PipelineOps2, Similarity}
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** Invariants for the round-6 session-2 pipeline operators:
  * boilerplate-strip reconstruction, SemDeDup decision completeness,
  * BPE merge-table equivalence vs a reference implementation. */
class PipelineOps2Spec extends SparkSpec {

  test("q_span_extents: pair set matches q_span_dup; extents cover at least the grams") {
    val dup = SparkEntry.queries("q_span_dup")(spark, TinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ext = SparkEntry.queries("q_span_extents")(spark, TinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(ext.keySet == dup.keySet, "pair sets diverge between gram count and extent views")
    ext.foreach { case (pair, (nSpans, longest, covered)) =>
      assert(nSpans >= 1 && longest >= 8 && covered >= longest,
        s"$pair extents inconsistent: $nSpans/$longest/$covered")
      // n distinct shared grams can't exceed covered positions (each gram
      // start is a distinct covered position) and implies a span
      assert(dup(pair) <= covered, s"$pair grams ${dup(pair)} > covered $covered")
    }
  }

  test("q_strip_boilerplate: clean text = non-repeated chunks in order; counts consistent") {
    val out = PipelineOps2.qStripBoilerplate.fn(spark, TinyDir).collect()
    val docs = T.documents(spark, TinyDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == docs.size)
    // local reference: same 8-token chunking, chunks in >=2 docs removed
    val chunksByDoc = docs.map { case (id, text) =>
      id -> text.split(" ").grouped(8).map(_.mkString(" ")).toVector
    }
    val nDocsPerChunk = chunksByDoc.values.flatten.toSeq
      .groupBy(identity).map { case (c, _) =>
        c -> chunksByDoc.count(_._2.contains(c))
      }
    out.foreach { r =>
      val id = r.getLong(0)
      val expectKept = chunksByDoc(id).filter(c => nDocsPerChunk(c) < 2)
      assert(r.getString(1) == expectKept.mkString(" "), s"doc $id text")
      assert(r.getLong(2) == expectKept.size.toLong, s"doc $id n_kept")
      assert(r.getLong(3) == (chunksByDoc(id).size - expectKept.size).toLong,
        s"doc $id n_removed")
    }
    // the pass must actually remove something on this corpus
    assert(out.map(_.getLong(3)).sum > 0)
  }

  test("q_semdedup: keep/drop decisions match the greedy lower-id rule exactly") {
    val tau = 0.38
    val out = PipelineOps2.qSemDedup.fn(spark, TinyDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val nTotal = T.embeddings(spark, TinyDir).count()
    assert(out.length == nTotal.toInt, "one decision per vector")
    // recompute every decision locally from the emitted cells + raw vectors
    val vecs = T.embeddings(spark, TinyDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      val raw = d / (math.sqrt(na) * math.sqrt(nb))
      // same 6-dp HALF_UP rounding as Spark's round()
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCell = out.groupBy(_._2)
    byCell.values.foreach { cell =>
      val ids = cell.map(_._1).sorted
      cell.foreach { case (id, _, keep) =>
        val hasLowerNear = ids.exists(y => y < id && cos(vecs(y), vecs(id)) >= tau)
        assert(keep == (if (hasLowerNear) 0 else 1), s"vec $id decision")
      }
    }
    // dedup must fire on this corpus (q_dedup_embed finds pairs at 0.38)
    assert(out.exists(_._3 == 0), "expected at least one drop")
    assert(out.exists(_._3 == 1), "expected at least one keep")
  }

  test("q_bpe_merges: merge table equals reference BPE on the same word counts") {
    val got = PipelineOps2.qBpeMerges.fn(spark, TinyDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.length == 3)
    // reference BPE on the collected word-frequency table
    val wordCnt = T.documents(spark, TinyDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    var syms: Seq[(Vector[String], Long)] =
      wordCnt.toSeq.map { case (w, c) => (w.split("").toVector, c) }
    val expected = (1 to 3).map { step =>
      val pairCounts = syms.flatMap { case (ss, c) =>
        ss.zip(ss.tail).map(p => (p, c))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val ((l, r), c) = pairCounts.toSeq
        .minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
      // apply greedily left-to-right
      syms = syms.map { case (ss, cnt) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ss.length) {
          if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += ss(i); i += 1 }
        }
        (out.result(), cnt)
      }
      (step, l, r, l + r, c)
    }
    assert(got.toSeq == expected, s"got=${got.toSeq} expected=$expected")
  }

  test("q_bpe_tokenize: token counts equal reference BPE applied end-to-end") {
    val got = PipelineOps2.qBpeTokenize.fn(spark, TinyDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.length == 20)
    // reference: replay 3 merges locally, then count weighted symbols
    val wordCnt = T.documents(spark, TinyDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    var syms: Seq[(Vector[String], Long)] =
      wordCnt.toSeq.map { case (w, c) => (w.split("").toVector, c) }
    for (_ <- 1 to 3) {
      val pairCounts = syms.flatMap { case (ss, c) =>
        ss.zip(ss.tail).map(p => (p, c))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairCounts.nonEmpty) {
        val ((l, r), _) = pairCounts.toSeq
          .minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        syms = syms.map { case (ss, cnt) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += ss(i); i += 1 }
          }
          (out.result(), cnt)
        }
      }
    }
    val counts = syms.flatMap { case (ss, c) => ss.map(_ -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    assert(got.toSeq == expected, s"got=${got.toSeq.take(5)} expected=${expected.take(5)}")
  }

  test("span strip matches a string-gram brute force (keep-first policy)") {
    // independent driver-side re-derivation with STRING 8-grams — also
    // cross-checks the xxhash64 gram-fingerprint substitution
    val docs = graft.sources.Tables.documents(spark, TinyDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toVector)
      .sortBy(_._1)
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    for ((id, toks) <- docs; i <- 0 to toks.length - 8) {
      val g = toks.slice(i, i + 8).mkString(" ")
      if (!firstDoc.contains(g) || firstDoc(g) > id) firstDoc(g) = id
    }
    val expected = docs.map { case (id, toks) =>
      val covered = Array.fill(toks.length)(false)
      for (i <- 0 to toks.length - 8) {
        val g = toks.slice(i, i + 8).mkString(" ")
        if (firstDoc(g) < id) (i until i + 8).foreach(covered(_) = true)
      }
      val kept = toks.indices.filterNot(covered).map(toks)
      (id, kept.mkString(" "), (toks.length - kept.length).toLong)
    }.toSeq
    val got = ops.PipelineOps2.qSpanStrip.fn(spark, TinyDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    // the strip must actually fire on this corpus
    assert(expected.exists(_._3 > 0), "no spans stripped — corpus assumption broken")
  }

  test("q_strip_audit: pre/post/removed match a string-gram brute force") {
    // same driver-side re-derivation as the strip spec, with STRING grams
    // (cross-checks the xxhash64 substitution on all three metrics)
    val docs = graft.sources.Tables.documents(spark, TinyDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toVector)
      .sortBy(_._1)
    def dupPositions(corpus: Seq[(Long, Vector[String])]): Seq[(Long, Int)] = {
      val firstDoc = scala.collection.mutable.Map[String, Long]()
      for ((id, toks) <- corpus; i <- 0 to toks.length - 8) {
        val g = toks.slice(i, i + 8).mkString(" ")
        if (!firstDoc.contains(g) || firstDoc(g) > id) firstDoc(g) = id
      }
      for {
        (id, toks) <- corpus
        i <- 0 to toks.length - 8
        if firstDoc(toks.slice(i, i + 8).mkString(" ")) < id
      } yield (id, i)
    }
    val pre = dupPositions(docs)
    // keep-first strip: positions covered by any duplicated gram drop out
    var removed = 0L
    val cleaned = docs.map { case (id, toks) =>
      val covered = Array.fill(toks.length)(false)
      pre.collect { case (d, i) if d == id => i }
        .foreach(i => (i until i + 8).foreach(covered(_) = true))
      removed += covered.count(identity)
      id -> toks.indices.filterNot(covered).map(toks).toVector
    }
    val post = dupPositions(cleaned)
    val got = ops.PipelineOps2.qStripAudit.fn(spark, TinyDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "pre_dup_positions" -> pre.size.toLong,
      "post_dup_positions" -> post.size.toLong,
      "tokens_removed" -> removed),
      s"got=$got pre=${pre.size} post=${post.size} removed=$removed")
    assert(pre.nonEmpty, "audit vacuous — no shared grams in corpus")
    assert(post.size < pre.size, "strip did not reduce duplication")
  }
}
