package graft

import graft.ops.{PipelineOps, Similarity}
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** Invariants for the round-6 pipeline operators beyond the DuckDB
  * oracle: clustering assignment cross-check + determinism (rows-only
  * query), dedup-incr status semantics, perplexity lower bound. */
class PipelineOpsSpec extends SparkSpec {

  test("q_embed_cluster: sizes sum to corpus, assignment is argmax cosine, deterministic") {
    val out = PipelineOps.qEmbedCluster.fn(spark, TinyDir).collect()
    val nTotal = T.embeddings(spark, TinyDir).count()
    assert(out.map(_.getAs[Long]("n_vecs")).sum == nTotal)
    assert(out.length <= 8)
    assert(out.forall { r =>
      val share = r.getAs[Double]("top_label_share")
      share > 0.0 && share <= 1.0 && r.getAs[Double]("cohesion") <= 1.000001
    })
    // assignment cross-check: nearestCell == brute-force argmax cosine
    // (ties to lowest cid), on the driver over the same codebook
    val corpus = T.embeddings(spark, TinyDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val codebook = Similarity.fitKmeansCodebook(
      corpus.select(col("vec_id").as("id"), col("v")), 8)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val assigned = corpus
      .withColumn("cell", Similarity.nearestCell(col("v"), codebook))
      .collect()
    assigned.take(50).foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val best = codebook.zipWithIndex.map { case (c, i) => (cos(v, c), i) }
        .maxBy { case (s, i) => (s, -i) }._2
      assert(r.getAs[Long]("cell") == best.toLong,
        s"vec ${r.getLong(0)}: cell ${r.getAs[Long]("cell")} != argmax $best")
    }
    // two runs are identical (fit + assignment are deterministic)
    val again = PipelineOps.qEmbedCluster.fn(spark, TinyDir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q_dedup_incr: exact means verbatim text in base; near/unique respect the threshold") {
    val docs = T.documents(spark, TinyDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baseTexts = docs.collect { case (id, t) if id % 5 != 0 => t }.toSet
    val out = PipelineOps.qDedupIncr.fn(spark, TinyDir).collect()
    assert(out.length == docs.count(_._1 % 5 == 0))
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val status = r.getAs[String]("status")
      val bj = Option(r.getAs[java.lang.Double]("best_jaccard")).map(_.doubleValue)
      status match {
        case "exact" => assert(baseTexts.contains(docs(id)), s"doc $id marked exact but text not in base")
        case "near" => assert(!baseTexts.contains(docs(id)) && bj.exists(_ >= 0.5))
        case "unique" => assert(!baseTexts.contains(docs(id)) && bj.forall(_ < 0.5))
        case other => fail(s"unknown status $other")
      }
    }
  }

  test("q_perplexity: ppl >= 1 and identical docs score identically") {
    val out = PipelineOps.qPerplexity.fn(spark, TinyDir).collect()
    assert(out.forall(_.getAs[Double]("ppl") >= 1.0)) // MLE probs <= 1
    // exact-dup doc pairs (same text) must get the same perplexity
    val dups = T.documents(spark, TinyDir)
      .groupBy(md5(col("text"))).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("doc_id"), col("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    if (dups.nonEmpty) {
      val ppl = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
      dups.foreach { case (id, ids) =>
        assert(ids.map(ppl).distinct.size == 1, s"dup group $ids has differing ppl")
      }
    }
  }

  test("q_pack_bestfit: every doc packed once, no bin overflows, FFD bound holds, deterministic") {
    val budget = 256
    val out = graft.ops.Retrieval.qPackBestfit.fn(spark, TinyDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bin_id"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("tokens")))
    val nDocs = T.documents(spark, TinyDir).count()
    assert(out.map(_._3).distinct.length.toLong == nDocs)
    val byBin = out.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._4).sum)
    assert(byBin.values.forall(_ <= budget), "a bin exceeds the token budget")
    // any-fit guarantee: per source, at most one bin is <= half full,
    // so bins < 2 * total/budget + 1
    out.groupBy(_._1).foreach { case (src, rows) =>
      val bins = rows.map(_._2).distinct.length
      val total = rows.map(_._4).sum
      assert(bins <= 2 * total / budget + 1, s"$src: $bins bins for $total tokens")
    }
    val again = graft.ops.Retrieval.qPackBestfit.fn(spark, TinyDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bin_id"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("tokens")))
    assert(out.toSeq == again.toSeq)
  }

  test("q_mix_plan: rates capped at 1 and yields never exceed supply") {
    val out = PipelineOps.qMixPlan.fn(spark, TinyDir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("expected_tokens") <= r.getAs[Long]("src_tokens"))
    }
  }

  test("q_mix_reweight: excess-loss sources gain share, shares stay a distribution") {
    val out = PipelineOps.qMixReweight.fn(spark, SmallDir).collect()
    assert(out.length == 20)
    // still a distribution after 3 integer-algebra rounds (ppm rounding
    // loses at most 1 per source)
    val shareSum = out.map(_.getAs[Long]("share_ppm")).sum
    assert(math.abs(shareSum - 1000000L) <= out.length,
      s"shares sum to $shareSum ppm")
    // multiplicative weights moved: not uniform anymore
    assert(out.map(_.getAs[Long]("w_final")).distinct.length > 1,
      "weights never moved off uniform")
    // monotone in the proxy loss: the highest-loss source ends with the
    // max weight, the lowest-loss with the min (same update applied to
    // the same shared averages)
    val byLoss = out.sortBy(_.getAs[Long]("loss_micro"))
    val ws = out.map(_.getAs[Long]("w_final"))
    assert(byLoss.last.getAs[Long]("w_final") == ws.max)
    assert(byLoss.head.getAs[Long]("w_final") == ws.min)
    // deterministic: same inputs, same mixture
    val again = PipelineOps.qMixReweight.fn(spark, SmallDir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
