package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("exact dedup survivors cover all documents") {
    val d = Dedup.qDedupExact.fn(spark, TinyDir)
    val total = d.agg(sum("n_copies")).head().getLong(0)
    val docs = spark.read.parquet(s"$TinyDir/documents.parquet").count()
    assert(total == docs)
  }

  test("ngram jaccard pairs are within [0,1] and above threshold") {
    val p = Dedup.qDedupNgram.fn(spark, TinyDir).collect()
    assert(p.nonEmpty) // generator plants near-dups
    p.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("minhash LSH finds the planted near-dup pairs (vs exact jaccard)") {
    val exact = Dedup.qDedupNgram.fn(spark, TinyDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.qDedupMinhash.fn(spark, TinyDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall: LSH at est>=0.5 should recover most >=0.5-jaccard pairs
    val hit = exact.intersect(lsh).size.toDouble
    assert(exact.isEmpty || hit / exact.size >= 0.6, s"recall too low: $hit/${exact.size}")
  }

  test("q_dedup_calibration: buckets well-formed, high-similarity recall near 1") {
    val rows = Dedup.qDedupCalibration.fn(spark, TinyDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bucket = r.getDouble(0)
      val (nExact, nFound) = (r.getLong(1), r.getLong(2))
      val (recall, err) = (r.getDouble(3), r.getDouble(4))
      assert(bucket >= 0.3 && bucket <= 1.0)
      assert(nFound <= nExact && recall >= 0.0 && recall <= 1.0)
      assert(err >= 0.0 && err <= 0.5, s"bucket $bucket mean_abs_err $err")
      // the 16x4 banding S-curve: p(candidate) = 1-(1-j^4)^16 >= 0.996 at j >= 0.8
      if (bucket >= 0.8) assert(recall >= 0.9, s"bucket $bucket recall $recall")
    }
  }

  test("simhash near-dup hamming bound holds (library hamming form)") {
    val docs = graft.sources.Tables.documents(spark, TinyDir)
    val p = Dedup.simhashHammingPairs(docs, "doc_id", "text").collect()
    assert(p.nonEmpty)
    p.foreach(r => assert(r.getAs[Long]("hamming") <= 3))
  }

  test("certified simhash gate: verified pairs == exact J>=0.9 graph, flag true") {
    val p = Dedup.qDedupSimhash.fn(spark, TinyDir).collect()
    assert(p.nonEmpty)
    assert(p.forall(_.getAs[Boolean]("pairs_exact_verified")),
      "8-band candidates must reach every J>=0.9 pair on this corpus " +
        "(measured hamming <= 7 < bands)")
    p.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.9))
  }

  test("decontam screen == cross pairs of the exact SSJoin; index side broadcasts") {
    val docs = graft.sources.Tables.documents(spark, TinyDir)
    val idx = s"/tmp/graft_screen_spec_${System.nanoTime()}"
    Dedup.NearDupIndex.build(docs.filter(col("doc_id") < 25), idx)
    val screened = Dedup.NearDupIndex.screen(spark, idx, docs.filter(col("doc_id") >= 25))
    val got = screened.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    // ground truth: the live SSJoin over the WHOLE corpus, restricted to
    // cross pairs (one endpoint in the eval set)
    val want = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5)
      .filter((col("id_a") < 25 && col("id_b") >= 25) ||
        (col("id_a") >= 25 && col("id_b") < 25))
      .collect()
      .map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val (train, ev) = if (a < 25) (b, a) else (a, b)
        (train, ev, r.getAs[Number](2).longValue)
      }.toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty, "spec corpus must have cross-boundary near-dups")
    // scale orientation: the SMALL index side broadcasts; the corpus
    // side must not (a corpus broadcast would OOM the real use)
    val plan = screened.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "index side should broadcast-join")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("embedding near-dup pairs are symmetric-free and thresholded") {
    val p = Dedup.qDedupEmbed.fn(spark, TinyDir)
    assert(p.filter(col("id_a") >= col("id_b")).isEmpty)
    assert(p.filter(col("cos") < 0.38).isEmpty)
  }

  test("projected (map-side) minhash signatures equal the exploded groupBy pipeline") {
    val docs = graft.sources.Tables.documents(spark, TinyDir)
    val viaShuffle = Dedup.minhashSignatures(
        Dedup.wordShingleHashes(docs, "doc_id", "text", 3), 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val projected = Dedup.minhashSigProjected(docs, "doc_id", "text", 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(projected.keySet == viaShuffle.keySet)
    projected.foreach { case (id, sig) =>
      assert(sig == viaShuffle(id), s"sig mismatch for doc $id")
    }
    // and the projection really is shuffle-free
    val plan = Dedup.minhashSigProjected(docs, "doc_id", "text", 3, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projected minhash shuffled:\n$plan")
  }

  /** Brute-force >= t Jaccard pairs: every doc pair sharing ANY gram
    * (a pair sharing none has J = 0 < t, so this space is complete),
    * no prefix or length pruning — the recall ground truth. */
  private def naiveJaccardPairs(threshold: Double) = {
    val docs = graft.sources.Tables.documents(spark, TinyDir)
    val sh = Dedup.wordShingleHashes(docs, "doc_id", "text", 3)
    val sz = sh.groupBy("id").agg(count(lit(1)).as("n"))
    sh.select(col("id").as("id_a"), col("sh"))
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
      .join(sz.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sz.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("c").cast("double") /
          (col("na") + col("nb") - col("c")).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  test("SSJoin prefix filter is LOSSLESS at the threshold: equals brute force") {
    val naive = naiveJaccardPairs(0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ssj = Dedup.jaccardPairsPrefix(
        graft.sources.Tables.documents(spark, TinyDir), "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(naive.nonEmpty, "generator plants near-dups; ground truth empty")
    assert(ssj == naive, s"prefix filter dropped/added pairs: " +
      s"missing=${naive -- ssj} extra=${ssj -- naive}")
  }

  test("batch-restricted SSJoin finds exactly the batch-touching pairs") {
    val naive = naiveJaccardPairs(0.5)
      .filter(col("id_a") % 5 === 0 || col("id_b") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Dedup.jaccardPairsPrefixAgainst(
        graft.sources.Tables.documents(spark, TinyDir), "doc_id", "text", 3, 0.5,
        col("id") % 5 === 0)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == naive, s"batch-restricted SSJoin mismatch: " +
      s"missing=${naive -- got} extra=${got -- naive}")
  }

  test("persisted near-dup index: frozen-order query equals the live SSJoin") {
    val docs = graft.sources.Tables.documents(spark, TinyDir)
    val isBatch = col("doc_id") % 5 === 0
    val idx = s"/tmp/graft_ndidx_${System.nanoTime()}"
    // index yesterday's corpus; query today's batch against it
    Dedup.NearDupIndex.build(docs.filter(!isBatch), idx)
    val got = Dedup.NearDupIndex.query(spark, idx, docs.filter(isBatch))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    // ground truth: the live (corpus-rescanning) batch-restricted SSJoin
    val want = Dedup.jaccardPairsPrefixAgainst(
        docs, "doc_id", "text", 3, 0.5, col("id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(want.nonEmpty, "generator plants near-dups across the batch split")
    assert(got == want, s"index query diverged: missing=${want -- got} extra=${got -- want}")
    // append folds the batch in; a later batch finds pairs across BOTH
    Dedup.NearDupIndex.append(spark, idx, docs.filter(isBatch))
    val again = Dedup.NearDupIndex.query(spark, idx, docs.filter(isBatch))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(again == want, "self-requery after append changed the pair set")
  }

  test("index point lookup serves one doc's near-dups without a corpus pass") {
    val docs = graft.sources.Tables.documents(spark, TinyDir)
    val idx = s"/tmp/graft_ndidx_lookup_${System.nanoTime()}"
    Dedup.NearDupIndex.build(docs, idx)
    val all = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(all.nonEmpty, "generator plants near-dups")
    // pick a doc with at least one pair; its lookup must return exactly
    // the pairs touching it
    val probe = all.head._1
    val want = all.collect {
      case (a, b, j) if a == probe => b -> j
      case (a, b, j) if b == probe => a -> j
    }.toSet
    val got = Dedup.NearDupIndex.lookup(spark, idx, probe)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toSet
    assert(got == want, s"lookup($probe): got=$got want=$want")
    // unindexed id: empty, not an error
    assert(Dedup.NearDupIndex.lookup(spark, idx, -1L).isEmpty)
  }

  for (crashAt <- 1 to 4)
    test(s"index rebuild crash point $crashAt: queries stay whole, re-run converges") {
      val docs = graft.sources.Tables.documents(spark, TinyDir)
      val isBatch = col("doc_id") % 5 === 0
      val idx = s"/tmp/graft_ndidx_rb${crashAt}_${System.nanoTime()}"
      Dedup.NearDupIndex.build(docs.filter(!isBatch), idx)
      val want = Dedup.NearDupIndex.query(spark, idx, docs.filter(isBatch))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      intercept[graft.sources.AtomicSwap.CrashPoint] {
        Dedup.NearDupIndex.rebuild(spark, idx, docs.filter(!isBatch),
          crashAfter = crashAt)
      }
      // reader mid-crash resolves one complete index (old or new — same
      // corpus, so the pair set is identical either way)
      val mid = Dedup.NearDupIndex.query(spark, idx, docs.filter(isBatch))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(mid == want, s"torn index read at crash point $crashAt")
      Dedup.NearDupIndex.rebuild(spark, idx, docs.filter(!isBatch))
      val after = Dedup.NearDupIndex.query(spark, idx, docs.filter(isBatch))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == want, "re-run rebuild changed the pair set")
    }

  test("cosine candidates+verify: precision 1 vs brute force; high-cos recall bounded") {
    import graft.ops.Similarity
    val emb = graft.sources.Tables.embeddings(spark, TinyDir)
    val brute = Dedup.qDedupEmbed.fn(spark, TinyDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = Similarity.cosinePairsVerified(emb, "vec_id", "embedding",
        Similarity.lshCandidatePairs(emb, "vec_id", "embedding", bands = 8), 0.38)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact verification ⇒ every emitted pair is a true >= tau pair
    assert(got.subsetOf(brute.keySet),
      s"verified pairs not in brute force: ${got -- brute.keySet}")
    // recall on the high-similarity band (the pairs dedup must not miss):
    // 8 bands x 8 bits ⇒ p(candidate) = 1-(1-p_bit^8)^8 >= ~0.9 at cos 0.8
    val high = brute.filter(_._2 >= 0.8).keySet
    val hit = high.intersect(got).size.toDouble
    assert(high.isEmpty || hit / high.size >= 0.6,
      s"high-cos recall too low: $hit/${high.size}")
  }

  test("containment catches doc-in-doc pairs that Jaccard misses") {
    import spark.implicits._
    // doc 2 is the first third of doc 1: containment 1.0, Jaccard ~ 1/3.
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(got.length == 1, s"expected exactly the (1,2) pair: ${got.toSeq}")
    val (a, b, c, j) = got.head
    assert((a, b) == ((1L, 2L)))
    assert(c == 1.0, s"short doc fully contained: containment=$c")
    assert(j < 0.5, s"Jaccard must be low for asymmetric pair: $j")
    // the symmetric Jaccard pass at the same bar finds nothing
    assert(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.8).isEmpty)
  }

  test("containment stop-gram cap drops ubiquitous grams from candidates") {
    import spark.implicits._
    // the same boilerplate trigram in every doc must not pair everything:
    // with dfCap=3 < 5 docs, the shared gram is dropped and no pair forms.
    val docs = (1L to 5L).map(i => (i, s"common shared gram unique$i tail$i"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.5, 3)
    assert(pairs.isEmpty, s"stop-gram cap failed: ${pairs.collect().toSeq}")
  }
}
