package graft

import graft.ops.Dedup
import graft.sources.{Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The certify split (VERDICT r9 #2): every certificate-carrying gate
  * query has a PRODUCTION twin in [[Production.forms]] — the sketch/LSH
  * plan alone, no exact half, no certificate scan. These specs pin the
  * split's two contracts:
  *
  *  - VALUE parity: on the spec corpus the production twin's answer
  *    agrees with the certified sibling's corresponding leg (pair set ==
  *    verified pair set, pick == pick, triangles == triangles; sketch
  *    estimates equal the values the certified form computed its flags
  *    from), so `certify=false` changes the PLAN, never the semantics;
  *  - PLAN separation: the production minhash chain runs NO exact
  *    SSJoin beside the LSH plan — minhashGraph(certify=false) carries
  *    no exact graph at all, and the twin never touches the
  *    corpus-wide shingle-profile prefix explode twice.
  */
class ProductionFormsSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toIndexedSeq.map(_.toSeq.toIndexedSeq)

  test("production minhash pairs == certified verified pairs (minus the flag)") {
    val certified = Dedup.minhashGraph(spark, TinyDir, certify = true)
    assert(certified.mismatches.contains(0L))
    val prod = Production.forms("q_dedup_minhash")(spark, TinyDir)
    assert(rows(prod) ==
      rows(certified.verified.orderBy("id_a", "id_b")))
  }

  test("production simhash pairs == certified verified pairs (minus the flag)") {
    val certified = Dedup.simhashGraphOf(
      T.documents(spark, TinyDir), "doc_id", "text",
      n = 3, bands = 8, threshold = 0.9, certify = true)
    assert(certified.mismatches.contains(0L))
    val prod = Production.forms("q_dedup_simhash")(spark, TinyDir)
    assert(rows(prod) ==
      rows(certified.verified.orderBy("id_a", "id_b")))
  }

  test("minhashGraph(certify=false) builds no exact graph") {
    val g = Dedup.minhashGraph(spark, TinyDir)
    assert(g.exact.isEmpty && g.mismatches.isEmpty)
    assert(!g.exactVerified, "no certificate ran, so no exact-verified claim")
  }

  test("production pick == certified pick minus the certificate flag") {
    val prod = Production.forms("q_dedup_minhash_pick")(spark, TinyDir)
    val cert = ops.Dedup.qDedupMinhashPick.fn(spark, TinyDir)
      .drop("pairs_exact_verified")
    assert(rows(prod) == rows(cert))
  }

  test("production triangles == certified triangles minus edges_exact") {
    val prod = Production.forms("q_triangle_lsh")(spark, TinyDir)
    val cert = operators.GraphOps2.qTriangleLsh.fn(spark, TinyDir)
      .drop("edges_exact")
    assert(rows(prod) == rows(cert))
  }

  test("production dedup_embed: exact-verified subset of the certified pair set") {
    val cert = rows(ops.Dedup.qDedupEmbed.fn(spark, TinyDir)).toSet
    val prod = rows(Production.forms("q_dedup_embed")(spark, TinyDir))
    // the twin operates at cos >= 0.8 (recall-targeted banding, VERDICT
    // r12 #3) while the certificate gate runs tau=0.38 so the n² oracle
    // has a non-empty answer on the isotropic corpus — so precision 1
    // means: every twin pair is in the exact set AND at the twin's
    // threshold
    assert(prod.toSet.subsetOf(cert),
      s"twin emitted a pair the exact scan does not have: ${(prod.toSet -- cert).take(3)}")
    assert(prod.forall(_(2).asInstanceOf[Double] >= 0.8))
    // recall at the OPERATING threshold is pinned on the planted
    // near-dup corpus below ("achievable" recall); here pin the honest
    // relation on the isotropic corpus: the exact pairs at cos >= 0.8
    // (usually none — isotropic vectors don't near-dup) are captured at
    // the chosen banding's predicted rate or the set is empty on both
    // sides
    val certHigh = cert.filter(_(2).asInstanceOf[Double] >= 0.8)
    if (certHigh.isEmpty) assert(prod.isEmpty)
    else assert(prod.size.toDouble / certHigh.size >= 0.5)
  }

  test("recall-targeted banding: planted near-dup corpus reaches recall >= 0.8 at tau = 0.8") {
    import spark.implicits._
    // 40 base directions, 3 jittered copies each: within-cluster pairs
    // sit at cos >= ~0.95 (true near-dups), cross-cluster pairs are
    // near-orthogonal — the corpus shape real dedup operates on
    val rnd = new scala.util.Random(7)
    val bases = Array.fill(40)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (for (c <- 0 until 40; j <- 0 until 3) yield {
      val v = bases(c).map(_ + 0.08 * rnd.nextGaussian())
      ((c * 3 + j).toLong, v.toSeq)
    }).toDF("vec_id", "embedding")
    val exact = ops.Similarity.cosinePairsVerified(vecs, "vec_id", "embedding",
        vecs.select(col("vec_id").as("id_a")).crossJoin(
          vecs.select(col("vec_id").as("id_b"))).filter(col("id_a") < col("id_b")),
        0.8).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 40, s"plant must contain true near-dups, got ${exact.size}")
    val got = ops.Similarity.cosinePairsVerified(vecs, "vec_id", "embedding",
        ops.Similarity.lshCandidatePairsAt(vecs, "vec_id", "embedding", tau = 0.8),
        0.8).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact))
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.8,
      s"recall-targeted banding must capture >= 0.8 of true near-dups, got $recall")
  }

  test("recall-targeted MINHASH banding: planted trigram near-dups reach candidate recall >= 0.8 at tau = 0.5") {
    import spark.implicits._
    // 40 clusters of 2 docs sharing ~75% of their token stream: the
    // within-cluster trigram Jaccard sits near 0.6 (true near-dups above
    // the j >= 0.5 operating threshold); cross-cluster docs share no
    // token at all. Deterministic corpus + seeded minhash ⇒ no flake.
    val docs = (for (c <- 0 until 40; j <- 0 until 2) yield {
      val shared = (0 until 45).map(i => s"c${c}t$i")
      val own = (0 until 15).map(i => s"c${c}v${j}x$i")
      ((c * 2 + j).toLong, (shared ++ own).mkString(" "))
    }).toDF("doc_id", "text")
    val exact = ops.Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 40, s"plant must contain exactly the 40 cluster pairs: ${exact.size}")
    val (bands, rows) = ops.Dedup.recallTargetedMinhash(0.5)
    assert(ops.Dedup.minhashPredictedRecall(0.5, bands, rows) >= 0.8,
      s"chooser must meet its own floor: ($bands, $rows)")
    // the old fixed banding's implied recall at its own threshold — the
    // gap the chooser exists to close
    assert(ops.Dedup.minhashPredictedRecall(0.5, 16, 4) < 0.7)
    val got = ops.Dedup.minhashVerifiedPairsAt(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), "verification is exact: precision 1")
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.8,
      s"recall-targeted minhash banding must capture >= 0.8 of true near-dups, got $recall")
  }

  test("a Jaccard threshold the S-curve cannot band within the background-collision budget fails loud") {
    val e = intercept[IllegalArgumentException] {
      ops.Dedup.recallTargetedMinhash(0.05)
    }
    assert(e.getMessage.contains("S-curve") && e.getMessage.contains("tau=0.05"),
      s"the error must carry the curve's math: ${e.getMessage}")
    assert(e.getMessage.contains("prefix"),
      s"the error must route the caller to the lossless exact form: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      ops.Dedup.minhashVerifiedPairsAt(
        T.documents(spark, TinyDir), "doc_id", "text", tau = 0.05)
    }
    assert(e2.getMessage.contains("S-curve"))
  }

  test("a threshold the S-curve cannot band sub-quadratically fails loud, naming the curve") {
    val e = intercept[IllegalArgumentException] {
      ops.Similarity.recallTargetedLsh(0.38)
    }
    assert(e.getMessage.contains("S-curve") && e.getMessage.contains("tau=0.38"),
      s"the error must carry the curve's math: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      ops.Similarity.lshCandidatePairsAt(
        T.embeddings(spark, TinyDir), "vec_id", "embedding", tau = 0.38)
    }
    assert(e2.getMessage.contains("S-curve"))
  }

  test("production knn_graph: exact cosines on candidate edges, bounded degree, recall floor") {
    val prod = Production.forms("q_knn_graph")(spark, TinyDir).collect()
    val cert = ops.Similarity.qKnnGraph.fn(spark, TinyDir).collect()
    val certEdges = cert.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    prod.groupBy(_.getLong(0)).foreach { case (n, rs) =>
      assert(rs.length <= 4, s"node $n degree ${rs.length} > 4")
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1 to rs.length).map(_.toLong),
        s"node $n ranks not contiguous")
    }
    // every twin edge's cosine is the TRUE cosine (exact verify), and
    // edge recall vs the certified graph tracks the CHOSEN banding's
    // S-curve per-edge capture probability — the banding is now picked
    // by recallTargetedLsh at the twin's tau=0.8 operating point
    // (VERDICT r12 #3), so the prediction reads the same chooser
    val (bands, bits) = ops.Similarity.recallTargetedLsh(0.8)
    val prodEdges = prod.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val hit = certEdges.count(prodEdges.contains)
    val predicted = certEdges.toSeq.map { case (_, _, c) =>
      ops.Similarity.lshPredictedRecall(c, bands, bits)
    }.sum / certEdges.size
    val recall = hit.toDouble / certEdges.size
    assert(math.abs(recall - predicted) <= 0.1,
      s"knn twin recall $recall vs S-curve prediction $predicted ($hit/${certEdges.size}, bands=$bands bits=$bits)")
  }

  test("production graph_search: serving against the frozen bundle equals the gate query") {
    // the split is build/serve: the bundle is built once, the twin's
    // recurring cost is the beam search alone — and against the SAME
    // graph parameters the answers are identical to the gate query's
    val prod = rows(Production.forms("q_graph_search")(spark, TinyDir))
    val cert = rows(ops.PipelineOps4.qGraphSearch.fn(spark, TinyDir))
    assert(prod == cert, "bundle serving must answer exactly like the gate query")
  }

  test("production fuse: text/exact arms identical, embed flags a subset") {
    val cert = ops.Dedup.qDedupFuse.fn(spark, TinyDir).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toMap
    val prod = Production.forms("q_dedup_fuse")(spark, TinyDir).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(prod.keySet == cert.keySet)
    prod.foreach { case (id, (t, e, x)) =>
      val (ct, ce, cx) = cert(id)
      assert(t == ct, s"doc $id text_dup differs (same arm both forms)")
      assert(x == cx, s"doc $id exact_dup differs (same arm both forms)")
      assert(!e || ce, s"doc $id embed_dup set by the twin but not the exact arm")
    }
  }

  test("production sketch quantiles: sketch values, sketch-only plan") {
    val prod = Production.forms("q_sketch_quantile")(spark, TinyDir)
    // the sketch is a pure function of the input set: the production
    // read-off must agree with an independent recomputation of the same
    // sketch (and the certified form's rank flag already bounds it)
    val q = udf((b: Array[Byte], p: Double) =>
      graft.functions.SampleQuantileAgg.quantile(b, p))
    val again = T.lineitem(spark, TinyDir)
      .groupBy("l_returnflag")
      .agg(graft.functions.SampleQuantileAgg.agg(
          xxhash64(col("l_orderkey"), col("l_linenumber")),
          col("l_extendedprice"), 4096).as("sk"),
        count(lit(1)).as("cnt"))
      .select(col("l_returnflag"), q(col("sk"), lit(0.5)).as("p50"),
        q(col("sk"), lit(0.9)).as("p90"), q(col("sk"), lit(0.99)).as("p99"),
        col("cnt"))
      .orderBy("l_returnflag")
    assert(rows(prod) == rows(again))
    // and the production plan must NOT contain the exact-percentile agg
    val plan = prod.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("percentile("),
      "production form must not co-compute the exact percentile")
  }

  test("production setops estimates match the certified form's estimate leg") {
    val prod = Production.forms("q_sketch_setops")(spark, TinyDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // recompute the certified form's sketch estimates directly
    val tk = T.documents(spark, TinyDir).select(col("source"),
      explode(split(col("text"), " ")).as("token"))
    val sk = tk.groupBy("source")
      .agg(graft.functions.KmvAgg.agg(xxhash64(col("token")), 1024).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val sources = sk.keys.toSeq.sorted
    for (a <- sources; b <- sources if a < b) {
      val (u, i, j) = graft.functions.KmvAgg.setOps(sk(a), sk(b))
      val got = prod((a, b))
      assert(got._1 == u && got._2 == i &&
        math.abs(got._3 - math.rint(j * 1e6) / 1e6) < 1e-9,
        s"pair ($a,$b): got $got expected ($u,$i,$j)")
    }
  }

  test("production CMS probe estimates >= exact counts (the CMS invariant)") {
    val prod = Production.forms("q_sketch_cms")(spark, TinyDir)
    val tk = T.documents(spark, TinyDir).select(col("source"),
      explode(split(col("text"), " ")).as("token"))
    val exact = tk.groupBy("source", "token").agg(count(lit(1)).as("n"))
    val joined = prod.join(exact, Seq("source", "token"), "left")
      .na.fill(0L, Seq("n"))
      .select(col("freq_est"), col("n")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(0) >= r.getLong(1)))
  }

  test("production decontam screen (frozen pre-built index) == the gate query") {
    // the twin's split is build/serve, not certificate/sketch: the gate
    // query builds the benchmark index in-plan every run (the certified
    // end-to-end pass), the twin screens against a once-built frozen
    // index — same pairs, the recurring production cost only
    val gate = SparkEntry.queries("q_decontam_index")(spark, TinyDir)
    val prod = Production.forms("q_decontam_index")(spark, TinyDir)
    assert(rows(prod) == rows(gate), "serve-only screen diverged from the gate")
    // memoized index: a second call reuses the same root (no rebuild)
    val again = Production.forms("q_decontam_index")(spark, TinyDir)
    assert(rows(again) == rows(gate))
  }

  test("production distinct/median estimates are sane vs exact") {
    val pd = Production.forms("q_sketch_distinct")(spark, TinyDir)
    val exact = T.lineitem(spark, TinyDir).groupBy("l_suppkey")
      .agg(countDistinct(col("l_partkey")).as("x"))
    val j = pd.join(exact, "l_suppkey").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val est = r.getLong(1); val x = r.getLong(2)
      assert(math.abs(est - x) <= math.max(1.0, 0.05 * x),
        s"suppkey ${r.get(0)}: hll $est vs exact $x")
    }
    val pq = Production.forms("q_approx_quantile")(spark, TinyDir).collect()
    assert(pq.nonEmpty)
    // percentile_approx returns an OBSERVED element under a rank
    // guarantee (±n/accuracy) — check the rank, not the interpolated
    // median (adjacent order prices gap by thousands; a value compare
    // would reject a correct sketch)
    val o = T.orders(spark, TinyDir).select("o_orderpriority", "o_totalprice")
    pq.foreach { r =>
      val pri = r.getString(0); val est = r.getDouble(1); val cnt = r.getLong(2)
      val lt = o.filter(col("o_orderpriority") === pri &&
        col("o_totalprice") < est).count()
      val le = o.filter(col("o_orderpriority") === pri &&
        col("o_totalprice") <= est).count()
      assert(lt <= 0.5 * cnt + cnt / 1000.0 + 1, s"$pri: lt=$lt cnt=$cnt")
      assert(le >= 0.5 * cnt - cnt / 1000.0 - 1, s"$pri: le=$le cnt=$cnt")
    }
  }
}
