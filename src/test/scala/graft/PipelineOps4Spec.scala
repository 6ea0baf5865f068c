package graft

import org.apache.spark.sql.functions._

/** q_embed_quantize / q_curriculum semantics (exact values are
  * oracle-pinned; this pins the METHOD properties on planted data). */
class PipelineOps4Spec extends SparkSpec {

  // ---- q_embed_quantize ----

  private lazy val twoLevelDir: String = {
    // every dim takes only the values 0.0 and 1.0 → the 255-level grid
    // contains both endpoints exactly and reconstruction is lossless
    val dir = java.nio.file.Files.createTempDirectory("graft_quant").toString
    import spark.implicits._
    val vecs = (0 until 8).map { i =>
      (i.toLong, (0 until 16).map(j => if ((i + j) % 2 == 0) 0.0f else 1.0f).toArray, i % 2)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("two-level corpus reconstructs exactly: mse = linf = 0, codes are 0/255") {
    val out = SparkEntry.queries("q_embed_quantize")(spark, twoLevelDir).collect()
    assert(out.length == 8)
    out.foreach { r =>
      assert(r.getDouble(2) == 0.0, s"vec ${r.getLong(0)}: mse ${r.getDouble(2)} != 0")
      assert(r.getDouble(3) == 0.0, s"vec ${r.getLong(0)}: linf ${r.getDouble(3)} != 0")
      // 8 dims at level 255 per vector (alternating pattern)
      assert(r.getLong(1) == 8L * 255L, s"vec ${r.getLong(0)}: qsum ${r.getLong(1)}")
    }
  }

  test("reconstruction error is bounded by the worst per-dimension step") {
    val e = sources.Tables.embeddings(spark, TinyDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val step = e.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i").agg((max(col("x")) - min(col("x"))).as("r"))
      .agg(max(col("r"))).head.getDouble(0) / 255.0
    val out = SparkEntry.queries("q_embed_quantize")(spark, TinyDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // floor quantization: error < one step (plus fp headroom)
      assert(r.getDouble(3) <= step * (1.0 + 1e-9),
        s"vec ${r.getLong(0)}: linf ${r.getDouble(3)} > step $step")
      assert(r.getDouble(2) <= step * step,
        s"vec ${r.getLong(0)}: mse ${r.getDouble(2)} > step^2")
    }
  }

  test("quantization is partition-invariant (same rows under a repartitioned session)") {
    val a = SparkEntry.queries("q_embed_quantize")(spark, TinyDir).collect().toSeq
    val b = withConf("spark.sql.shuffle.partitions" -> "7") {
      SparkEntry.queries("q_embed_quantize")(spark, TinyDir).collect().toSeq
    }
    assert(a == b)
  }

  // ---- q_quantize_ann ----

  test("int8 ADC retrieval keeps most exact top-10 neighbors (mean recall >= 0.8)") {
    val out = SparkEntry.queries("q_quantize_ann")(spark, TinyDir).collect()
    assert(out.length == 16, "one row per probe")
    out.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) <= 10)
      assert(math.abs(r.getDouble(2) - r.getInt(1) / 10.0) < 1e-9)
    }
    val mean = out.map(_.getDouble(2)).sum / out.length
    assert(mean >= 0.8, s"mean ADC recall $mean < 0.8")
  }

  test("lossless two-level corpus: quantized retrieval is exact (overlap = n-1 < 10)") {
    val out = SparkEntry.queries("q_quantize_ann")(spark, twoLevelDir).collect()
    // 8 vectors: every probe's candidate set is all 7 others, and the
    // reconstruction is exact, so the two top-k lists coincide entirely
    assert(out.length == 8)
    out.foreach(r => assert(r.getInt(1) == 7, s"probe ${r.getLong(0)}: overlap ${r.getInt(1)} != 7"))
  }

  // ---- q_cluster_labels ----

  test("planted clusters: each cell's label tokens come from its own vocabulary, shared filler never wins") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_clbl").toString
    // two well-separated embedding clusters; docs of cluster 0 speak
    // alpha-vocabulary, cluster 1 zeta-vocabulary, everyone says "the"
    val n = 24
    val emb = (0 until n).map { i =>
      val v = Array.fill(8)(0.0f)
      v(if (i < n / 2) 0 else 4) = 10.0f
      v(7) = 0.01f * i
      (i.toLong, v, i % 3)
    }
    emb.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val docs = (0 until n).map { i =>
      val text = if (i < n / 2) "the alpha beta gamma the alpha" else "the zeta eta theta the zeta"
      (i.toLong, text, "en", s"src${i % 4}", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_cluster_labels")(spark, dir).collect()
    assert(out.nonEmpty)
    val alphaVocab = Set("alpha", "beta", "gamma")
    val zetaVocab = Set("zeta", "eta", "theta")
    out.groupBy(_.getLong(0)).foreach { case (cell, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      val top = byRank.head.getString(2)
      assert(top != "the", s"cell $cell: shared filler ranked #1")
      assert(alphaVocab(top) || zetaVocab(top), s"cell $cell: top token $top")
      // the cell is vocabulary-pure: its top-3 tokens are from ONE side
      val top3 = byRank.take(3).map(_.getString(2)).toSet
      assert(top3.subsetOf(alphaVocab) || top3.subsetOf(zetaVocab),
        s"cell $cell mixes vocabularies: $top3")
    }
  }

  test("cluster labels on the real corpus: at most 5 ranked rows per cell, rerun-stable") {
    val a = SparkEntry.queries("q_cluster_labels")(spark, TinyDir).collect().toSeq
    assert(a.nonEmpty)
    a.groupBy(_.getLong(0)).foreach { case (cell, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length),
        s"cell $cell ranks not contiguous")
    }
    val b = SparkEntry.queries("q_cluster_labels")(spark, TinyDir).collect().toSeq
    assert(a == b)
  }

  // ---- q_preference_pairs ----

  test("preference pairs: best-vs-worst within source, margin positive, uniform sources yield none") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pref").toString
    val docs = Seq(
      // srcA: quality strictly increases with stopword density
      (1L, "xx yy zz qq ww", "en", "srcA"),
      (2L, "the of and xx yy", "en", "srcA"),
      (3L, "the of and to in", "en", "srcA"),
      // srcB: two copies of identical text — uniform quality, no pairs
      (10L, "same text here", "en", "srcB"),
      (11L, "same text here", "en", "srcB"))
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_preference_pairs")(spark, dir).collect()
    assert(out.forall(_.getString(0) == "srcA"), "uniform srcB must yield no pairs")
    out.foreach { r =>
      assert(r.getLong(2) != r.getLong(3), "chosen must differ from rejected")
      assert(r.getDouble(4) > 0, "margin must be strictly positive")
    }
    // rank-1 pair is the extreme contrast: most stopword-dense vs least
    val r1 = out.find(_.getInt(1) == 1).get
    assert(r1.getLong(2) == 3L && r1.getLong(3) == 1L,
      s"rank-1 pair ${r1.getLong(2)} vs ${r1.getLong(3)}")
  }

  test("preference pairs on the real corpus: per-source ranks, margins consistent with quality") {
    val out = SparkEntry.queries("q_preference_pairs")(spark, TinyDir).collect()
    assert(out.nonEmpty)
    val quality = SparkEntry.queries("q_quality_score")(spark, TinyDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    out.foreach { r =>
      val margin = quality(r.getLong(2)) - quality(r.getLong(3))
      assert(math.abs(margin - r.getDouble(4)) < 1e-6,
        s"pair ${r.getLong(2)}/${r.getLong(3)}: margin ${r.getDouble(4)} != $margin")
      assert(r.getDouble(4) > 0)
    }
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      assert(rows.map(_.getInt(1)).distinct.length == rows.length,
        s"$src has duplicate ranks")
    }
  }

  // ---- q_ivf_tune ----

  test("ivf tuning table: recall and scan fraction are monotone in nprobe, bounded") {
    val out = SparkEntry.queries("q_ivf_tune")(spark, TinyDir).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8))
    val rec = out.map(_.getDouble(1))
    val frac = out.map(_.getDouble(2))
    rec.foreach(r => assert(r >= 0.0 && r <= 1.0))
    frac.foreach(f => assert(f > 0.0 && f <= 1.0))
    rec.zip(rec.tail).foreach { case (a, b) =>
      assert(a <= b + 1e-9, s"recall not monotone: $a > $b") }
    frac.zip(frac.tail).foreach { case (a, b) =>
      assert(a < b, s"scan fraction must strictly grow: $a >= $b") }
    // probing half the cells must already find most true neighbors here
    assert(rec.last >= 0.5, s"recall@8 ${rec.last} suspiciously low")
  }

  // ---- q_attribution ----

  test("multi-touch attribution: linear and U-shaped credits on planted journeys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_attr").toString
    def ev(id: Long, user: Long, t: Long, typ: String) =
      (id, new java.sql.Timestamp(1700000000000L + t * 60000L), user, typ, 1.0, "{}")
    val events = Seq(
      // user 1: view, click -> purchase; trailing view never converts
      ev(1, 1, 1, "view"), ev(2, 1, 2, "click"), ev(3, 1, 3, "purchase"), ev(4, 1, 4, "view"),
      // user 2: click, click, view -> purchase (first/middle/last shape)
      ev(10, 2, 1, "click"), ev(11, 2, 2, "click"), ev(12, 2, 3, "view"), ev(13, 2, 4, "purchase"),
      // user 3: bare purchase earns nothing
      ev(20, 3, 1, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_attribution")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (ct, cl, cp) = out("click")
    assert(ct == 3 && math.abs(cl - 1.166666) < 1e-6 && math.abs(cp - 1.1) < 1e-6,
      s"click: $ct $cl $cp")
    val (vt, vl, vp) = out("view")
    assert(vt == 2 && math.abs(vl - 0.833333) < 1e-6 && math.abs(vp - 0.9) < 1e-6,
      s"view: $vt $vl $vp")
    // total credit distributed == journeys that actually had touches (2)
    assert(math.abs((cl + vl) - 2.0) < 1e-5, s"linear credit must sum to conversions: ${cl + vl}")
    assert(math.abs((cp + vp) - 2.0) < 1e-5, s"position credit must sum to conversions: ${cp + vp}")
  }

  // ---- q_zipf_fit ----

  test("planted perfect power law fits slope -1 with r2 ~ 1; real corpus slope is negative") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zipf").toString
    // frequencies 12, 6, 4 = 12/rank at ranks 1..3 — exactly Zipf(-1);
    // hapax tokens are excluded by the count >= 2 rule
    val words = Seq.fill(12)("w1") ++ Seq.fill(6)("w2") ++ Seq.fill(4)("w3") ++
      Seq("h1", "h2", "h3")
    Seq((1L, words.mkString(" "), "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_zipf_fit")(spark, dir).head()
    assert(r.getLong(0) == 6 && r.getLong(1) == 3, s"types ${r.getLong(0)} fit ${r.getLong(1)}")
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-4, s"slope ${r.getDouble(2)} != -1")
    assert(r.getDouble(4) > 0.9999, s"r2 ${r.getDouble(4)} != 1")
    val real = SparkEntry.queries("q_zipf_fit")(spark, TinyDir).head()
    assert(real.getDouble(2) < 0, "real corpus slope must be negative")
    assert(real.getDouble(4) > 0 && real.getDouble(4) <= 1.0)
    assert(real.getLong(1) <= real.getLong(0))
  }

  // ---- q_curriculum ----

  test("stages partition the corpus into 4 near-equal difficulty-ordered buckets") {
    val docs = sources.Tables.documents(spark, TinyDir)
    val n = docs.count()
    val out = SparkEntry.queries("q_curriculum")(spark, TinyDir).collect()
    assert(out.length == n, s"curriculum covers ${out.length} of $n docs")
    assert(out.map(_.getLong(0)).distinct.length == n, "doc_ids must be unique")
    val byStage = out.groupBy(_.getInt(2)).map { case (s0, rs) => s0 -> rs }
    assert(byStage.keySet == Set(0, 1, 2, 3))
    byStage.foreach { case (s0, rs) =>
      val want = Set(n / 4, (n + 3) / 4)
      assert(want.contains(rs.length.toLong), s"stage $s0 size ${rs.length} not in $want")
      // pos is a permutation of 0..size-1 within the stage
      assert(rs.map(_.getLong(3)).sorted.toSeq == (0L until rs.length.toLong),
        s"stage $s0: pos is not a 0-based permutation")
    }
    // difficulty is monotone across stage boundaries (ties may touch)
    (0 until 3).foreach { s0 =>
      val hi = byStage(s0).map(_.getDouble(1)).max
      val lo = byStage(s0 + 1).map(_.getDouble(1)).min
      assert(hi <= lo, s"stage $s0 max difficulty $hi > stage ${s0 + 1} min $lo")
    }
  }

  test("intra-stage order is the seeded doc_id hash (rerun-stable, looks shuffled)") {
    val a = SparkEntry.queries("q_curriculum")(spark, TinyDir).collect().toSeq
    val b = SparkEntry.queries("q_curriculum")(spark, TinyDir).collect().toSeq
    assert(a == b, "curriculum order must be rerun-stable")
    // within a stage, consecutive pos must follow ascending (xxhash64(doc_id, 17), doc_id)
    val stage0 = a.filter(_.getInt(2) == 0).sortBy(_.getLong(3)).map(_.getLong(0))
    val hk = sources.Tables.documents(spark, TinyDir)
      .select(col("doc_id"), xxhash64(col("doc_id"), lit(17)).as("hk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = stage0.sortBy(id => (hk(id), id))
    assert(stage0.toSeq == want.toSeq, "stage-0 order must be the seeded hash order")
    // and it is not simply doc_id order (the hash actually shuffles)
    assert(stage0.toSeq != stage0.sorted.toSeq, "hash order degenerated to id order")
  }
}
