package graft

import graft.ops.PipelineOps3
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PipelineOps3Spec extends SparkSpec {

  test("leakage-safe split: a near-dup component never spans train and eval") {
    val out = PipelineOps3.qSplitLeakageSafe.fn(spark, TinyDir)
    val spanning = out.groupBy("component")
      .agg(countDistinct(col("split")).as("nsplits"))
      .filter(col("nsplits") > 1)
    assert(spanning.isEmpty, "component assigned to both splits")
    // both sides populated, ratio near 80/20 at this corpus size
    val n = out.count().toDouble
    val train = out.filter(col("split") === "train").count().toDouble
    assert(train > 0.6 * n && train < 0.95 * n, s"train share ${train / n}")
  }

  test("leakage-safe split agrees with qDedupClusterPick components") {
    val split = PipelineOps3.qSplitLeakageSafe.fn(spark, TinyDir)
      .select(col("doc_id"), col("component")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pick = graft.operators.GraphOps2.qDedupClusterPick.fn(spark, TinyDir)
      .select(col("doc_id"), col("survivor_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(split == pick)
  }

  test("distributed exclusive prefix sum equals the single-window form") {
    val t = graft.sources.Tables.documents(spark, SmallDir)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("tokens"))
    val dist = PipelineOps3.exclusivePrefixSum(t, "source", "doc_id", "tokens", 7)
      .select("doc_id", "pre").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val plain = t.withColumn("pre", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select("doc_id", "pre").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == plain)
  }

  test("shard plan: shards are budget-bounded and cover every doc exactly once") {
    val plan = PipelineOps3.qShardPlan.fn(spark, TinyDir).collect()
    val docs = graft.sources.Tables.documents(spark, TinyDir).count()
    assert(plan.map(_.getAs[Long]("n_docs")).sum == docs)
    // every shard except a source's last must have crossed the budget
    // threshold by at most one doc's tokens; all are non-empty
    plan.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
    }
    // shard ids are dense from 0 within each source
    plan.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("shard_id")).sorted.toSeq
      assert(ids == (0L until ids.length))
    }
  }

  test("batch pack: batches capped at 16, bucket-homogeneous, waste consistent") {
    val plan = PipelineOps3.qBatchPack.fn(spark, TinyDir).collect()
    val docs = graft.sources.Tables.documents(spark, TinyDir).count()
    assert(plan.map(_.getAs[Long]("n_docs")).sum == docs)
    plan.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(n >= 1 && n <= 16)
      // waste is exactly n*max - sum, and max token spread stays inside
      // the bucket width (32)
      assert(r.getAs[Long]("pad_waste") ==
        n * r.getAs[Long]("max_tokens") - r.getAs[Long]("sum_tokens"))
      assert(r.getAs[Long]("pad_waste") < n * 32)
    }
  }

  test("corpus export composes consistently with its standalone stages") {
    val manifest = PipelineOps3.qCorpusExport.fn(spark, TinyDir).collect()
    // token totals must match recomputing the stages independently
    val docs = graft.sources.Tables.documents(spark, TinyDir)
      .select(col("doc_id"), col("source"),
        trim(regexp_replace(regexp_replace(lower(col("text")), "[\\x00-\\x1F]", ""), " +", " ")).as("t"))
    val surv = docs.groupBy(md5(col("t"))).agg(min("doc_id").as("doc_id")).select("doc_id")
    val kept = docs.join(surv, "doc_id")
      .withColumn("tokens", size(split(col("t"), " ")).cast("long"))
      .filter(col("tokens").between(5, 5000))
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == kept.count())
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum ==
      kept.agg(sum("tokens")).head.getLong(0))
    manifest.foreach(r => assert(r.getAs[Long]("n_docs") > 0))
  }

  test("gramian-agg PCA matches brute-force driver PCA") {
    import graft.functions.GramianAgg
    val vecs = graft.sources.Tables.embeddings(spark, TinyDir)
      .select(col("embedding").cast("array<double>").as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val dim = vecs.head.length
    val n = vecs.length.toDouble
    // brute force: mean + covariance + power iteration, all on the driver
    val mean = Array.tabulate(dim)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j))
    val (eigRef, pcRef) = GramianAgg.powerIteration(cov)
    val got = ops.PipelineOps3.qPcaEmbed.fn(spark, TinyDir).collect()
      .sortBy(_.getAs[Long]("pos"))
    assert(got.length == dim)
    got.foreach { r =>
      val i = r.getAs[Long]("pos").toInt
      assert(math.abs(r.getAs[Double]("pc1_loading") - pcRef(i)) < 1e-4,
        s"loading at $i: ${r.getAs[Double]("pc1_loading")} vs ${pcRef(i)}")
      assert(math.abs(r.getAs[Double]("eigval") - eigRef) < 1e-3)
    }
    // eigenpair residual on the distributed covariance: ||Cv - λv|| small
    val eig = got.head.getAs[Double]("eigval")
    val v = got.map(_.getAs[Double]("pc1_loading"))
    val resid = (0 until dim).map { i =>
      val cv = (0 until dim).map(j => cov(i)(j) * v(j)).sum
      math.pow(cv - eig * v(i), 2)
    }.sum
    assert(math.sqrt(resid) < 1e-3, s"residual ${math.sqrt(resid)}")
    val share = got.head.getAs[Double]("var_share")
    assert(share > 0.0 && share <= 1.0)
  }

  test("linear probe recovers an exact linear relationship") {
    import spark.implicits._
    // y = 2*x0 - 3*x1 + 1 exactly; with near-zero ridge the probe must
    // recover the generating weights and R² ≈ 1
    val rows = (0 until 60).map { i =>
      val x0 = (i % 7).toDouble; val x1 = (i % 5).toDouble
      (Seq(x0, x1), 2.0 * x0 - 3.0 * x1 + 1.0)
    }
    val df = rows.toDF("x", "y")
    val got = ops.PipelineOps3.linearProbe(df, lambda = 1e-9).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("w_000") - 2.0) < 1e-4, s"w0 ${got("w_000")}")
    assert(math.abs(got("w_001") + 3.0) < 1e-4, s"w1 ${got("w_001")}")
    assert(math.abs(got("intercept") - 1.0) < 1e-4, s"b ${got("intercept")}")
    assert(got("r2") > 0.9999, s"r2 ${got("r2")}")
  }

  test("linear probe on real embeddings: bounded R², partition-invariant, matches driver solve") {
    import graft.functions.GramianAgg
    val base = graft.sources.Tables.embeddings(spark, TinyDir)
      .select(col("embedding").cast("array<double>").as("x"),
        col("label").cast("double").as("y"))
    val one = ops.PipelineOps3.linearProbe(base.coalesce(1), 1e-3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val many = ops.PipelineOps3.linearProbe(base.repartition(8), 1e-3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(one.keySet == many.keySet)
    one.foreach { case (k, v) =>
      assert(math.abs(v - many(k)) < 1e-5, s"$k drifts across partitionings: $v vs ${many(k)}")
    }
    val r2 = one("r2")
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2")
    // independent driver-side solve over collected rows
    val data = base.collect().map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
    val dim = data.head._1.length
    val n = data.length.toDouble
    val mx = Array.tabulate(dim)(i => data.map(_._1(i)).sum / n)
    val my = data.map(_._2).sum / n
    val covXX = Array.tabulate(dim, dim)((i, j) =>
      data.map(d => d._1(i) * d._1(j)).sum / n - mx(i) * mx(j) +
        (if (i == j) 1e-3 else 0.0))
    val covXy = Array.tabulate(dim)(i => data.map(d => d._1(i) * d._2).sum / n - mx(i) * my)
    val wRef = GramianAgg.solve(covXX, covXy)
    (0 until dim).foreach { i =>
      assert(math.abs(one(f"w_$i%03d") - wRef(i)) < 1e-4,
        s"w_$i: ${one(f"w_$i%03d")} vs ${wRef(i)}")
    }
  }
}
