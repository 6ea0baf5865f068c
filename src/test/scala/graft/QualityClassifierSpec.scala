package graft

import org.apache.spark.sql.functions._

/** q_quality_classifier semantics (β values oracle-pinned; this pins
  * the METHOD: separable recovery, labeling rule, invariance). */
class QualityClassifierSpec extends SparkSpec {

  private lazy val plantedDir: String = {
    // en docs speak one vocabulary, the rest another — linearly
    // separable in hashed-unigram space
    val dir = java.nio.file.Files.createTempDirectory("graft_qc").toString
    import spark.implicits._
    val en = (0 until 10).map(i =>
      (i.toLong, "alpha beta gamma alpha delta beta", "en", s"src$i", 32L))
    val other = (0 until 10).map(i =>
      (100L + i, "zeta eta theta iota zeta eta", if (i % 2 == 0) "de" else "fr", s"src$i", 28L))
    (en ++ other).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("separable planted corpus: every doc classified correctly with confident scores") {
    val out = SparkEntry.queries("q_quality_classifier")(spark, plantedDir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (id, score, pred, label) =
        (r.getLong(0), r.getDouble(1), r.getInt(2), r.getInt(3))
      assert(pred == label, s"doc $id: pred $pred != label $label (score $score)")
      if (label == 1) assert(score > 0.8, s"doc $id: en score $score not confident")
      else assert(score < 0.2, s"doc $id: non-en score $score not confident")
    }
  }

  test("real tiny corpus: every doc scored once, labels mirror lang='en', scores in [0,1]") {
    val docs = sources.Tables.documents(spark, TinyDir)
    val langs = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("q_quality_classifier")(spark, TinyDir).collect()
    assert(out.length == langs.size)
    out.foreach { r =>
      assert(r.getInt(3) == (if (langs(r.getLong(0)) == "en") 1 else 0))
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
    // the classifier must beat the trivial all-negative baseline on its
    // own training set (weak but structural: hashed features carry signal)
    val acc = out.count(r => r.getInt(2) == r.getInt(3)).toDouble / out.length
    val base = out.count(_.getInt(3) == 0).toDouble / out.length
    assert(acc >= base, s"train accuracy $acc below the majority baseline $base")
  }

  test("scoring is partition-invariant") {
    val a = SparkEntry.queries("q_quality_classifier")(spark, TinyDir).collect().toSeq
    val b = withConf("spark.sql.shuffle.partitions" -> "7") {
      SparkEntry.queries("q_quality_classifier")(spark, TinyDir).collect().toSeq
    }
    assert(a == b)
  }
}
