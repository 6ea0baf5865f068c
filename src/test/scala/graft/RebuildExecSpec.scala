package graft

import graft.operators.ReleaseOps
import graft.operators.ReleaseOps.Artifact
import graft.sources.{Tables => T}
import org.apache.spark.sql.functions._

/** The rebuild plan, executed (SURVEY.md §2.1 sink_rebuild): stale
  * artifacts are rewritten with a ledger row each; artifacts whose
  * dependencies did not change keep their exact bytes — the zero-I/O
  * guarantee that makes selective rebuild worth having at 100 TB. */
class RebuildExecSpec extends SparkSpec {

  private def snap(dir: String): Map[String, (Long, Long)] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile)
      .map(f => f.getName -> (f.length, f.lastModified)).toMap
  }

  test("selective rebuild: stale artifacts rewritten + ledgered, fresh ones byte-untouched") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild")
      .toFile.getAbsolutePath
    val docs = T.documents(spark, TinyDir)
    val artifacts = Seq(
      Artifact("art_idle", Seq("src6", "src7"),
        df => df.filter(col("source").isin("src6", "src7"))
          .groupBy("source").agg(count(lit(1)).as("n")).orderBy("source")),
      Artifact("art_core", Seq("src0", "src1", "src2", "src16"),
        df => df.filter(col("source").isin("src0", "src1", "src2", "src16"))
          .select("doc_id", "source", "n_chars").orderBy("doc_id")),
      Artifact("art_stats", Seq("src5", "src6"),
        df => df.filter(col("source").isin("src5", "src6"))
          .groupBy("source").agg(sum(col("n_chars")).as("chars"))
          .orderBy("source")))

    // bootstrap load: no prior state, everything is stale by definition
    val bootstrap = artifacts.flatMap(_.deps).distinct.toDF("dataset")
      .withColumn("kind", lit("added"))
    val first = ReleaseOps.rebuildChanged(docs, artifacts, bootstrap,
      s"$tmp/out", s"$tmp/prov", loadedAtUs = 1L)
    assert(first.values.forall(identity), "bootstrap must build everything")
    val idleBefore = snap(s"$tmp/out/art_idle")
    assert(idleBefore.nonEmpty)

    Thread.sleep(1100) // make any rewrite visible in mtimes

    // the release lands: src5 removed, src0-2 lose rows, src16 added —
    // src6/src7 (art_idle's whole dependency set) untouched
    val diff = ReleaseOps.releaseDiffKinds(spark, TinyDir)
    val second = ReleaseOps.rebuildChanged(docs, artifacts, diff,
      s"$tmp/out", s"$tmp/prov", loadedAtUs = 2L)
    assert(second("art_core") && second("art_stats"),
      s"stale artifacts not rebuilt: $second")
    assert(!second("art_idle"), "fresh artifact needlessly rebuilt")

    // zero I/O on the fresh artifact: identical names, lengths, mtimes
    assert(snap(s"$tmp/out/art_idle") == idleBefore,
      "art_idle bytes were touched by a no-op rebuild")

    // ledger: 3 bootstrap rows, then exactly the 2 rebuilt artifacts
    val ledger = spark.read.parquet(s"$tmp/prov")
    assert(ledger.filter(col("loaded_at_us") === 1L).count() == 3)
    val round2 = ledger.filter(col("loaded_at_us") === 2L)
      .select("dataset").collect().map(_.getString(0)).toSet
    assert(round2 == Set("art_core", "art_stats"), s"ledger round 2: $round2")

    // a rebuilt artifact's persisted content equals a fresh build
    val persisted = spark.read.parquet(s"$tmp/out/art_stats")
      .collect().map(_.toSeq).toSet
    val fresh = artifacts(2).build(docs).collect().map(_.toSeq).toSet
    assert(persisted == fresh)
  }
}
