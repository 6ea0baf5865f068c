package graft

import graft.ops.{CorpusQuality, Dedup}
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** stream_release_gate: the ingest-time release verdicts (quality →
  * dup-of-released-corpus → benchmark leak) are compositional across
  * micro-batch boundaries and follow the q_corpus_release stage order. */
class ReleaseGateStreamSpec extends SparkSpec {

  private val TxtA = "the alpha beta gamma of the delta epsilon zeta and " +
    "the eta theta iota in the kappa lambda mu"
  private val TxtB = "the quick brown fox jumps over the lazy dog and " +
    "the swift red hen runs under a tall green tree"
  private val TxtC = "a shared document that lives in the released corpus " +
    "and in the benchmark suite at the same time somehow"

  test("staged gate verdicts stream compositionally against two frozen indexes") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_relgate").toString
    val (corpusIdx, benchIdx) = (s"$base/corpus_idx", s"$base/bench_idx")
    // released corpus holds TxtA and TxtC; benchmark holds TxtB and TxtC
    Dedup.NearDupIndex.build(
      Seq((1L, TxtA), (2L, TxtC)).toDF("doc_id", "text"), corpusIdx)
    Dedup.NearDupIndex.build(
      Seq((10L, TxtB), (11L, TxtC)).toDF("doc_id", "text"), benchIdx)
    val arriving = Seq(
      (200L, TxtA, "fr", 200L), // quality beats dup: 'lang'
      (201L, TxtA, "en", 200L), // near-dups the released corpus: 'dup'
      (202L, TxtB, "en", 200L), // leaks the benchmark: 'contaminated'
      (203L, TxtC, "en", 200L), // hits BOTH indexes: dup stage wins
      (204L, "a completely unique page about the meadow and the brook " +
        "with nothing in common with anything indexed", "en", 200L))
    val out = java.nio.file.Files.createTempDirectory("relgate_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("relgate_ck").toString
    val mem = MemoryStream[(Long, String, String, Long)]
    val q = StreamingOps.releaseGateSink(
        mem.toDF().toDF("doc_id", "text", "lang", "n_chars"),
        corpusIdx, benchIdx, out)
      .option("checkpointLocation", ckpt).start()
    val (b1, b2) = arriving.partition(_._1 % 2 == 0)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("doc_id", "verdict", "final_keep").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(streamed == Map(
      200L -> ("lang", false),
      201L -> ("dup", false),
      202L -> ("contaminated", false),
      203L -> ("dup", false),
      204L -> ("keep", true)), s"streamed: $streamed")
    // compositional: the streamed union equals the one-shot gate
    val oneShot = CorpusQuality.releaseGate(
        arriving.toDF("doc_id", "text", "lang", "n_chars"),
        Dedup.NearDupIndex.frozenSide(spark, corpusIdx),
        Dedup.NearDupIndex.frozenSide(spark, benchIdx))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(streamed == oneShot, s"one-shot disagrees: $oneShot")
    // regioned exactly-once layout
    val regions = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part=batch_")).map(_.getName).sorted
    assert(regions.length == 2, regions.mkString(","))
  }

  test("empty indexes skip their stages: quality is the only gate left") {
    import spark.implicits._
    val docs = Seq(
      (300L, TxtA, "en", 200L), (301L, TxtA, "fr", 200L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = CorpusQuality.releaseGate(docs, None, None)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(out == Map(300L -> ("keep", true), 301L -> ("lang", false)), s"$out")
  }
}
