package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev utility: scaling rehearsal for the MEDIA + GRAPH-BUNDLE paths
  * (VERDICT r13 #6 — these are absent from the query bench because their
  * inputs are binary payloads or persisted artifacts, not the sf tables).
  * Generates deterministic synthetic payloads IN EXECUTORS (real PNG/WAV/
  * AVI encodes — the decode legs then do real work), builds a MediaIndex
  * from a fixed 50-item reference set, and times each signature scan and
  * screen at two batch sizes; plus GraphBundle build/search at the given
  * sf dir. Prints `MEDIABENCH <name> n=<rows> secs=<s>` rows — the
  * exponent between sizes is the scaling evidence for PLANS.md. */
object MediaBench {

  private val payloadSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  private def png(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.DARK_GRAY); g.fillRect(0, 0, 32, 32)
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(((id * 5) % 24).toInt, ((id * 7) % 16).toInt, 8, 16)
    } finally g.dispose()
    graft.ops.Multimodal.ImageCodec.encodePng(img)
  }

  private def wav(id: Long): Array[Byte] = {
    val f0 = 100.0 + (id % 97) * 7.0
    val samples = Array.tabulate(4000)(t =>
      math.sin(2 * math.Pi * f0 * t / 8000.0) * 0.6 +
        math.sin(2 * math.Pi * f0 * 1.5 * t / 8000.0) * 0.3)
    graft.ops.Multimodal.AudioCodec.encodeWav(samples, 8000f)
  }

  private def avi(id: Long): Array[Byte] = {
    val frames = (0 until 6).map { f =>
      val img = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        g.setColor(java.awt.Color.DARK_GRAY); g.fillRect(0, 0, 32, 32)
        g.setColor(java.awt.Color.WHITE)
        g.fillRect((((id + f) * 5) % 24).toInt, (((id + f) * 7) % 16).toInt, 8, 16)
      } finally g.dispose()
      img
    }
    graft.ops.Multimodal.VideoCodec.encodeAviMjpeg(frames)
  }

  private def payloads(spark: SparkSession, n: Long,
                       gen: Long => Array[Byte]): DataFrame = {
    val enc = RowEncoder.encoderFor(payloadSchema)
    spark.range(n).repartition(32)
      .mapPartitions(_.map(id => Row(id, gen(id))))(enc)
  }

  private def time[A](name: String, n: Long)(work: => A): A = {
    val t0 = System.nanoTime()
    val out = work
    println(f"MEDIABENCH $name n=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val spark = GraftSession.builder("graft-mediabench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft_mediabench").toString

    // frozen reference sets: 50 items per modality
    graft.sources.MediaIndex.buildImages(payloads(spark, 50, png), "doc_id", "payload", root)
    graft.sources.MediaIndex.buildAudio(payloads(spark, 50, wav), "doc_id", "payload", root)
    graft.sources.MediaIndex.buildVideo(payloads(spark, 50, avi), "doc_id", "payload", root)

    for (n <- Seq(1000L, 10000L)) {
      val imgs = payloads(spark, n, png).localCheckpoint(true) // exclude generator encode cost
      val auds = payloads(spark, n, wav).localCheckpoint(true)
      val avis = payloads(spark, n, avi).localCheckpoint(true)
      time("image_signature_scan", n)(
        graft.ops.Multimodal.imageSignatures(imgs, "doc_id", "payload").count())
      time("audio_signature_scan", n)(
        graft.ops.Multimodal.audioSignatures(auds, "doc_id", "payload").count())
      time("video_frame_signature_scan", n)(
        graft.ops.Multimodal.videoFrameSignatures(avis, "doc_id", "payload").count())
      time("image_screen", n)(
        graft.sources.MediaIndex.screenImages(spark, root, imgs).count())
      time("audio_screen", n)(
        graft.sources.MediaIndex.screenAudio(spark, root, auds).count())
      time("video_screen", n)(
        graft.sources.MediaIndex.screenVideo(spark, root, avis).count())
    }

    // graph bundle: build (NN-Descent + entry picks + atomic publish) and
    // warm search against the sf dir's embeddings
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(true)
    val nVec = vecs.count()
    val bundle = s"$root/bundle"
    time("graph_bundle_build", nVec)(
      graft.sources.GraphBundle.build(vecs, bundle))
    val probes = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    time("graph_bundle_search_cold", nVec)(
      graft.sources.GraphBundle.search(spark, bundle, probes).count())
    time("graph_bundle_search_warm", nVec)(
      graft.sources.GraphBundle.search(spark, bundle, probes).count())
    spark.stop()
  }
}
