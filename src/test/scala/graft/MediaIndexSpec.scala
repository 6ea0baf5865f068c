package graft

import graft.ops.Multimodal.AudioCodec
import graft.sources.MediaIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** sink_media_index + stream_media_screen: frozen reference signatures,
  * ingest-time perceptual screening for images and audio — re-encoded /
  * shifted copies of reference items flag, fresh content passes, corrupt
  * payloads match nothing, streamed union == one-shot. */
class MediaIndexSpec extends SparkSpec {

  private def img(seed: Int, bright: Int = 0): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = im.createGraphics()
    try {
      g.setColor(new java.awt.Color(40 + bright, 40 + bright, 40 + bright))
      g.fillRect(0, 0, 32, 32)
      g.setColor(java.awt.Color.WHITE)
      g.fillRect((seed % 4) * 8, (seed / 4 % 2) * 16, 8, 16)
    } finally g.dispose()
    graft.ops.Multimodal.ImageCodec.encodePng(im)
  }

  private def clip(f0: Double): Array[Double] = {
    val freqs = (0 until 12).map(i => f0 * math.pow(1.45, i))
    Array.tabulate(4000) { t =>
      freqs.zipWithIndex.map { case (f, i) =>
        (1.0 - 0.05 * i) * math.sin(2 * math.Pi * f * t / 8000.0)
      }.sum / 14.0
    }
  }

  test("image screen: brightness-shifted copy of a reference flags, fresh image passes, corrupt matches nothing") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mediaidx").toString
    MediaIndex.buildImages(
      Seq((1L, img(0)), (2L, img(5))).toDF("doc_id", "payload"),
      "doc_id", "payload", root)
    val batch = Seq(
      (100L, img(0, bright = 6)),                              // near-copy of ref 1
      (101L, img(3)),                                          // fresh content
      (102L, Array.tabulate[Byte](200)(i => (i * 7).toByte)))  // corrupt
      .toDF("doc_id", "payload")
    val hits = MediaIndex.screenImages(spark, root, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((100L, 1L)), s"shifted copy must flag: $hits")
    assert(!hits.exists(_._1 == 101L), s"fresh image must pass: $hits")
    assert(!hits.exists(_._1 == 102L))
  }

  test("audio screen streams: volume-shifted copy flags per micro-batch, streamed == one-shot") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.streaming.FrozenSides.clear()
    val root = java.nio.file.Files.createTempDirectory("graft_mediaaud").toString
    MediaIndex.buildAudio(
      Seq((7L, AudioCodec.encodeWav(clip(120.0), 8000f))).toDF("doc_id", "payload"),
      "doc_id", "payload", root)
    val arriving = Seq(
      (200L, AudioCodec.encodeWav(clip(120.0).map(_ * 0.3), 8000f)), // volume-shifted copy
      (201L, AudioCodec.encodeWav(clip(190.0), 8000f)),              // different material
      (202L, Array.tabulate[Byte](300)(i => (i * 11).toByte)))       // corrupt
    val out = s"$root/out"
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.StreamingOps.mediaScreenSink(
        mem.toDF().toDF("doc_id", "payload"), root, out, "audio")
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData(arriving.take(1): _*); q.processAllAvailable()
      mem.addData(arriving.drop(1): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("doc_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == Set((200L, 7L)), s"streamed: $streamed")
    val oneShot = MediaIndex.screenAudio(spark, root, arriving.toDF("doc_id", "payload"))
      .select("doc_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == oneShot)
  }

  /** A 32×32 video frame: white rect at a k-dependent position; `wide`
    * flips the rect's aspect so a "fresh" clip shares no frame image
    * with a reference clip at any k. */
  private def vframe(k: Int, wide: Boolean = false): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.DARK_GRAY)
      g.fillRect(0, 0, 32, 32)
      g.setColor(java.awt.Color.WHITE)
      if (wide) g.fillRect((k * 5) % 16, (k * 7) % 24, 16, 8)
      else g.fillRect((k * 5) % 24, (k * 7) % 16, 8, 16)
    } finally g.dispose()
    img
  }

  private def vclip(ks: Seq[Int], wide: Boolean = false, lead: Int = 0): Array[Byte] = {
    val black = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    graft.ops.Multimodal.VideoCodec.encodeAviMjpeg(
      Seq.fill(lead)(black) ++ ks.map(vframe(_, wide)),
      quality = if (wide) 0.92f else 0.8f)
  }

  test("video screen: a head-trimmed re-encoded copy flags with the modal offset; fresh clip passes; corrupt quarantined") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mediavid").toString
    MediaIndex.buildVideo(
      Seq((9L, vclip(0 until 10))).toDF("doc_id", "payload"),
      "doc_id", "payload", root)
    val batch = Seq(
      (300L, vclip(2 until 10)),                               // head-trimmed copy
      (301L, vclip(0 until 10, wide = true)),                  // fresh material
      (302L, Array.tabulate[Byte](400)(i => (i * 53).toByte))) // corrupt
      .toDF("doc_id", "payload")
    val rows = MediaIndex.screenVideo(spark, root, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val hit = rows.filter(t => t._1 == 300L)
    assert(hit.length == 1 && hit.head._2 == 9L,
      s"trimmed copy must flag against the reference: ${rows.mkString(",")}")
    assert(hit.head._5 == -2L, s"modal offset must recover the 2-frame trim: ${hit.head}")
    assert(hit.head._4 >= 0.8)
    assert(!rows.exists(_._1 == 301L), s"fresh clip must pass: ${rows.mkString(",")}")
    assert(!rows.exists(_._1 == 302L), "corrupt payload matches nothing")
  }

  test("video screen streams; an ATOMIC republish of the signature set is picked up on the next batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.streaming.FrozenSides.clear()
    val root = java.nio.file.Files.createTempDirectory("graft_mediavid2").toString
    MediaIndex.buildVideo(
      Seq((9L, vclip(0 until 10))).toDF("doc_id", "payload"),
      "doc_id", "payload", root)
    // ref B and its copy use the `wide` frame family: the tall family's
    // positions repeat with period 48, so a tall k=52 frame would EQUAL
    // ref A's k=4 frame and falsely flag in batch 1
    val copyA = vclip(2 until 10)                             // trimmed copy of ref A
    val copyB = vclip(Seq(52, 53, 54, 55, 56), wide = true)   // subsequence of the LATER ref B
    val out = s"$root/out"
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.StreamingOps.mediaScreenSink(
        mem.toDF().toDF("doc_id", "payload"), root, out, "video")
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData((400L, copyA), (401L, copyB)); q.processAllAvailable()
      // REPUBLISH: reference set B replaces A atomically (same sig root)
      MediaIndex.buildVideo(
        Seq((10L, vclip(50 until 60, wide = true))).toDF("doc_id", "payload"),
        "doc_id", "payload", root)
      mem.addData((402L, copyA), (403L, copyB)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .select("doc_id", "index_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 1 screens against A: the A-copy flags, the B-copy passes;
    // batch 2 (after the republish) against B: roles swap
    assert(streamed == Set((400L, 9L), (403L, 10L)), s"streamed: $streamed")
  }
}
