package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.VideoCodec
import org.apache.spark.sql.functions._

/** Real video container leg: MJPEG-in-AVI RIFF parse, per-frame ImageIO
  * decode + aHash, frame-aligned near-dup. Planted contract (the audio
  * leg's, applied to video): re-encoded copies pair, different clips
  * don't, corrupt payloads quarantined, shared flat lead-ins don't pair
  * two different clips. */
class VideoDedupSpec extends SparkSpec {

  /** A deterministic 8-frame 32×32 clip: a bright block orbits with
    * phase `phase`; `shade` shifts global brightness (re-encode + small
    * pixel perturbations are what JPEG quality changes inject). */
  private def clip(phase: Int, leadIn: Int = 0): Seq[java.awt.image.BufferedImage] = {
    val black = {
      val i = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      i
    }
    val moving = (0 until 8).map { f =>
      val img = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        g.setColor(java.awt.Color.DARK_GRAY)
        g.fillRect(0, 0, 32, 32)
        g.setColor(java.awt.Color.WHITE)
        val pos = (f + phase) % 8
        g.fillRect((pos % 4) * 8, (pos / 4) * 16, 8, 16)
      } finally g.dispose()
      img
    }
    Seq.fill(leadIn)(black) ++ moving
  }

  test("decodeFrames: container roundtrip recovers every frame as a decodable JPEG") {
    val avi = VideoCodec.encodeAviMjpeg(clip(0), quality = 0.9f)
    val Some(frames) = VideoCodec.decodeFrames(avi)
    assert(frames.size == 8)
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 32 && img.getHeight == 32)
    }
    assert(VideoCodec.decodeFrames(Array.tabulate[Byte](300)(i => (i * 31).toByte)).isEmpty)
    // truncated container: RIFF header intact, chunk body cut — quarantined
    assert(VideoCodec.decodeFrames(avi.take(avi.length / 2)).isEmpty ||
      VideoCodec.decodeFrames(avi.take(avi.length / 2)).exists(_.nonEmpty == false))
  }

  test("interleaved AVIs ('rec ' lists inside movi, the ffmpeg layout with audio) decode every frame") {
    // rebuild a plain MJPEG AVI into the interleaved shape: each 00dc
    // chunk wrapped in its own LIST 'rec ' group
    val plain = VideoCodec.encodeAviMjpeg(clip(0))
    val Some(frames) = VideoCodec.decodeFrames(plain)
    val bb = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff)
      bb.write((v >> 16) & 0xff); bb.write((v >> 24) & 0xff) }
    def tag(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    val recs = frames.map(f => 8 + 4 + 8 + f.length + (f.length & 1)) // LIST+rec+00dc+pad
    val moviBody = 4 + recs.sum
    val hdrlBody = 4 + 8 + 14 * 4
    tag("RIFF"); w32(4 + 8 + hdrlBody + 8 + moviBody); tag("AVI ")
    tag("LIST"); w32(hdrlBody); tag("hdrl")
    tag("avih"); w32(14 * 4); (0 until 14).foreach(_ => w32(0))
    tag("LIST"); w32(moviBody); tag("movi")
    frames.foreach { f =>
      tag("LIST"); w32(4 + 8 + f.length + (f.length & 1)); tag("rec ")
      tag("00dc"); w32(f.length); bb.write(f)
      if ((f.length & 1) == 1) bb.write(0)
    }
    val Some(got) = VideoCodec.decodeFrames(bb.toByteArray)
    assert(got.size == frames.size,
      s"rec-interleaved AVI must yield all ${frames.size} frames, got ${got.size}")
    assert(got.zip(frames).forall { case (a, b) => java.util.Arrays.equals(a, b) })
  }

  test("planted near-dups: a JPEG re-encode pairs, different material does not, corrupt quarantined") {
    import spark.implicits._
    val rows = Seq(
      (0L, VideoCodec.encodeAviMjpeg(clip(0), quality = 0.92f)),  // original
      (1L, VideoCodec.encodeAviMjpeg(clip(0), quality = 0.5f)),   // lossy re-encode
      (2L, VideoCodec.encodeAviMjpeg(clip(3), quality = 0.92f)),  // different material
      (3L, Array.tabulate[Byte](400)(i => (i * 61).toByte)))      // corrupt
    val df = rows.toDF("doc_id", "payload")
    val sigs = Multimodal.videoFrameSignatures(df, "doc_id", "payload").collect()
    val byDoc = sigs.groupBy(_.getLong(0))
    assert(byDoc(3L).forall(r => !r.getBoolean(5) && r.getLong(1) == -1L),
      "corrupt payload must emit one flagged row")
    assert(byDoc(0L).count(_.getBoolean(5)) == 8, "all 8 frames decode")

    val pairs = Multimodal.videoNearDupPairs(df, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"JPEG re-encode must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"different material must not pair: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("flat lead-in frames cannot pair two different clips") {
    import spark.implicits._
    // both clips open with 6 black frames; the moving content differs
    val df = Seq(
      (0L, VideoCodec.encodeAviMjpeg(clip(0, leadIn = 6))),
      (1L, VideoCodec.encodeAviMjpeg(clip(3, leadIn = 6)))).toDF("doc_id", "payload")
    val pairs = Multimodal.videoNearDupPairs(df, "doc_id", "payload").collect()
    assert(pairs.isEmpty,
      s"shared black lead-in must not pair different clips: ${pairs.mkString(",")}")
    // the OFFSET-TOLERANT form keeps the same guard: flat frames are
    // excluded before banding, so the shared lead-in votes for nothing
    val offs = Multimodal.videoNearDupPairsOffset(df, "doc_id", "payload").collect()
    assert(offs.isEmpty,
      s"shared black lead-in must not pair under the offset vote: ${offs.mkString(",")}")
  }

  test("offset vote: a lead-in-shifted re-encode pairs where the aligned key pairs nothing (VERDICT r13 #2)") {
    import spark.implicits._
    val df = Seq(
      (0L, VideoCodec.encodeAviMjpeg(clip(0), quality = 0.92f)),
      // the SAME material behind a 2-frame black lead-in, lossily
      // re-encoded — a trimmed/offset copy: no (frame_idx, band) key
      // survives the shift, but every content frame matches at delta −2
      (1L, VideoCodec.encodeAviMjpeg(clip(0, leadIn = 2), quality = 0.7f)),
      (2L, VideoCodec.encodeAviMjpeg(clip(3), quality = 0.92f))) // different material
      .toDF("doc_id", "payload")
    val aligned = Multimodal.videoNearDupPairs(df, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!aligned.contains((0L, 1L)),
      s"the frame-ALIGNED key cannot see a 2-frame shift (that is the gap): $aligned")
    val rows = Multimodal.videoNearDupPairsOffset(df, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val hit = rows.filter(t => t._1 == 0L && t._2 == 1L)
    assert(hit.length == 1, s"shifted copy must pair under the offset vote: ${rows.mkString(",")}")
    assert(hit.head._5 == -2L, s"modal delta must recover the 2-frame lead-in: ${hit.head}")
    assert(hit.head._4 >= 0.8, s"all content frames match at the modal delta: ${hit.head}")
    assert(!rows.exists(t => t._1 == 2L || t._2 == 2L),
      s"different material must not pair: ${rows.mkString(",")}")
  }

  test("offset self-join volume guard fails loud when the hash distribution degenerates") {
    import spark.implicits._
    val df = Seq(
      (0L, VideoCodec.encodeAviMjpeg(clip(0))),
      (1L, VideoCodec.encodeAviMjpeg(clip(0, leadIn = 2), quality = 0.7f)))
      .toDF("doc_id", "payload")
    val e = intercept[IllegalArgumentException] {
      Multimodal.videoNearDupPairsOffset(df, "doc_id", "payload",
        maxCandidateVolume = 1L)
    }
    assert(e.getMessage.contains("stride") && e.getMessage.contains("screenVideo"),
      s"the volume guard must name the remedies: ${e.getMessage}")
  }
}
