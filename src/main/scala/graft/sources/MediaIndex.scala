package graft.sources

import graft.ops.Multimodal
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MEDIA-SIGNATURE index + ingest-time screen — the
  * [[SpanIndex]] decontamination orientation applied to the non-text
  * modalities: a curated reference set (blocked imagery, licensed audio,
  * benchmark figure/video clips) is signatured ONCE at publish time;
  * every later crawl batch screens its decodable payloads against the
  * frozen signatures without re-reading the reference media. The index is
  * reference-set-sized by construction (one row per reference item — per
  * sampled frame for video), so the screen side BROADCASTS and an
  * arriving corpus never shuffles.
  *
  * Signatures are the dedup legs' perceptual hashes — images:
  * aHash+dHash (re-encodes/resizes/brightness shifts match), audio: the
  * gain-invariant 64-band spectral fingerprint, video: per-frame aHash —
  * matched at hamming ≤ 3 via the same 4×16-bit pigeonhole-lossless
  * banding, with the same degenerate guards (flat images must also agree
  * on mean luma, flat audio on duration; flat video frames are excluded
  * outright). Video matching is OFFSET-TOLERANT (VERDICT r13 #2): frames
  * key by (band, bval) alone and a modal frame-delta vote recovers the
  * temporal alignment, so a trimmed or ±k-frame-shifted copy of a
  * reference clip still flags. Screening is per-payload against a frozen
  * set, so it is COMPOSITIONAL: micro-batching never changes a payload's
  * verdict — the streaming sink unions to exactly the one-shot screen.
  *
  * Each signature set PUBLISHES ATOMICALLY (ADVICE r13): the build
  * stages under `<sig dir>_next` and lands via [[AtomicSwap.commit]]
  * under the sig dir's [[WriterLease]], and readers resolve
  * [[AtomicSwap.live]] — a republish concurrent with a screening batch
  * can never serve a torn signature set. Each modality's sig dir is its
  * own swap root, so modalities republish independently. */
object MediaIndex {

  private def publishSigs(sigRoot: String, sigs: DataFrame): Unit = {
    val spark = sigs.sparkSession
    WriterLease.ensure(spark, sigRoot, "media_index_publish")
    val cur = new Path(sigRoot)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = AtomicSwap.nextOf(cur)
    fs.delete(next, true) // stale staging from a crashed publish
    sigs.write.mode("overwrite").parquet(next.toString)
    AtomicSwap.commit(fs, cur)
  }

  /** The signature set a reader serves from: the live swap root of the
    * modality's sig dir (or the dir itself for a pre-swap layout). */
  private[graft] def liveSigRoot(spark: SparkSession, sigDir: String): String = {
    val p = new Path(sigDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.live(fs, p).map(_.toString).getOrElse(sigDir)
  }

  private def readSigs(spark: SparkSession, sigDir: String): DataFrame =
    spark.read.parquet(liveSigRoot(spark, sigDir))

  def buildImages(refs: DataFrame, idCol: String, binCol: String, path: String): Unit =
    publishSigs(s"$path/img_sigs",
      Multimodal.imageSignatures(refs, idCol, binCol)
        .filter(col("decoded")).drop("decoded"))

  def buildAudio(refs: DataFrame, idCol: String, binCol: String, path: String): Unit =
    publishSigs(s"$path/aud_sigs",
      Multimodal.audioSignatures(refs, idCol, binCol)
        .filter(col("decoded")).drop("decoded"))

  /** Video reference signatures: one row per NON-FLAT sampled frame
    * (doc_id, frame_idx, ahash, nf) — nf is the clip's non-flat frame
    * count, persisted so the screen's frac denominator never re-reads
    * the reference media. */
  def buildVideo(refs: DataFrame, idCol: String, binCol: String, path: String,
                 stride: Int = 1): Unit = {
    val sig = Multimodal.videoFrameSignatures(refs, idCol, binCol, stride)
      .filter(col("decoded") && !col("flat"))
      .select(col("doc_id"), col("frame_idx"), col("ahash"))
      .localCheckpoint(true) // decode once: feeds rows AND the nf counts
    val nf = sig.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    publishSigs(s"$path/vid_sigs", sig.join(nf, "doc_id"))
  }

  private def bandCols(hash: org.apache.spark.sql.Column) =
    explode(array((0 until 4).map(j =>
      struct(lit(j).as("band"),
        shiftright(hash, 16 * j).bitwiseAND(lit(65535L)).as("bval"))): _*)).as("x")

  /** ONE explode over the 8-slot band space (aHash bands 0-3, dHash
    * bands 4-7) — the [[Multimodal.imageNearDupPairs]] shape: a
    * two-branch union would re-execute the ImageIO decode per branch. */
  private def bandCols2(a: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
    explode(array((for (h <- 0 until 2; j <- 0 until 4) yield
      struct(lit(h * 4 + j).as("band"),
        shiftright(if (h == 0) a else d, 16 * j)
          .bitwiseAND(lit(65535L)).as("bval"))): _*)).as("x")

  /** Image screen: (doc_id, index_id, hamming) for every arriving
    * payload within hamming ≤ `maxDist` of a reference image on EITHER
    * perceptual hash. Corrupt payloads decode to nothing and match
    * nothing (count them via [[Multimodal.imageSignatures]]). Each side
    * is signatured in ONE pass — one ImageIO decode per payload. */
  def screenImages(spark: SparkSession, path: String, batch: DataFrame,
                   sigs: Option[DataFrame] = None, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4x16-bit banding is only lossless for hamming <= 3")
    val ref = sigs.getOrElse(readSigs(spark, s"$path/img_sigs"))
    val refBanded = ref.select(col("doc_id").as("index_id"),
        col("ahash").as("ra"), col("dhash").as("rd"),
        col("mean_luma").as("rl"), col("flat").as("rf"),
        bandCols2(col("ahash"), col("dhash")))
      .select(col("index_id"), col("ra"), col("rd"), col("rl"), col("rf"),
        col("x.band").as("band"), col("x.bval").as("bval"))
    val arrBanded = Multimodal.imageSignatures(batch, "doc_id", "payload")
      .filter(col("decoded"))
      .select(col("doc_id"), col("ahash"), col("dhash"), col("mean_luma"),
        col("flat"), bandCols2(col("ahash"), col("dhash")))
      .select(col("doc_id"), col("ahash"), col("dhash"), col("mean_luma"),
        col("flat"), col("x.band").as("band"), col("x.bval").as("bval"))
    arrBanded.join(broadcast(refBanded), Seq("band", "bval"))
      .select(col("doc_id"), col("index_id"),
        bit_count(col("ahash").bitwiseXOR(col("ra"))).cast("long").as("hamming"),
        bit_count(col("dhash").bitwiseXOR(col("rd"))).cast("long").as("hamming_d"),
        abs(col("mean_luma") - col("rl")).as("luma_delta"),
        (col("flat") && col("rf")).as("both_flat"))
      .distinct()
      .filter(least(col("hamming"), col("hamming_d")) <= maxDist)
      .filter(!col("both_flat") || col("luma_delta") < lit(Multimodal.FlatLumaRange))
      .select("doc_id", "index_id", "hamming", "hamming_d")
  }

  /** Audio screen: (doc_id, index_id, hamming) within hamming ≤ `maxDist`
    * of a reference clip's spectral fingerprint. */
  def screenAudio(spark: SparkSession, path: String, batch: DataFrame,
                  sigs: Option[DataFrame] = None, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4x16-bit banding is only lossless for hamming <= 3")
    val ref = sigs.getOrElse(readSigs(spark, s"$path/aud_sigs"))
    val refBanded = ref.select(col("doc_id").as("index_id"), col("afp").as("rfp"),
        col("flat").as("rf"), col("n_samples").as("rn"), bandCols(col("afp")))
      .select(col("index_id"), col("rfp"), col("rf"), col("rn"),
        col("x.band").as("band"), col("x.bval").as("bval"))
    val arr = Multimodal.audioSignatures(batch, "doc_id", "payload")
      .filter(col("decoded"))
      .select(col("doc_id"), col("afp"), col("flat"), col("n_samples"), bandCols(col("afp")))
      .select(col("doc_id"), col("afp"), col("flat"), col("n_samples"),
        col("x.band").as("band"), col("x.bval").as("bval"))
    arr.join(broadcast(refBanded), Seq("band", "bval"))
      .select(col("doc_id"), col("index_id"),
        bit_count(col("afp").bitwiseXOR(col("rfp"))).cast("long").as("hamming"),
        (col("flat") && col("rf")).as("both_flat"),
        (col("n_samples") === col("rn")).as("same_len"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .filter(!col("both_flat") || col("same_len"))
      .select("doc_id", "index_id", "hamming")
  }

  /** Video screen, OFFSET-TOLERANT: (doc_id, index_id, n_match,
    * frame_frac, frame_offset) for every arriving clip whose non-flat
    * frames match a reference clip's at hamming ≤ `maxDist` under ONE
    * modal frame delta covering ≥ `minFrameFrac` of the SHORTER side —
    * so a reference clip trimmed at the head or re-encoded with a ±k
    * lead-in still flags, and two different clips sharing black lead-in
    * frames don't (flat frames were never indexed). The reference side
    * is sampled-frame-sized and broadcasts; the arriving corpus never
    * shuffles beyond its own frame explode. */
  def screenVideo(spark: SparkSession, path: String, batch: DataFrame,
                  sigs: Option[DataFrame] = None, stride: Int = 1,
                  maxDist: Int = 3, minFrameFrac: Double = 0.8): DataFrame = {
    val ref = sigs.getOrElse(readSigs(spark, s"$path/vid_sigs"))
    val arrSig = Multimodal.videoFrameSignatures(batch, "doc_id", "payload", stride)
      .filter(col("decoded") && !col("flat"))
      .select(col("doc_id").as("id"), col("frame_idx"), col("ahash").as("fsig"))
      .localCheckpoint(true) // decode once: feeds banding AND frame counts
    val arrNf = arrSig.groupBy("id").agg(count(lit(1)).as("nf"))
    val matches = Multimodal.frameBandMatches(
      arrSig,
      ref.select(col("doc_id").as("id"), col("frame_idx"), col("ahash").as("fsig")),
      maxDist, requireLess = false, broadcastB = true)
    Multimodal.modalOffsetGrant(matches,
        arrNf.select(col("id").as("id_a"), col("nf").as("na")),
        ref.select(col("doc_id").as("id_b"), col("nf").as("nb")).distinct(),
        minFrameFrac)
      .select(col("id_a").as("doc_id"), col("id_b").as("index_id"),
        col("n_match"), col("frame_frac"), col("frame_offset"))
  }
}
