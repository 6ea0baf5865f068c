package graft.sources

import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MEDIA-SIGNATURE index + ingest-time screen — the
  * [[SpanIndex]] decontamination orientation applied to the non-text
  * modalities: a curated reference set (blocked imagery, licensed audio,
  * benchmark figures) is signatured ONCE at publish time; every later
  * crawl batch screens its decodable payloads against the frozen
  * signatures without re-reading the reference media. The index is
  * reference-set-sized by construction (one row per reference item), so
  * the screen side BROADCASTS and an arriving corpus never shuffles.
  *
  * Signatures are the dedup legs' perceptual hashes — images:
  * aHash+dHash (re-encodes/resizes/brightness shifts match), audio: the
  * gain-invariant 64-band spectral fingerprint — matched at hamming ≤ 3
  * via the same 4×16-bit pigeonhole-lossless banding, with the same
  * degenerate guards (flat images must also agree on mean luma, flat
  * audio on duration). Screening is per-payload against a frozen set, so
  * it is COMPOSITIONAL: micro-batching never changes a payload's
  * verdict — the streaming sink unions to exactly the one-shot screen. */
object MediaIndex {

  def buildImages(refs: DataFrame, idCol: String, binCol: String, path: String): Unit =
    Multimodal.imageSignatures(refs, idCol, binCol)
      .filter(col("decoded")).drop("decoded")
      .write.mode("overwrite").parquet(s"$path/img_sigs")

  def buildAudio(refs: DataFrame, idCol: String, binCol: String, path: String): Unit =
    Multimodal.audioSignatures(refs, idCol, binCol)
      .filter(col("decoded")).drop("decoded")
      .write.mode("overwrite").parquet(s"$path/aud_sigs")

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
    val ref = sigs.getOrElse(spark.read.parquet(s"$path/img_sigs"))
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
    val ref = sigs.getOrElse(spark.read.parquet(s"$path/aud_sigs"))
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
}
