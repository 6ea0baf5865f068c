package graft.sources

import graft.functions.VectorFunctions
import graft.functions.Exact._
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted cell-partitioned ANN index (SURVEY.md §2.1 sink_ann_index):
  * the serving-layer counterpart of q_ann_ivf. Build once, then every
  * probe batch touches only its probed cells ON DISK — directory-level
  * partition pruning, no corpus scan, no index rebuild per query.
  *
  * Layout at `path`:
  *  - `index/cell=<cid>/…` — the corpus (id, v) partitioned by nearest
  *    coarse-quantizer cell (deterministic k-means, [[Similarity.fitKmeansCodebook]]);
  *  - `codebook/` — the (cid, cv) model sidecar (K rows, model-sized).
  *
  * Scale: the build is one map-side cell assignment + one partitioned
  * write (shuffle keyed on cell id — the k-means fit keeps cells
  * population-balanced, so no giant partition); a query reads
  * |probed cells| directories of the index, never the rest — the scan's
  * PartitionFilters carry `cell IN (…)`, so at 100 TB the IO is
  * nProbe/K of the corpus per probe batch. Same coarse-then-exact
  * contract as q_ann_ivf: candidates from probed cells, exact cosine
  * re-rank, top-k. */
object AnnIndex {

  /** Fit the coarse quantizer on `corpus` (id, v), assign each vector to
    * its nearest cell map-side, and persist index + codebook sidecar. */
  def build(corpus: DataFrame, path: String, k: Int = 16): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val codebook = Similarity.fitKmeansCodebook(corpus.select(col("id"), col("v")), k)
    codebook.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toSeq.toDF("cid", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    corpus
      .select(col("id"), col("v"), Similarity.nearestCell(col("v"), codebook).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/index")
  }

  /** Streaming ingest into a built index: assign arriving vectors
    * (id, v) to cells with the PERSISTED codebook (cell assignment is a
    * pure projection — [[Similarity.nearestCell]] runs legally on a
    * streaming DataFrame) and append into the same cell-partitioned
    * layout. The quantizer stays fixed between rebuilds — standard IVF
    * serving practice: appends change cell populations, not cell
    * geometry, so concurrent readers keep pruning correctly; re-fit is
    * an offline [[build]]. Exactly-once via the file-sink commit log at
    * `checkpointDir`. */
  def appendStream(vectors: DataFrame, path: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = vectors.sparkSession
    val codebook = spark.read.parquet(s"$path/codebook")
      .select("cid", "cv").orderBy("cid").collect().map(_.getSeq[Double](1).toArray)
    vectors
      .select(col("id"), col("v"), Similarity.nearestCell(col("v"), codebook).as("cell"))
      .writeStream
      .format("parquet")
      // separate directory: the file sink's _spark_metadata commit log
      // claims its whole directory — streaming into index/ would make
      // readers see ONLY streamed files and lose the batch build
      .option("path", s"$path/index_stream")
      .option("checkpointLocation", checkpointDir)
      .partitionBy("cell")
      .outputMode("append")
      .start()
  }

  /** The full index: the batch build plus any streamed appends. Both
    * sides are cell-partitioned, so partition pruning applies to each. */
  def readIndex(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read.parquet(s"$path/index")
    val streamDir = new org.apache.hadoop.fs.Path(s"$path/index_stream")
    val fs = streamDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(streamDir)) base.unionByName(spark.read.parquet(streamDir.toString))
    else base
  }

  /** Top-k cosine neighbors for `probes` (query_id, qv) against a built
    * index: probe cells from the codebook sidecar (model-sized, driver
    * collect is K rows), then a pruned read of ONLY those cell
    * directories, exact cosine, per-probe top-k (ties to lowest
    * neighbor id). Self-matches (query_id == neighbor id) are dropped. */
  def query(spark: SparkSession, path: String, probes: DataFrame,
            nProbe: Int, topK: Int): DataFrame = {
    val cents = spark.read.parquet(s"$path/codebook")
    val wProbe = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cid"))
    val probeCells = probes
      .crossJoin(broadcast(cents))
      .withColumn("ccos", VectorFunctions.cosineSim(col("qv"), col("cv")))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))
    // bounded driver read: at most K distinct cell ids gate the scan —
    // literal partition filters prune index directories at planning time
    val cells = probeCells.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted
    val cands = readIndex(spark, path)
      .filter(col("cell").isin(cells: _*))
      .join(broadcast(probeCells), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(VectorFunctions.cosineSim(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("rnk", lng(rank().over(w)))
      .filter(col("rnk") <= topK)
      .orderBy("query_id", "rnk", "neighbor_id")
  }
}
