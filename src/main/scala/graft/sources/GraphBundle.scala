package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted kNN-graph serving bundle (sink_knn_graph): the NN-Descent
  * graph ([[graft.ops.PipelineOps4.nnDescentGraph]] — subquadratic
  * construction, reverse-neighbor-sampled) plus the vector table it was
  * built from, written as one artifact a serving fleet reads:
  *
  *   `<path>/graph`   — (gsrc, gdst) edges, k per node
  *   `<path>/vectors` — (node, nv) the corpus vectors
  *
  * Build is a plain overwrite (a REFIT republishes both dirs; the
  * streaming server's [[graft.streaming.FrozenSides.parquetTable]]
  * identity — dir mtime + child count/bytes/mtimes — picks the new
  * generation up on the next micro-batch). The reference analog is the
  * tcrd_app serving split: precompute the heavy artifact offline, answer
  * point queries against the frozen copy.
  *
  * At scale the graph is n·k rows keyed by node and the vectors n rows
  * keyed by id — both hash-partitioned equi-join sides for the batch
  * beam search ([[graft.ops.PipelineOps4.searchWith]]); neither is ever
  * joined corpus×corpus. */
object GraphBundle {

  def build(vecs: DataFrame, path: String, k: Int = 14, rounds: Int = 2): Unit = {
    graft.ops.PipelineOps4.nnDescentGraph(vecs, k, rounds)
      .select(col("src_id").as("gsrc"), col("dst_id").as("gdst"))
      .write.mode("overwrite").parquet(s"$path/graph")
    vecs.select(col("vec_id").as("node"), col("v").as("nv"))
      .write.mode("overwrite").parquet(s"$path/vectors")
  }

  /** One-shot search against the persisted bundle (the batch twin of
    * [[graft.streaming.StreamingOps.graphSearchSink]]). */
  def search(spark: SparkSession, path: String, probes: DataFrame,
             entries: Int = 4, beam: Int = 8, hops: Int = 3,
             topK: Int = 5): DataFrame =
    graft.ops.PipelineOps4.searchWith(
      spark.read.parquet(s"$path/graph").localCheckpoint(true),
      spark.read.parquet(s"$path/vectors").localCheckpoint(true),
      probes, entries, beam, hops, topK)
}
