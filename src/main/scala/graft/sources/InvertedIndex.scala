package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted term index (SURVEY.md §2.1 sink_inverted): the data-lake
  * analog of the reference's MySQL full-text/secondary indexes serving
  * `tcrd_app.py` search — term-keyed posting lists persisted as parquet,
  * so a serving lookup reads O(query terms) index rows instead of
  * scanning the corpus.
  *
  * Layout: one row per term — (term, df, postings[(doc_id, tf)]) — sorted
  * by term within term-hash buckets, so a term lookup is a pushed-down
  * parquet equality filter over tight, sorted files (row-group pruning on
  * the term column does the skipping; pair with sink_bloom_index for
  * point-lookup file skipping at huge vocabularies).
  *
  * Scale: the index build is ONE shuffle keyed on term (uniform by
  * construction after hashing); posting lists are per-term arrays —
  * bounded by document frequency. A pathological stop-word term would
  * make one giant row: production indexes cap or split postings (the
  * df column makes the cap decision queryable); the serving path below
  * explodes postings BEFORE any join, so even a capped-list layout keeps
  * the same plan shape.
  */
object InvertedIndex {

  /** Build the inverted index for `docs` (doc_id, text) at `path`. */
  def write(docs: DataFrame, path: String, nBuckets: Int = 8): Unit =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("postings"))
      .repartition(nBuckets, col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(path)

  /** AND-semantics lookup: documents containing ALL `terms`, with the
    * summed term frequency. Reads only the probed index rows (equality
    * filter pushed to the parquet scan) of the base index AND any
    * uncompacted delta regions, explodes their postings, and intersects
    * via a count-of-terms aggregate — no corpus scan. Region union is
    * transparent here because the aggregate is per doc: a term split
    * across base and delta rows still lands on the same doc keys. */
  def lookupAll(spark: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    val hits = readRegions(spark, path)
      .filter(col("term").isin(terms: _*))
      .select(col("term"), explode(col("postings")).as("p"))
      .select(col("term"), col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
    hits.groupBy("doc_id")
      .agg(countDistinct(col("term")).as("nt"), sum(col("tf")).cast("long").as("n_hits"))
      .filter(col("nt") === terms.distinct.size)
      .select("doc_id", "n_hits")
  }

  private def hfs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The live base dir: `path`, or its `_prev` backup if a [[compact]]
    * crashed between its two renames ([[AtomicSwap.live]]). Every read
    * path resolves through this — the maintenance-consistency contract. */
  private def liveBase(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    AtomicSwap.live(hfs(spark, path), p).map(_.toString).getOrElse(path)
  }

  private def deltaDirs(spark: SparkSession, path: String): Seq[String] = {
    val fs = hfs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path + "_delta")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.toString).sorted.toSeq
  }

  /** Region names the live base has already FOLDED IN (the `_folded`
    * marker a compact writes into its staged snapshot): those delta dirs
    * are served by the base itself and await deletion — reading them too
    * would double-count every posting after a crash between the compact's
    * swap and its delta cleanup. */
  private def foldedSet(spark: SparkSession, baseDir: String): Set[String] = {
    val fs = hfs(spark, baseDir)
    val marker = new org.apache.hadoop.fs.Path(s"$baseDir/_folded")
    if (!fs.exists(marker)) Set.empty
    else {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSet
      finally in.close()
    }
  }

  private def writeFolded(spark: SparkSession, baseDir: String,
                          names: Set[String]): Unit = {
    val fs = hfs(spark, baseDir)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$baseDir/_folded"), true)
    try out.write(names.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Live base + UNFOLDED delta regions as one relation. */
  def readRegions(spark: SparkSession, path: String): DataFrame = {
    val base = liveBase(spark, path)
    val folded = foldedSet(spark, base)
    val live = deltaDirs(spark, path)
      .filterNot(d => folded(d.substring(d.lastIndexOf('/') + 1)))
    (base +: live).map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  /** Incremental maintenance for NEW documents: index only the delta
    * batch (its own term aggregation — cost O(delta), the corpus is
    * never re-scanned) into a fresh region under `<path>_delta/`. Terms
    * the delta shares with the base simply exist in two regions until
    * [[compact]] folds them; every read path merges per doc, so queries
    * are correct throughout. Updates/deletes of already-indexed docs are
    * NOT expressible by appending (postings would need tombstones) —
    * route those through a rebuild or a versioned snapshot
    * ([[Versioned]]). Same region discipline as the ANN index's streamed
    * appends (AnnIndex.scala). Region numbering never reuses a name in
    * the folded marker — a recycled name would be wrongly excluded from
    * reads until the next compact's cleanup. */
  def appendDelta(spark: SparkSession, path: String, deltaDocs: DataFrame,
                  nBuckets: Int = 8): String = {
    val used = (deltaDirs(spark, path).map(d => d.substring(d.lastIndexOf('/') + 1))
      ++ foldedSet(spark, liveBase(spark, path)))
      .flatMap(n => scala.util.Try(n.stripPrefix("r").toInt).toOption)
    val n = if (used.isEmpty) 1 else used.max + 1
    val region = f"${path}_delta/r$n%05d"
    write(deltaDocs, region, nBuckets)
    region
  }

  /** Fold all unfolded delta regions into the base: one term-keyed
    * re-aggregation of base+deltas (df sums, posting lists concatenate
    * sorted), staged at `<path>_next` with a `_folded` marker naming the
    * regions it absorbed, then landed via [[AtomicSwap.commit]] — a
    * reader at EVERY crash point resolves one complete, non-double-
    * counting index: before the swap it reads old base + deltas; in the
    * half-swapped window it reads the `_prev` backup + deltas; after the
    * swap the marker excludes the folded dirs until cleanup deletes
    * them. Re-runs converge from any crashed state. `crashAfter` 1-4 are
    * the commit's crash points; 5 crashes between commit and cleanup. */
  def compact(spark: SparkSession, path: String, nBuckets: Int = 8,
              crashAfter: Int = Int.MaxValue): Unit = {
    val fs = hfs(spark, path)
    val cur = new org.apache.hadoop.fs.Path(path)
    val base = liveBase(spark, path)
    val folded = foldedSet(spark, base)
    val unfolded = deltaDirs(spark, path)
      .filterNot(d => folded(d.substring(d.lastIndexOf('/') + 1)))
    if (unfolded.isEmpty) {
      // nothing to fold: finish any crashed predecessor — delete delta
      // dirs the live base already serves, clear the stale marker, and
      // restore canonical naming if the swap died half-way
      folded.foreach(n =>
        fs.delete(new org.apache.hadoop.fs.Path(s"${path}_delta/$n"), true))
      if (folded.nonEmpty)
        fs.delete(new org.apache.hadoop.fs.Path(s"$base/_folded"), true)
      if (base != cur.toString) require(
        fs.rename(new org.apache.hadoop.fs.Path(base), cur),
        s"compact: could not restore $cur from backup $base")
      else fs.delete(AtomicSwap.prevOf(cur), true) // stale backup leftover
      dropDeltaRootIfEmpty(fs, path)
      return
    }
    val merged = readRegions(spark, path)
      .select(col("term"), explode(col("postings")).as("p"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sort_array(collect_list(col("p"))).as("postings"))
      .repartition(nBuckets, col("term"))
      .sortWithinPartitions("term")
      .localCheckpoint(true)
    val next = AtomicSwap.nextOf(cur)
    fs.delete(next, true)
    merged.write.mode("overwrite").parquet(next.toString)
    // marker carries forward folded-but-not-yet-deleted names: they are
    // still on disk and must stay excluded after this snapshot lands
    writeFolded(spark, next.toString,
      folded ++ unfolded.map(d => d.substring(d.lastIndexOf('/') + 1)))
    AtomicSwap.commit(fs, cur, crashAfter = crashAfter)
    if (crashAfter == 5) throw AtomicSwap.CrashPoint(5)
    (folded ++ unfolded.map(d => d.substring(d.lastIndexOf('/') + 1))).foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(s"${path}_delta/$n"), true))
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_folded"), true)
    dropDeltaRootIfEmpty(fs, path)
  }

  private def dropDeltaRootIfEmpty(fs: org.apache.hadoop.fs.FileSystem,
                                   path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path + "_delta")
    if (fs.exists(root) && fs.listStatus(root).isEmpty) { fs.delete(root, true); () }
  }
}
