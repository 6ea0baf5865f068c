package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-batch cache of FROZEN serving artifacts for the streaming sinks
  * (VERDICT r10 #6): screenSink/dsirScoreSink re-read their vocab/
  * postings/profiles/model parquet on EVERY micro-batch, though the
  * artifact is frozen by contract — a rebuild replaces the whole root via
  * [[graft.sources.AtomicSwap]] (near-dup index) or an overwrite of the
  * model dir (DSIR). So: read once, materialize, reuse
  * across batches, and invalidate by the artifact's IDENTITY — the
  * resolved live root for swap-rooted indexes, the directory's
  * modification time for plain parquet models. The identity check per
  * batch is one tiny filesystem stat (the pointer read the sink already
  * paid), never a parquet read.
  *
  * Scale note: these artifacts are serving-sized by construction — the
  * decontamination index is eval-suite-sized and broadcasts inside
  * [[Dedup.NearDupIndex.screenWith]]; the DSIR model is B buckets. What
  * the cache removes is the PER-BATCH file listing + footer + row-group
  * decode of the frozen side, which at a 1-second trigger interval
  * otherwise dominates the micro-batch.
  *
  * Generations are materialized with `localCheckpoint`, NOT
  * `persist` (ADVICE r11): persist registers the read plan in Spark's
  * CacheManager, whose lookup is PLAN identity — and two generations of
  * the same artifact read the same path, so keeping the old generation
  * persisted (to protect a concurrent mid-batch reader) makes the NEW
  * generation's identical-looking read silently resolve to the OLD
  * cached data (this exact stale-serve was reproduced by the r12
  * append-visibility spec when a one-generation unpersist deferral was
  * tried). A localCheckpoint is a plan-free LogicalRDD: each generation
  * is its own materialization, a displaced generation stays readable
  * for any batch still holding its DataFrame (blocks are freed by the
  * ContextCleaner when the last reference drops — reference-counted by
  * the JVM, no unpersist race), and a fresh read can never alias to it. */
object FrozenSides {

  private final case class Entry(identity: String, root: String, tables: Seq[DataFrame])
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  private def persistAll(dfs: Seq[DataFrame]): Seq[DataFrame] =
    // eager: the first micro-batch pays the read ONCE here rather than
    // once per downstream consumer of the plan
    dfs.map(_.localCheckpoint(true))

  private def cached(key: String, identity: String)
                    (read: => Seq[DataFrame]): Seq[DataFrame] = {
    val hit = cache.get(key)
    if (hit != null && hit.identity == identity) hit.tables
    else {
      val fresh = persistAll(read)
      cache.put(key, Entry(identity, "", fresh))
      fresh
    }
  }

  /** [[cached]] for MULTI-TABLE swap-rooted artifacts, with the
    * probe→read window CLOSED: probe-then-read is not atomic against an
    * AtomicSwap republish, so a commit landing between the identity
    * probe and the last table's read could cache one table from each
    * generation — the exact torn state the single identity exists to
    * prevent. The reads are EAGER (localCheckpoint materializes before
    * return), so re-probing AFTER them and requiring the identity
    * unchanged proves no republish landed inside the window; a moved
    * identity discards the reads and retries against the new root.
    * Returns (root read from, tables). */
  private[graft] def cachedValidated(key: String, probe: () => (String, String))
                                    (read: String => Seq[DataFrame]): (String, Seq[DataFrame]) = {
    var attempts = 0
    while (attempts < 5) {
      try {
        val (root, identity) = probe()
        val hit = cache.get(key)
        if (hit != null && hit.identity == identity) return (hit.root, hit.tables)
        val fresh = persistAll(read(root))
        if (probe()._2 == identity) {
          cache.put(key, Entry(identity, root, fresh))
          return (root, fresh)
        }
      } catch {
        // a concurrent republish can make the probe's stat sequence or
        // the read itself observe files mid-rename/delete (ADVICE r13:
        // commit step 4 deletes _prev after the root was resolved; the
        // root renames between exists and listStatus; an eager read's
        // tasks stat files the swap just moved). That is the republish
        // RACE this loop exists to survive, not storage loss — count it
        // as an attempt and re-probe, which lands post-swap.
        case e: Throwable if isVanished(e) => ()
      }
      attempts += 1 // a republish landed mid-read: the generation may be mixed
    }
    throw new IllegalStateException(
      s"$key: artifact identity kept moving across 5 read attempts — " +
        "republishes are landing faster than a micro-batch can read; " +
        "let the maintainer settle and retry")
  }

  /** The near-dup index's frozen side for `path`, persisted across
    * micro-batches; re-read when the AtomicSwap live root moves (rebuild)
    * OR a new region lands under the same root (append/ingest bumps the
    * profiles-dir mtime — the identity [[Dedup.NearDupIndex.frozenProbe]]
    * carries, so a sink screening against a GROWING index sees every
    * appended doc from the next batch on). The per-batch hit cost is the
    * probe's stats only — no parquet listing or footer reads.
    * None for an empty index (same contract as [[Dedup.NearDupIndex.screen]]). */
  def nearDup(spark: SparkSession, path: String): Option[Dedup.NearDupIndex.Frozen] =
    Dedup.NearDupIndex.frozenProbe(spark, path).map { _ =>
      val (root, Seq(v, po, pr)) = cachedValidated(s"neardup:$path",
        () => Dedup.NearDupIndex.frozenProbe(spark, path)
          .getOrElse(throw new IllegalStateException(
            s"near-dup index at $path vanished mid-read"))) { r =>
        val f = Dedup.NearDupIndex.frozenAt(spark, r)
        Seq(f.vocab, f.postings, f.profiles)
      }
      Dedup.NearDupIndex.Frozen(root, v, po, pr)
    }

  /** The ANN index's serving side for `path`, persisted across
    * micro-batches; re-read when the live root moves (refit), the live
    * index dir moves (compaction), or the stream-append dir's mtime
    * bumps (an appendStream batch landed — next serving batch must see
    * it). Hit cost is the probe's stats only. */
  def annIndex(spark: SparkSession, path: String): graft.sources.AnnIndex.FrozenAnn = {
    val (root, Seq(c, ix)) = cachedValidated(s"ann:$path",
      () => graft.sources.AnnIndex.frozenProbe(spark, path)) { r =>
      val f = graft.sources.AnnIndex.frozenAt(spark, r)
      Seq(f.cents, f.index)
    }
    graft.sources.AnnIndex.FrozenAnn(root, c, ix)
  }

  /** The kNN-graph bundle's serving side (graph edges + vectors), pinned
    * to ONE generation: both tables are cached under a SINGLE identity
    * from [[graft.sources.GraphBundle.frozenProbe]] (VERDICT r12 #1 —
    * per-dir [[parquetTable]] identities could resolve across a
    * republish boundary and serve a NEW graph joined against OLD
    * vectors: neighbor ids that don't exist, cosines against the wrong
    * generation). Re-read when the republish swap lands; hit cost is
    * the probe's stats only. */
  def graphBundle(spark: SparkSession, path: String): (DataFrame, DataFrame, DataFrame) = {
    val (_, Seq(g, v, e)) = cachedValidated(s"graphbundle:$path",
      () => graft.sources.GraphBundle.frozenProbe(spark, path)) { r =>
      Seq(spark.read.parquet(s"$r/graph"), spark.read.parquet(s"$r/vectors"),
        graft.sources.GraphBundle.entriesOrPick(spark, r))
    }
    (g, v, e)
  }

  /** A SWAP-ROOTED frozen parquet artifact (the MediaIndex signature
    * sets), persisted across micro-batches: the read resolves
    * [[graft.sources.AtomicSwap.live]] and the identity carries the
    * resolved root + its file stats, so an atomic republish of the
    * artifact is picked up on the next batch and a torn mid-swap window
    * (root briefly absent between the two renames) lands on the retry
    * path instead of failing the batch. */
  def swapParquet(spark: SparkSession, path: String): DataFrame = {
    val probe = () => {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val root = graft.sources.AtomicSwap.live(fs, p).map(_.toString).getOrElse(path)
      val rp = new org.apache.hadoop.fs.Path(root)
      // no live root AND no plain dir = the artifact was never published
      // — a clear error, not five vanished-mid-swap retries (live()
      // already distinguishes the transient mid-swap absent window)
      if (root == path && !fs.exists(rp)) throw new IllegalArgumentException(
        s"no frozen artifact at $path: nothing published there yet")
      val kids = fs.listStatus(rp) // FNFE mid-swap → cachedValidated retries
      val kidM = if (kids.isEmpty) 0L else kids.map(_.getModificationTime).max
      (root, s"$root@${kids.length}@${kids.map(_.getLen).sum}@$kidM")
    }
    cachedValidated(s"swapparquet:$path", probe)(r => Seq(spark.read.parquet(r)))._2.head
  }

  /** A plain frozen parquet artifact (the DSIR model), persisted across
    * micro-batches; re-read when the directory changes. The identity is
    * the dir mtime PLUS the child file count and total byte length
    * (VERDICT r11 #3: a refit that lands inside the same mtime
    * granularity tick — 1 s on some filesystems — would be invisibly
    * absorbed by a bare-mtime identity; model dirs are a handful of
    * files, so the listStatus is still a constant-cost stat). */
  def parquetTable(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val kids = fs.listStatus(p)
    val kidM = if (kids.isEmpty) 0L else kids.map(_.getModificationTime).max
    val identity = s"${fs.getFileStatus(p).getModificationTime}" +
      s"@${kids.length}@${kids.map(_.getLen).sum}@$kidM"
    cached(s"parquet:$path", identity)(Seq(spark.read.parquet(path))).head
  }

  /** Drop every cached entry (test isolation); checkpoint blocks are
    * freed by the ContextCleaner once unreferenced. */
  private[graft] def clear(): Unit = cache.clear()

  /** The persisted-RDD ids of every LIVE cached generation — for the
    * bench harnesses, whose between-sample "unpersist everything" sweep
    * would otherwise strip a valid generation's checkpoint blocks while
    * its identity stays current: every later sample then pays a
    * lost-block failure + evict + full re-read (r14 — QBench measured
    * exactly that loop once GraphBundle.search started caching). A
    * production serving loop never blanket-unpersists foreign RDDs; the
    * harness must not either. Transient per-query checkpoints stay
    * sweepable — only the frozen serving generations are exempt. */
  private[graft] def ownedRddIds: Set[Int] = {
    import scala.jdk.CollectionConverters._
    cache.values.asScala.toSeq.flatMap(_.tables).flatMap { df =>
      df.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
      }
    }.toSet
  }

  /** A failure is the artifact VANISHING MID-STAT/MID-READ — the
    * signature of a republish racing the reader, distinct from lost
    * checkpoint blocks — when the cause chain carries a
    * FileNotFoundException (driver-side stat or executor-side open,
    * which Spark wraps in SparkException layers). */
  private def isVanished(e: Throwable): Boolean = {
    var t = e; var depth = 0
    while (t != null && depth < 20) {
      if (t.isInstanceOf[java.io.FileNotFoundException]) return true
      t = if (t.getCause eq t) null else t.getCause
      depth += 1
    }
    false
  }

  /** A failure is a LOST CHECKPOINT BLOCK when the cause chain carries
    * Spark's local-checkpoint block error ("Checkpoint block rdd_x_y not
    * found! Either the executor that originally checkpointed this
    * partition is no longer alive…") or a BlockManager fetch miss. */
  private[graft] def isLostBlock(e: Throwable): Boolean = {
    var t = e; var depth = 0
    while (t != null && depth < 20) {
      val m = Option(t.getMessage).getOrElse("")
      // ONLY the block-manager signatures: Spark's BlockNotFoundException
      // and the LocalCheckpointRDD "Checkpoint block rdd_x_y not found!"
      // error. A generic "block … not found" match would also catch
      // HDFS's BlockMissingException — genuine storage loss of the
      // artifact itself, where a retry against the same broken storage
      // just doubles the failure latency and mislabels the incident.
      if (t.getClass.getName.contains("BlockNotFoundException") ||
          m.contains("Checkpoint block")) return true
      t = if (t.getCause eq t) null else t.getCause
      depth += 1
    }
    false
  }

  private def evictPaths(paths: Seq[String]): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (paths.exists(p => k.endsWith(s":$p"))) it.remove()
    }
  }

  /** Lost-block recovery for a micro-batch that serves from this cache
    * (ADVICE r12): cached generations are executor-LOCAL checkpoint
    * blocks with no lineage, so in cluster mode an executor loss makes a
    * generation unrecoverable — and since the artifact identity is
    * unchanged, the poisoned entry would otherwise be served to (and
    * fail) EVERY later micro-batch until process restart. Wrap the batch
    * work: a lost-block failure evicts the artifact's entries and
    * retries ONCE (the retry re-reads from storage — the artifact is
    * frozen, so the re-read is the same generation); a failure on the
    * retry evicts again and rethrows, so even then the NEXT batch
    * re-reads instead of wedging. Non-block failures pass through. */
  def recovering[A](paths: String*)(work: => A): A =
    try work catch {
      case e: Throwable if isLostBlock(e) =>
        evictPaths(paths)
        try work catch {
          case e2: Throwable =>
            if (isLostBlock(e2)) evictPaths(paths)
            throw e2
        }
    }
}
