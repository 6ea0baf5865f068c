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

  private final case class Entry(identity: String, tables: Seq[DataFrame])
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
      cache.put(key, Entry(identity, fresh))
      fresh
    }
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
    Dedup.NearDupIndex.frozenProbe(spark, path).map { case (root, identity) =>
      val Seq(v, po, pr) = cached(s"neardup:$path", identity) {
        val f = Dedup.NearDupIndex.frozenAt(spark, root)
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
    val (root, identity) = graft.sources.AnnIndex.frozenProbe(spark, path)
    val Seq(c, ix) = cached(s"ann:$path", identity) {
      val f = graft.sources.AnnIndex.frozenAt(spark, root)
      Seq(f.cents, f.index)
    }
    graft.sources.AnnIndex.FrozenAnn(root, c, ix)
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
}
