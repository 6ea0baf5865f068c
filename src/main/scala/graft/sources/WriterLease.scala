package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-writer lease for maintained artifacts (VERDICT r11 #8): two
  * concurrent DRIVERS running ingest/rebuild against the same service
  * root would interleave region writes, label commits and root swaps in
  * ways the single-driver exclusion matrix (DedupRebuildIngestSpec)
  * cannot see. The lease records the maintaining driver: the first
  * mutating call from a session creates `<root>_writer_lease`
  * (create-exclusive — the filesystem's atomic claim primitive, the
  * same commit-point discipline as [[AtomicSwap]]); every later call
  * from the SAME session verifies and proceeds (re-entrant, so the
  * in-driver ingest×rebuild interleave semantics are unchanged); a
  * call from a DIFFERENT session fails LOUD naming the holder and the
  * remedy, instead of silently corrupting the index.
  *
  * The lease file is a SIBLING of the root (`<root>_writer_lease`,
  * never `<root>/...`): rebuild swaps the whole root directory via
  * [[AtomicSwap]] renames, and a lease inside it would travel with the
  * outgoing snapshot.
  *
  * Lifetime is the session: a maintained service has one writer driver,
  * and handing over means [[release]] from the owner (or, after a
  * crashed driver is CONFIRMED dead, [[breakLease]] — the lease is a
  * claim record, not a liveness detector, so takeover is an operator
  * decision by design). */
object WriterLease {

  /** An empty lease older than this is a crashed claim, not a paused
    * one: no healthy writer sits inside the create→write window for 30 s. */
  private val StaleEmptyLeaseMs = 30000L

  private def leasePath(root: String): Path = {
    val p = new Path(root)
    new Path(p.getParent, p.getName + "_writer_lease")
  }

  /** The claim is only as atomic as `create(path, overwrite=false)` —
    * HDFS/local-FS give a true exclusive create, but the S3-family
    * object stores implement it as check-then-put, so two drivers can
    * BOTH believe they won — exactly the scenario the lease exists to
    * exclude (ADVICE r12; the [[AtomicSwap]] rename-semantics caveat,
    * applied here). Fail loud on schemes known to lack the primitive
    * rather than hand out a lease that doesn't exclude; on such stores
    * the claim must go through the store's conditional-put / table
    * format's metadata commit instead. */
  private val nonAtomicCreateSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss", "cosn", "swift")

  /** Schemes whose `create(overwrite=false)` is a true filesystem-level
    * exclusive create — no probe needed. */
  private val knownAtomicCreateSchemes = Set("file", "hdfs", "viewfs", "o3fs", "ofs")

  /** One CAPABILITY PROBE result per scheme (VERDICT r13 #8): the
    * blacklist names the stores KNOWN to fake create-exclusive as
    * check-then-put, but an unlisted scheme used to pass silently — a
    * lease that might not exclude. An unknown scheme now has to
    * demonstrate exclusive-create semantics once per JVM: create a probe
    * file, require a second `create(overwrite=false)` of the same path to
    * FAIL, clean up. The probe catches filesystems that silently
    * overwrite; it cannot catch a racy check-then-put that serializes
    * same-process calls — which is exactly why the named object stores
    * stay on the hard blacklist rather than being probed. */
  private val probedSchemes = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  private def probeCreateExclusive(fs: org.apache.hadoop.fs.FileSystem, near: Path): Boolean = {
    val probe = new Path(near.getParent,
      s".graft_lease_probe_${java.util.UUID.randomUUID().toString.take(12)}")
    try {
      fs.create(probe, false).close()
      val secondSucceeded =
        try { fs.create(probe, false).close(); true }
        catch { case _: java.io.IOException => false }
      !secondSucceeded
    } finally {
      try { fs.delete(probe, false); () } catch { case _: java.io.IOException => () }
    }
  }

  private def requireAtomicCreate(fs: org.apache.hadoop.fs.FileSystem, lp: Path): Unit = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file").toLowerCase
    require(!nonAtomicCreateSchemes.contains(scheme),
      s"WriterLease needs an atomic create-exclusive, which '$scheme' does not provide " +
        s"(object-store create is check-then-put): claim the writer role through the " +
        s"store's conditional-put or the table format's metadata commit instead ($lp)")
    if (!knownAtomicCreateSchemes.contains(scheme)) {
      val ok = probedSchemes.computeIfAbsent(scheme, _ => probeCreateExclusive(fs, lp))
      require(ok,
        s"WriterLease: scheme '$scheme' failed the create-exclusive capability probe " +
          s"(a second create(overwrite=false) of an existing path succeeded) — its lease " +
          s"cannot exclude a second writer; claim through the store's conditional-put or " +
          s"a table format's metadata commit instead ($lp)")
    }
  }

  /** Stable per-session writer identity: two SparkSessions — even in one
    * JVM, even sharing a SparkContext — are two writers. Structured
    * Streaming runs foreachBatch in a CLONED session, so a streaming
    * sink must capture its driver's identity at definition time and
    * thread it through [[ensureAs]] (see DedupService.ingestSink) —
    * probing the micro-batch session would misread one stream as a
    * parade of writers. */
  private[graft] def owner(spark: SparkSession): String =
    s"${spark.sparkContext.applicationId}/${System.identityHashCode(spark).toHexString}"

  /** The current holder's identity line, if a lease exists. An EMPTY
    * lease file (a writer crashed between create-exclusive and the
    * identity write, or a reader raced into that window) is corrupt
    * state, not a holder: fail LOUD with the same named remedy as a
    * foreign holder (ADVICE r12 — `linesIterator.next()` on empty
    * contents threw an unnamed NoSuchElementException and wedged even
    * the owning session, since ensureAs could never match identity). */
  def holder(spark: SparkSession, root: String): Option[String] = {
    val lp = leasePath(root)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(lp)) None
    else {
      def readLine(): Option[String] = {
        val in = fs.open(lp)
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).linesIterator.nextOption()
          .filter(_.nonEmpty)
        finally in.close()
      }
      // an empty lease is EITHER a healthy claim mid-write (the
      // create-exclusive → identity-write window is non-atomic; a reader
      // racing into it must not report corruption and point operators at
      // breakLease on a LIVE claim) or a writer that crashed inside it.
      // Distinguish by a bounded BACKOFF re-read (~1.5 s total — ADVICE
      // r13: the old 3×100 ms window misdiagnosed a claimant paused
      // >300 ms by a GC pause or slow FS as crashed) and then by the
      // lease file's AGE: only a stale-by-age empty lease is declared
      // corrupt; a young one is reported as a probable live mid-claim
      // WITHOUT directing operators to break it.
      var line = readLine()
      var delayMs = 100L
      while (line.isEmpty && delayMs <= 800L) {
        Thread.sleep(delayMs)
        line = readLine()
        delayMs *= 2
      }
      line match {
        case some @ Some(_) => some
        case None =>
          val ageMs = System.currentTimeMillis() - fs.getFileStatus(lp).getModificationTime
          if (ageMs < StaleEmptyLeaseMs) throw new IllegalStateException(
            s"writer lease file $lp exists but is empty and only ${ageMs}ms old — a " +
              "writer is probably INSIDE the create-exclusive -> identity-write window " +
              "(do NOT break a live claim); retry shortly.")
          else throw new IllegalStateException(
            s"writer lease file $lp exists but stayed empty for ${ageMs}ms — a claiming " +
              "writer crashed between create-exclusive and the identity write. After " +
              "confirming no writer is mid-claim, WriterLease.breakLease() to clear.")
      }
    }
  }

  /** Acquire the lease for this session, or verify this session already
    * holds it. A lease held by another writer fails loud. */
  def ensure(spark: SparkSession, root: String, op: String): Unit =
    ensureAs(owner(spark), spark, root, op)

  /** [[ensure]] with an explicit writer identity — for streaming sinks,
    * which must claim as the DRIVER session that defined them, not the
    * per-micro-batch clone. */
  private[graft] def ensureAs(me: String, spark: SparkSession, root: String,
                              op: String): Unit = {
    holder(spark, root) match {
      case Some(h) if h == me => () // re-entrant: same driver, any op
      case Some(h) =>
        throw new IllegalStateException(
          s"writer lease for $root is held by $h (this session is $me, op=$op) — " +
            "two drivers must not maintain the same artifact concurrently: " +
            "stop or release() from the owning driver, or, after confirming it " +
            "is dead, WriterLease.breakLease() to take over.")
      case None =>
        val lp = leasePath(root)
        val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        requireAtomicCreate(fs, lp)
        try {
          val out = fs.create(lp, false) // create-exclusive: the claim point
          try out.write(s"$me\n$op\n${java.time.Instant.now()}\n"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        } catch {
          case _: java.io.IOException =>
            // lost the creation race: re-read and fail loud unless it's us
            holder(spark, root) match {
              case Some(h) if h == me => ()
              case h => throw new IllegalStateException(
                s"writer lease for $root was claimed concurrently by ${h.getOrElse("?")} " +
                  s"(this session is $me, op=$op) — see WriterLease for the remedy.")
            }
        }
    }
  }

  /** Release this session's lease (absent is fine; another writer's
    * lease fails loud rather than being stolen). */
  def release(spark: SparkSession, root: String): Unit = {
    val me = owner(spark)
    holder(spark, root) match {
      case None => ()
      case Some(h) if h == me =>
        val lp = leasePath(root)
        lp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(lp, false)
        ()
      case Some(h) => throw new IllegalStateException(
        s"cannot release $root's writer lease: held by $h, this session is $me")
    }
  }

  /** Operator takeover: force-remove the lease. Only after the holding
    * driver is confirmed dead — the lease is the record that it isn't. */
  def breakLease(spark: SparkSession, root: String): Unit = {
    val lp = leasePath(root)
    lp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(lp, false)
    ()
  }
}
