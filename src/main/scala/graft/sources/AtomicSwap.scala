package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The snapshot-swap commit protocol shared by the maintenance sinks
  * (upsertSink, compactSwap, AnnIndex.compact): stage the new snapshot
  * at `<path>_next`, then swap via rename-to-backup so that AT EVERY
  * INSTANT a reader resolving [[live]] sees one complete snapshot —
  * never a torn or missing one. SwapConsistencySpec enumerates every
  * crash point and proves both the reader guarantee and re-run
  * convergence.
  *
  * Step order is load-bearing: the previous backup is deleted only
  * while `<path>` itself still exists (steps 1-2 run under that guard),
  * so a RE-RUN from the crashed half-swapped state (cur missing, prev
  * holding the only copy) never deletes the last copy before the new
  * one is in place. A plain rename-first sequence has exactly that
  * window, and it is invisible until a crash lands in it.
  *
  * On a real object store these renames become the table format's
  * atomic metadata commit; the protocol shape (stage → single commit
  * point → backup) is the same.
  */
object AtomicSwap {

  /** Injected by tests to stop the protocol after step `step`. */
  final case class CrashPoint(step: Int)
    extends RuntimeException(s"crash injected after step $step")

  def prevOf(path: Path): Path = new Path(path.toString + "_prev")
  def nextOf(path: Path): Path = new Path(path.toString + "_next")

  /** The directory a reader should serve from: the snapshot itself, or
    * the backup if a crash caught the swap between its two renames. */
  def live(fs: FileSystem, path: Path): Option[Path] =
    if (fs.exists(path)) Some(path)
    else if (fs.exists(prevOf(path))) Some(prevOf(path))
    else None

  /** Commit the snapshot staged at `<path>_next`. `keepBackup` retains
    * `<path>_prev` after the swap (compactSwap's documented posture);
    * otherwise it is cleaned. `crashAfter` is a test hook: throw after
    * protocol step N (1 = backup cleared, 2 = cur renamed away,
    * 3 = next renamed in, 4 = backup cleaned). */
  def commit(fs: FileSystem, path: Path, keepBackup: Boolean = false,
             crashAfter: Int = Int.MaxValue): Unit = {
    val prev = prevOf(path)
    val next = nextOf(path)
    require(fs.exists(next), s"commit: nothing staged at $next")
    def ck(step: Int): Unit =
      if (step == crashAfter) throw CrashPoint(step)
    // Hadoop FileSystems report rename/delete failure by RETURNING false
    // (dest exists, missing parent, object-store quirks) — an unchecked
    // false here means "committed nothing, told nobody", and the caller's
    // checkpoint then advances past a batch that never landed. Surface
    // every failed step as a retryable error instead.
    def del(p: Path): Unit = {
      fs.delete(p, true)
      require(!fs.exists(p), s"commit: delete left $p in place")
    }
    def ren(a: Path, b: Path): Unit =
      require(fs.rename(a, b), s"commit: rename $a -> $b failed")
    if (fs.exists(path)) {
      del(prev); ck(1)
      ren(path, prev); ck(2)
    }
    ren(next, path); ck(3)
    if (!keepBackup) del(prev)
    ck(4)
  }
}
