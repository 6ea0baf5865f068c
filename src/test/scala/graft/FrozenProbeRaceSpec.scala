package graft

import graft.sources.GraphBundle
import graft.streaming.FrozenSides
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** A FileSystem whose `listStatus` can be armed to throw
  * FileNotFoundException a bounded number of times for paths containing a
  * marker — the deterministic form of the ADVICE r13 race: an AtomicSwap
  * republish deleting `_prev` (or renaming the root) between a probe's
  * `exists` and its `listStatus`, so a stat the probe was told would
  * succeed observes a vanished directory. Everything else delegates to
  * the local filesystem (`flaky:/x` is `/x`). */
class FlakyFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("flaky:///")
  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    if (FlakyFs.tryThrow(f)) throw new java.io.FileNotFoundException(
      s"$f vanished between exists and listStatus (injected)")
    super.listStatus(f)
  }
}

object FlakyFs {
  @volatile var marker: String = ""
  private val remaining = new java.util.concurrent.atomic.AtomicInteger(0)
  def arm(m: String, times: Int): Unit = { marker = m; remaining.set(times) }
  def tryThrow(f: Path): Boolean =
    marker.nonEmpty && f.toString.contains(marker) &&
      remaining.getAndUpdate(n => math.max(0, n - 1)) > 0
}

/** The probe→read machinery under a republish that races the stat
  * sequence (ADVICE r13, medium): a FileNotFoundException from the
  * non-atomic exists→listStatus window must route onto the
  * identity-compare retry path — via [[GraphBundle.frozenProbe]]'s unique
  * vanished sentinel and [[FrozenSides.cachedValidated]]'s
  * count-as-attempt catch — never escape and fail the batch search or
  * kill the streaming sink. */
class FrozenProbeRaceSpec extends SparkSpec {

  private def vecs(base: Long): DataFrame = {
    import spark.implicits._
    (for (c <- 0 until 4; j <- 0 until 12) yield {
      val v = Array.fill(8)(0.0); v(c * 2) = 10.0; v(7) = 0.05 * (j + 1)
      (base + c * 12 + j, v.toSeq)
    }).toDF("vec_id", "v")
  }

  private def probesDf = {
    import spark.implicits._
    (0 until 4).map { c =>
      val v = Array.fill(8)(0.0); v(c * 2) = 10.0
      (5000L + c, v.toSeq)
    }.toDF("query_id", "qv")
  }

  test("frozenProbe returns a UNIQUE sentinel on a vanished-mid-stat dir; search retries through it") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flaky.impl", classOf[FlakyFs].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_flaky").toString
    val path = s"$root/bundle"
    GraphBundle.build(vecs(0L), path, k = 6, rounds = 2)
    val flakyPath = s"flaky:$path"
    FrozenSides.clear()

    // two armed probes: both must absorb the FNFE and return DISTINCT
    // sentinel identities (a repeated sentinel could falsely validate a
    // read bracketed by two failing probes)
    FlakyFs.arm(s"$path/graph", times = 2)
    val (_, id1) = GraphBundle.frozenProbe(spark, flakyPath)
    val (_, id2) = GraphBundle.frozenProbe(spark, flakyPath)
    assert(id1.startsWith("vanished#") && id2.startsWith("vanished#"))
    assert(id1 != id2, "sentinel identities must never repeat")

    // an armed search: first probe eats the FNFE, the retry serves
    FlakyFs.arm(s"$path/graph", times = 1)
    val out = GraphBundle.search(spark, flakyPath, probesDf,
      entries = 4, beam = 6, hops = 3, topK = 5).collect()
    assert(out.nonEmpty)
    FlakyFs.arm("", 0)
  }

  test("cachedValidated counts a vanished-mid-probe FNFE as an attempt, not a failure") {
    import spark.implicits._
    FrozenSides.clear()
    var calls = 0
    val (root, tables) = FrozenSides.cachedValidated("race-test", { () =>
      calls += 1
      if (calls <= 2) throw new java.io.FileNotFoundException("mid-swap (injected)")
      ("stable-root", "stable-id")
    }) { r => Seq(Seq((r, 1L)).toDF("root", "one")) }
    assert(root == "stable-root")
    assert(tables.head.collect().map(_.getString(0)).toSeq == Seq("stable-root"))
    assert(calls == 4, "two failed probes + the validating pre/post pair")
  }

  test("a persistently vanishing artifact fails loud as identity churn, not an escaping FNFE") {
    import spark.implicits._
    FrozenSides.clear()
    val e = intercept[IllegalStateException] {
      FrozenSides.cachedValidated("race-test-2",
        () => throw new java.io.FileNotFoundException("always (injected)")) { _ =>
        Seq(Seq(1L).toDF("one"))
      }
    }
    assert(e.getMessage.contains("identity kept moving"))
  }
}
