package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and emits one JSON line of per-query seconds.
  * A short warmup (table scans + one tiny aggregate) pays the JVM/codegen
  * and parquet-footer costs once so per-query numbers measure the plans,
  * not first-touch effects. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: touch every table, run one shuffle+codegen pipeline
    graft.sources.Tables.names.foreach { n =>
      try graft.sources.Tables.tableNormalized(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }

    type Fn = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
    // per-query executor CPU (VERDICT r14 #7): the bench inputs are
    // single-row-group parquet, so scan-fused stages run single-threaded
    // and CPU savings are invisible in wall clock — record task CPU per
    // query into the bench_full.json artifact. The counter is read only
    // after a listener-bus drain, OUTSIDE the timed region.
    final case class Sample(secs: Double, ok: Boolean, cpu: Double)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) { cpuNs.addAndGet(m.executorCpuTime); () }
      }
    })
    def runOne(fn: Fn): Sample = {
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      val c0 = cpuNs.get
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      val cpu = (cpuNs.get - c0) / 1e9
      // measure every query from a clean slate: iterative operators leave
      // localCheckpoint RDD blocks behind (freed only on driver GC via the
      // ContextCleaner); letting them accumulate across 100+ queries
      // evicts/THRASHes later queries' storage and poisons their timings.
      // EXEMPT the FrozenSides serving generations (r14): stripping a live
      // generation's blocks while its identity stays valid forces every
      // later sample through a lost-block failure + evict + re-read — a
      // measurement artifact no production serving loop pays.
      spark.sharedState.cacheManager.clearCache()
      val protectedIds = graft.streaming.FrozenSides.ownedRddIds
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!protectedIds.contains(id)) rdd.unpersist(blocking = false)
      }
      Sample(secs, ok, cpu)
    }
    // This machine is shared, and contention windows are SUSTAINED (r10:
    // four untouched queries drifted +60-80% in the driver run although
    // each got an immediate min-of-two — both samples landed inside the
    // same window). An immediate retry cannot decorrelate that; a retry
    // PASS can: the slow tail is re-measured as its own sweep, minutes of
    // wall-clock after the first sample of the same query. Policy:
    //   pass 1: every query (gate + production twins) once;
    //   pass 2: everything that measured >1.0s, re-measured in a second
    //           interleaved sweep; keep the min;
    //   pass 3: queries still >2.5s whose two samples disagree >25% —
    //           the genuinely noisy slow tail — get a third sample.
    // min (not median) because contention noise is strictly one-sided:
    // the fastest observed run is the best estimate of the plan's cost.
    val gateItems = SparkEntry.queries.toSeq.sortBy(_._1)
    val prodItems = Production.forms.toSeq.sortBy(_._1).map { case (n, f) => ("prod/" + n, f) }
    val allItems: Seq[(String, Fn)] = gateItems ++ prodItems
    val pass1 = allItems.map { case (name, fn) => (name, fn, runOne(fn)) }
    val retryItems = pass1.filter { case (_, _, m) => m.ok && m.secs > 1.0 }
    val pass2 = retryItems.map { case (name, fn, m1) => (name, fn, m1, runOne(fn)) }
    val pass3 = pass2.flatMap { case (name, fn, m1, m2) =>
      val best = if (m2.ok) math.min(m1.secs, m2.secs) else m1.secs
      val spread = if (m2.ok) math.abs(m1.secs - m2.secs) / math.max(best, 1e-9) else 0.0
      if (best > 2.5 && spread > 0.25) Some((name, fn, runOne(fn))) else None
    }
    // best sample per query: min wall among passing samples (its CPU rides
    // along — CPU of the least-contended run is the best plan-cost estimate
    // for the same reason the min wall is)
    val bestSample: Map[String, Sample] = {
      val samples = pass1.map { case (n, _, m) => (n, m) } ++
        pass2.map { case (n, _, _, m) => (n, m) } ++
        pass3.map { case (n, _, m) => (n, m) }
      samples.groupBy(_._1).map { case (n, ms) =>
        val oks = ms.map(_._2).filter(_.ok)
        (n, if (oks.nonEmpty) oks.minBy(_.secs) else ms.head._2)
      }
    }
    val bestOf: Map[String, Double] = bestSample.map { case (n, m) => (n, m.secs) }
    val okOf: Map[String, Boolean] =
      pass1.map { case (n, _, m) => (n, m.ok) }.toMap
    val results = gateItems.map { case (name, _) => (name, bestOf(name), okOf(name)) }
    // The driver captures only the LAST 2000 chars of output and parses the
    // JSON line out of that tail — a line longer than ~1880 chars gets its
    // head cut off and fails to parse (it did in r1/r2). Emit per-query
    // times at 3-decimal precision and, if the line still exceeds the
    // budget, drop the FASTEST queries from the map (keeping a count of
    // omissions) so the headline + slow tail always parse.
    // headline total covers PASSING queries only — time a failed query
    // burned before throwing must not be attributed to the passing set
    // (it would distort the round-over-round per-query mean the
    // attempted/ran triple exists to make unambiguous). Failed elapsed is
    // reported separately alongside the failed names.
    val total = results.collect { case (_, secs, true) => secs }.sum
    val failedSecs = results.collect { case (_, secs, false) => secs }.sum
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val failedPart =
      if (failed.isEmpty) ""
      else s""","failed":${failed.mkString("[", ",", "]")},"failed_secs":${
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(failedSecs))}"""
    // Locale-pinned formatting: the f"" interpolator honors the JVM default
    // locale, and a comma-decimal locale would emit invalid JSON.
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // explicit attempted/ran/failed triple so the round-over-round
    // per-query mean has an unambiguous denominator (failed queries are
    // NEVER inside omitted_fast — that count covers ran-and-passed
    // queries dropped from the map for line-length only)
    val attempted = results.length
    val ran = results.count(_._3)
    // PRODUCTION twins (VERDICT r9 #2): the certify=false forms of the
    // certificate-carrying gate queries, timed into their own field so
    // the production cost and the certificate cost stay separately
    // visible round-over-round. Kept OUT of `total` (the headline stays
    // comparable across rounds). Measured by the SAME multi-pass policy
    // as gate queries (VERDICT r10 #2: a one-shot twin measured 7.0s
    // against its certified sibling's retried 3.4s — structurally
    // impossible and purely a measurement artifact).
    val prodTimes = prodItems.map { case (key, _) =>
      (key.stripPrefix("prod/"), bestOf(key), okOf(key))
    }
    val prodPart = {
      val entries = prodTimes.collect { case (k, v, true) => s""""$k":${d3(v)}""" }
      // a twin that starts throwing must stay VISIBLE in the diff — a
      // silently shrinking prod map reads as "twin removed", not broken
      val broken = prodTimes.collect { case (k, _, false) => s""""$k"""" }
      val failedPart =
        if (broken.isEmpty) "" else s""","prod_failed":${broken.mkString("[", ",", "]")}"""
      val main =
        if (entries.isEmpty) "" else s""","prod":${entries.mkString("{", ",", "}")}"""
      main + failedPart
    }
    // Incremental-dedup scan-bytes sweep (VERDICT r9 #8): the IncrBench
    // phases' input MB, inlined so a scan regression (like r9's
    // above-cap fallback reading more than from-scratch) is caught by
    // diffing bench files round-over-round. Seconds stay IncrBench's
    // concern; the JSON carries the scale-relevant bytes.
    val incrPart =
      try {
        val ps = IncrBench.phases(spark, sfDir)
        def mb1(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
        val keyOf = Map(
          "incremental_1pct" -> "i1", "incremental_5pct" -> "i5",
          "incremental_10pct" -> "i10", "incremental_20pct" -> "i20",
          "incremental_inquery" -> "inq", "from_scratch" -> "scratch")
        val entries = ps.flatMap(p => keyOf.get(p.name).map(k => s""""$k":${mb1(p.readMb)}"""))
        if (entries.isEmpty) "" else s""","incr_mb":${entries.mkString("{", ",", "}")}"""
      } catch { case _: Throwable => "" }
    def line(qs: Seq[(String, Double, Boolean)], omitted: Int): String = {
      val m = qs.map { case (k, v, _) => s""""$k":${d3(v)}""" }.mkString("{", ",", "}")
      val om = if (omitted == 0) "" else s""","omitted_fast":$omitted"""
      s"""{"metric":"total","value":${d3(total)},"unit":"sec","attempted":$attempted,"ran":$ran,"queries":$m,"sf":"$sfDir"$om$failedPart$prodPart$incrPart}"""
    }
    // the queries map carries passing queries only (failed ones are fully
    // accounted by the failed array + attempted-ran)
    val bySlow = results.filter(_._3).sortBy(-_._2)
    var keep = bySlow.length
    var out = line(bySlow.take(keep).sortBy(_._1), bySlow.length - keep)
    while (out.length > 1880 && keep > 1) {
      keep -= 1
      out = line(bySlow.take(keep).sortBy(_._1), bySlow.length - keep)
    }
    println(out)
    // COMPLETE per-query artifact (VERDICT r14 #5/#6): the stdout line's
    // 1880-char budget drops the fastest queries from the printed map,
    // which produced phantom "dropped_from_bench" diffs two rounds
    // running. Every query (gate + prod twins), wall AND executor-CPU
    // seconds, lands in bench_full.json next to the repo — the stdout
    // line above stays the driver contract, byte-format unchanged.
    try {
      def ent(key: String): String = {
        val m = bestSample(key)
        s""""$key":{"sec":${d3(m.secs)},"cpu_sec":${d3(m.cpu)},"ok":${m.ok}}"""
      }
      val gates = gateItems.map(_._1).map(ent).mkString("{", ",", "}")
      val prods = prodItems.map(_._1).map(ent).mkString("{", ",", "}")
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val full =
        s"""{"total_sec":${d3(total)},"attempted":$attempted,"ran":$ran,""" +
          s""""sf":"$sfDir","cpus":$cpus,"queries":$gates,"prod":$prods}"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_full.json"), full.getBytes("UTF-8"))
    } catch { case _: Throwable => () } // artifact only — never fail the bench
    spark.stop()
  }
}
