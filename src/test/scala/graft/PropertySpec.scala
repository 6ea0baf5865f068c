package graft

import graft.operators.{AsofJoin, GraphOps2, MergeOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll

/** Property tests: distributed operators against exact in-memory
  * reference implementations on random inputs. Spark job submission is
  * expensive, so each property runs a reduced-but-meaningful number of
  * cases; seeds are fixed by scalacheck's deterministic default
  * parameters plus our own generators' structure. */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 12): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("connectedComponents equals union-find on random graphs") {
    import spark.implicits._
    val genEdges = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield edges.filter(e => e._1 != e._2)
    check(forAll(genEdges) { edges =>
      edges.isEmpty || {
        // reference union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(k => k -> find(k)).toMap
        val got = GraphOps2.connectedComponents(edges.toDF("src", "dst"), 30)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == want
      }
    })
  }

  test("pagerankInt equals an exact in-memory integer replica") {
    import spark.implicits._
    val genEdges = for {
      n <- Gen.choose(2, 25)
      m <- Gen.choose(2, 50)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield {
      val clean = edges.filter(e => e._1 != e._2).distinct
      // symmetrize so every node has out-degree >= 1 (the op's contract)
      (clean ++ clean.map(_.swap)).distinct
    }
    check(forAll(genEdges) { edges =>
      edges.isEmpty || {
        val iters = 3
        val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
        var pr = deg.keys.map(_ -> 1000000000000L).toMap
        for (_ <- 1 to iters) {
          val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
          edges.foreach { case (s, t) => in(t) += pr(s) / deg(s) }
          pr = in.map { case (k, s) => k -> (150000000000L + 85L * s / 100L) }.toMap
        }
        val got = GraphOps2.pagerankInt(edges.toDF("src", "dst"), iters)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == pr
      }
    }, n = 8)
  }

  test("leftAsof equals brute-force latest-prior lookup") {
    import spark.implicits._
    val genData = for {
      probes <- Gen.listOfN(15, for {
        k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      builds <- Gen.listOfN(10, for {
        k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 50L); v <- Gen.choose(0L, 99L)
      } yield (k, t, v))
    } yield (probes.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      // one row per (key, time): keep max v deterministically
      builds.groupBy(b => (b._1, b._2)).map(_._2.maxBy(_._3)).toList)
    check(forAll(genData) { case (probes, builds) =>
      probes.isEmpty || builds.isEmpty || {
        val want = probes.map { case (id, k, t) =>
          val cands = builds.filter(b => b._1 == k && b._2 <= t)
          id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
        }.toMap
        val l = probes.toDF("id", "k", "lt")
        val r = builds.toDF("k", "rt", "v")
        val got = AsofJoin.leftAsof(l, r, "k", "lt", "rt", Seq("v"))
          .collect().map(row => row.getLong(0) ->
            (if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
        got == want
      }
    }, n = 10)
  }

  test("upsert equals last-writer-wins map semantics") {
    import spark.implicits._
    val genRow = for {
      k <- Gen.choose(0L, 5L); ver <- Gen.choose(0L, 9L); v <- Gen.alphaStr.map(_.take(4))
    } yield (k, ver, v)
    val gen = for {
      base <- Gen.listOfN(8, genRow)
      upd <- Gen.listOfN(8, genRow)
    } yield (
      // unique key per side, deterministic survivor: max (ver, value)
      base.groupBy(_._1).map(_._2.maxBy(r => (r._2, r._3))).toList,
      upd.groupBy(_._1).map(_._2.maxBy(r => (r._2, r._3))).toList)
    check(forAll(gen) { case (base, upd) =>
      base.isEmpty || upd.isEmpty || {
        val want = (base.map(r => r._1 -> (r._2, r._3, 0)) ++
          upd.map(r => r._1 -> (r._2, r._3, 1)))
          .groupBy(_._1)
          .map { case (k, vs) =>
            // higher version wins; updates win ties (src=1 > src=0)
            val (_, (ver, v, _)) = vs.maxBy { case (_, (ver, _, src)) => (ver, src) }
            k -> (ver, v)
          }
        val got = MergeOps.upsert(base.toDF("k", "ver", "v"),
            upd.toDF("k", "ver", "v"), "k", "ver")
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
        got == want
      }
    }, n = 10)
  }

  test("pagerankInt keeps source-only nodes at the teleport floor (directed chains)") {
    import spark.implicits._
    // a directed chain a->b->c->…: the head has in-degree 0 and must stay
    // in the rank table at exactly the teleport rank every iteration
    val genChain = Gen.choose(3, 12)
    check(forAll(genChain) { n =>
      val edges = (0L until n.toLong).sliding(2).map(p => (p(0), p(1))).toList
      val got = GraphOps2.pagerankInt(edges.toDF("src", "dst"), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // nodes with out-degree >= 1 are 0..n-2; head keeps teleport-only rank
      got.keySet == (0L until (n - 1).toLong).toSet &&
        got(0L) == 150000000000L + 0L // teleport + 85% of zero contributions
    }, n = 6)
  }

  test("sequence packing equals a sequential fold over each source") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        src <- Gen.oneOf("a", "b", "c")
        toks <- Gen.choose(1, 4000)
      } yield (src, toks))
    } yield rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t.toLong) }
    check(forAll(gen) { rows =>
      rows.isEmpty || {
        val docs = rows.map { case (id, src, toks) =>
          (id, src, Seq.fill(toks.toInt)("x").mkString(" "))
        }.toDF("doc_id", "source", "text")
        docs.createOrReplaceTempView("prop_seqpack_docs")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
        val got = docs.select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("tokens"))
          .withColumn("cum", sum(col("tokens")).over(w))
          .select(col("doc_id"),
            ((col("cum") - col("tokens")) / 2048).cast("long").as("seq_id"),
            ((col("cum") - col("tokens")) % 2048).as("off"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        val want = rows.groupBy(_._2).values.flatMap { g =>
          var cum = 0L
          g.sortBy(_._1).map { case (id, _, toks) =>
            val r = id -> (cum / 2048, cum % 2048)
            cum += toks
            r
          }
        }.toMap
        got == want
      }
    }, n = 8)
  }

  test("applyMerge fold equals greedy left-to-right reference on random symbol strings") {
    import spark.implicits._
    val genCase = for {
      len <- Gen.choose(0, 12)
      syms <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
      l <- Gen.oneOf("a", "b", "c")
      r <- Gen.oneOf("a", "b", "c")
    } yield (syms, l, r)
    check(forAll(genCase) { case (syms, l, r) =>
      // reference: greedy non-overlapping left-to-right merge
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      val expect = out.result()
      val got = Seq(syms).toDF("syms")
        .select(graft.ops.PipelineOps2.applyMerge(
          org.apache.spark.sql.functions.col("syms"), l, r).as("m"))
        .head().getSeq[String](0).toVector
      got == expect
    }, n = 40)
  }

  test("morton8 interleave is monotone-decodable: bucket bits round-trip") {
    import spark.implicits._
    val genXY = for {
      x <- Gen.choose(0L, 255L); y <- Gen.choose(0L, 255L)
    } yield (x, y)
    check(forAll(genXY) { case (x, y) =>
      val z = Seq((x, y)).toDF("x", "y")
        .select(graft.sources.ZOrder.morton8(
          org.apache.spark.sql.functions.col("x"),
          org.apache.spark.sql.functions.col("y")).as("z"))
        .head().getLong(0)
      // decode by de-interleaving bits
      var dx = 0L; var dy = 0L
      for (i <- 0 until 8) {
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      dx == x && dy == y && z >= 0 && z < (1L << 16)
    }, n = 40)
  }

  test("patchKeys equals a map-lookup reference on random tables and patches") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      keys <- Gen.listOfN(n, Gen.choose(0L, 30L))
      patchKeys <- Gen.someOf(keys.distinct)
      // fresh ids disjoint from the key space, unique per old key
    } yield (keys, patchKeys.toList.zipWithIndex.map { case (k, i) => (k, 1000L + i) })
    check(forAll(gen) { case (keys, patch) =>
      patch.isEmpty || {
        val df = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row")
        val got = operators.LoaderOps.patchKeys(df, "k", patch.toDF("old_id", "new_id"))
          .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
        val m = patch.toMap
        val want = keys.zipWithIndex
          .map { case (k, i) => i.toLong -> m.getOrElse(k, k) }.toMap
        got == want
      }
    })
  }

  test("boundedHashSample: subset, deterministic, bounded, partition-invariant") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 400)
      cap <- Gen.choose(1L, 50L)
    } yield (n, cap)
    check(forAll(gen) { case (n, cap) =>
      val df = (0L until n.toLong).toDF("id")
      val s1 = ops.Dedup.boundedHashSample(df, "id", cap)
        .collect().map(_.getLong(0)).sorted.toSeq
      val s2 = ops.Dedup.boundedHashSample(df.repartition(7), "id", cap)
        .collect().map(_.getLong(0)).sorted.toSeq
      val m = math.max(1L, n / math.max(1L, cap))
      s1 == s2 &&                                   // partition-invariant
      s1.forall(i => i >= 0 && i < n) &&            // subset
      (m == 1L && s1.size == n ||                   // under cap: identity
        m > 1L && s1.size <= n)                     // sampled: never grows
    }, n = 8)
  }

  test("dataset fingerprint is order- and partitioning-invariant, content-sensitive") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, Gen.alphaNumStr.map(_.take(12)))
    } yield rows
    check(forAll(gen) { rows =>
      val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      def fp(d: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = operators.ProvenanceOps
          .datasetFingerprint(d, graft.sources.FanOut.contentAllColumns(d)).head()
        (r.getLong(0), r.getLong(1))
      }
      val base = fp(df)
      val shuffled = fp(df.repartition(5).sortWithinPartitions(desc("text")))
      val mutated = fp(df.withColumn("text",
        when(col("id") === 0L, concat(col("text"), lit("X"))).otherwise(col("text"))))
      base == shuffled && mutated != base
    }, n = 8)
  }

  test("schema drift recovers a random rename permutation regardless of row order") {
    import graft.operators.SchemaDrift
    import spark.implicits._
    val gen = for {
      k <- Gen.choose(2, 4)            // columns
      n <- Gen.choose(1, 15)           // rows
      renamedIdx <- Gen.someOf(0 until k)
    } yield (k, n, renamedIdx.toSet)
    check(forAll(gen) { case (k, n, renamedIdx) =>
      // column j's values are offset by j*1000 so content multisets are
      // pairwise distinct — renames are then unambiguous by construction
      val rows = (0 until n).map(i => (0 until k).map(j => i + j * 1000))
      val oldNames = (0 until k).map(j => s"c$j")
      val newNames = (0 until k).map(j =>
        if (renamedIdx.contains(j)) s"r$j" else s"c$j")
      val oldDf = rows.map(r => org.apache.spark.sql.Row(r.map(_.toLong): _*))
      val schema = org.apache.spark.sql.types.StructType(oldNames.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.LongType)))
      val old = spark.createDataFrame(
        spark.sparkContext.parallelize(oldDf.toSeq), schema)
      val renamed = old.toDF(newNames: _*)
        .orderBy(rand(7))               // row order must not matter
      val report = SchemaDrift.drift(
        SchemaDrift.columnProfiles(old), SchemaDrift.columnProfiles(renamed))
        .collect()
        .map(r => (r.getAs[String]("old_col"), r.getAs[String]("new_col"),
          r.getAs[String]("status"))).toSet
      val want = (0 until k).map { j =>
        if (renamedIdx.contains(j)) (s"c$j", s"r$j", "renamed")
        else (s"c$j", s"c$j", "same")
      }.toSet
      report == want
    }, n = 8)
  }

  test("mix-monitor consecutive-drift runs equal the sequential fold on random drift patterns") {
    import graft.streaming.MixMonitor
    import spark.implicits._
    val H = 3600L * 1000 * 1000
    val target = Map("sA" -> 500000L, "sB" -> 500000L)
    val gen = Gen.listOfN(6, Gen.oneOf(true, false)).suchThat(_.nonEmpty)
    check(forAll(gen) { drifts =>
      val dir = java.nio.file.Files.createTempDirectory("mixprop").toString
      // window w drifts iff drifts(w): (900,100) vs the balanced (500,500)
      val events = drifts.zipWithIndex.flatMap { case (drift, w) =>
        val (a, b) = if (drift) (900L, 100L) else (500L, 500L)
        Seq((w * H, "sA", a), (w * H, "sB", b))
      } :+ (drifts.length * H, "sA", 1L) // closer keeps the last window open
      MixMonitor.mixMonitorBatch(
        events.toDF("us", "source", "tokens")
          .select(timestamp_micros(col("us")).as("ts"), col("source"),
            col("tokens")),
        bid = 0, dir, target, tolPpm = 100000L, kConsec = 99, windowUs = H)
      // reference: sequential trailing-run fold over the drift sequence
      val wantPerWin = drifts.scanLeft(0L) { (run, d) =>
        if (d) run + 1 else 0L }.drop(1)
      val got = MixMonitor.readAlerts(spark, dir).collect()
        .filter(_.getAs[String]("source") == "sA")
        .sortBy(_.getAs[Long]("win_start_us"))
        .map(_.getAs[Long]("consec")).toSeq
      val state = spark.read.parquet(s"$dir/state/consec").collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Long]("consec")).toMap
      got == wantPerWin && state("sA") == wantPerWin.last
    }, n = 6)
  }

  test("backfill reconcile equals a from-scratch aggregate for random late carves") {
    import graft.streaming.Backfill
    import spark.implicits._
    val DayUs = 86400L * 1000 * 1000
    val T0 = 1700000000L * 1000 * 1000
    val gen = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, for {
        day <- Gen.choose(0, 4)
        off <- Gen.choose(0L, DayUs - 1)
        et <- Gen.oneOf("click", "view")
        cents <- Gen.choose(0L, 99999L)
        late <- Gen.oneOf(true, false)
      } yield (T0 + day * DayUs + off, et, cents / 100.0, late))
    } yield rows
    check(forAll(gen) { rows =>
      val dir = java.nio.file.Files.createTempDirectory("bfprop").toString + "/pub"
      def df(sel: Boolean) = rows.filter(_._4 == sel).zipWithIndex
        .map { case ((us, et, v, _), i) => (us, et, v, i.toLong) }
        .toDF("us", "event_type", "value", "event_id")
        .select(timestamp_micros(col("us")).as("ts"), col("event_type"),
          col("value"), col("event_id"))
      Backfill.publish(df(false), dir, DayUs)
      Backfill.reconcileLate(spark, dir, df(true), DayUs).count()
      val repaired = spark.read.schema(Backfill.publishedSchema).parquet(dir)
        .select(col("win").cast("long"), col("event_type"), col("cnt"),
          col("sum_v").cast("string"))
        .collect().map(_.toSeq).toSet
      val rows2 = rows.zipWithIndex.map { case ((us, et, v, _), i) => (us, et, v, i.toLong) }
      val fresh = Backfill.aggregateWindows(
        rows2.toDF("us", "event_type", "value", "event_id")
          .select(timestamp_micros(col("us")).as("ts"), col("event_type"),
            col("value"), col("event_id")), DayUs)
        .select(col("win"), col("event_type"), col("cnt"),
          col("sum_v").cast("string"))
        .collect().map(_.toSeq).toSet
      repaired == fresh
    }, n = 6)
  }

  test("CMS buffers: split-invariant merge, order-free, estimates cover exact") {
    // pure-JVM property (no Spark jobs): many cases are cheap
    val genKeys = for {
      n <- Gen.choose(1, 400)
      keys <- Gen.listOfN(n, Gen.choose(-50L, 50L))
      cut <- Gen.choose(0, n)
    } yield (keys, cut)
    check(forAll(genKeys) { case (keys, cut) =>
      def sk(ks: Seq[Long]): graft.functions.CmsBuffer = {
        val b = new graft.functions.CmsBuffer(4, 64)
        ks.foreach(k => b.insert(k, 1L))
        b
      }
      val whole = sk(keys)
      val (l, r) = keys.splitAt(cut)
      val merged = sk(l); merged.mergeFrom(sk(r))
      val mergedRev = sk(r); mergedRev.mergeFrom(sk(l))
      val shuffled = sk(keys.reverse)
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
      whole.counts.toSeq == merged.counts.toSeq &&
        whole.counts.toSeq == mergedRev.counts.toSeq &&
        whole.counts.toSeq == shuffled.counts.toSeq &&
        exact.forall { case (k, c) => whole.estimate(k) >= c }
    }, n = 60)
  }

  test("CMS join-size estimate covers the exact equi-join count on random multisets") {
    val genPair = for {
      a <- Gen.listOf(Gen.choose(-20L, 20L))
      b <- Gen.listOf(Gen.choose(-20L, 20L))
    } yield (a, b)
    check(forAll(genPair) { case (a, b) =>
      def sk(ks: Seq[Long]): Array[Byte] = {
        val buf = new graft.functions.CmsBuffer(4, 256)
        ks.foreach(k => buf.insert(k, 1L))
        graft.functions.CmsAgg.toBytes(buf)
      }
      val ca = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val exact = ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
      graft.functions.CmsAgg.joinSizeEstimate(sk(a), sk(b)) >= exact
    }, n = 60)
  }

  test("incrementalComponents equals from-scratch CC on random old/new splits") {
    import spark.implicits._
    val genSplit = for {
      n <- Gen.choose(2, 25)
      mo <- Gen.choose(1, 25)
      mn <- Gen.choose(1, 15)
      oldE <- Gen.listOfN(mo, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
      newE <- Gen.listOfN(mn, for {
        a <- Gen.choose(0L, (n + 10).toLong); b <- Gen.choose(0L, (n + 10).toLong)
      } yield (a, b))
    } yield (oldE.filter(e => e._1 != e._2), newE.filter(e => e._1 != e._2))
    check(forAll(genSplit) { case (oldE, newE) =>
      oldE.isEmpty || newE.isEmpty || {
        val c0 = GraphOps2.connectedComponents(oldE.toDF("src", "dst"), 30)
        val got = GraphOps2.incrementalComponents(c0, newE.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = GraphOps2.connectedComponents(
          (oldE ++ newE).toDF("src", "dst"), 30)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == want
      }
    }, n = 10)
  }

  test("paraDedup is idempotent on random token sequences") {
    import spark.implicits._
    val genDocs = for {
      nd <- Gen.choose(1, 8)
      docs <- Gen.listOfN(nd, for {
        nt <- Gen.choose(1, 40)
        toks <- Gen.listOfN(nt, Gen.oneOf("a", "b", "c", "d"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    check(forAll(genDocs) { docs =>
      val once = graft.ops.CorpusQuality2.paraDedup(
        docs.toDF("doc_id", "text"), "doc_id", "text", 3)
        .select("doc_id", "cleaned").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSeq
      val twice = graft.ops.CorpusQuality2.paraDedup(
        once.toDF("doc_id", "text"), "doc_id", "text", 3)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
      twice.forall(_._2 == 0L) &&
        twice.map(t => t._1 -> t._3).toMap == once.toMap
    }, n = 8)
  }

  test("NearDupIndex frozen-order query equals the live SSJoin on random corpora") {
    import spark.implicits._
    // small vocab -> high gram overlap -> non-trivial pair sets; docs of
    // >= 3 tokens so every doc has at least one trigram
    val genCorpus = for {
      nd <- Gen.choose(4, 12)
      docs <- Gen.listOfN(nd, for {
        nt <- Gen.choose(3, 12)
        toks <- Gen.listOfN(nt, Gen.oneOf("a", "b", "c"))
      } yield toks.mkString(" "))
      batchMod <- Gen.choose(2, 4)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, batchMod)
    check(forAll(genCorpus) { case (docs, m) =>
      val df = docs.toDF("doc_id", "text")
      val base = df.filter(col("doc_id") % m =!= 0)
      val batch = df.filter(col("doc_id") % m === 0)
      base.isEmpty || batch.isEmpty || {
        val idx = s"/tmp/graft_ndidx_prop/${System.nanoTime()}"
        graft.ops.Dedup.NearDupIndex.build(base, idx)
        val got = graft.ops.Dedup.NearDupIndex.query(spark, idx, batch)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
        val want = graft.ops.Dedup.jaccardPairsPrefixAgainst(
            df, "doc_id", "text", 3, 0.5, col("id") % m === 0)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
        got == want
      }
    }, n = 6)
  }
}
