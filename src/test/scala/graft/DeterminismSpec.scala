package graft

/** Partition-invariance guard: the determinism contract (SURVEY.md §5)
  * promises bit-identical output for ANY shuffle parallelism. These specs
  * run representative tie-break/float/agg-heavy queries under two shuffle
  * widths and require identical collected rows — the in-repo twin of the
  * manual 3/8/32-thread Verify sweeps. */
class DeterminismSpec extends SparkSpec {

  private val probes = Seq(
    "q_weighted_sample",  // hash-priority sampling + window tie-breaks
    "q_bm25",             // ln/pow doubles + decimal score sum + global top-k
    "q_consensus_mode",   // mode with tie-break
    "q_string_agg",       // collect_list ordering hazard (sorted by op)
    "q_quantile_norm",    // cross-group rank join
    "q_tfidf",            // idf doubles + per-doc top-k
    "q_seq_pack",         // running sums
    "q_topk_agg",         // custom mergeable heap aggregate
    "q_ewma",             // double fold order + lag windows
    "q_strip_boilerplate", // collect_list reassembly ordering hazard
    "q_id_resolve")       // min-struct argmin across union stages

  probes.foreach { name =>
    test(s"$name is identical under 3-way and 13-way shuffles") {
      val fn = SparkEntry.queries(name)
      def run(parts: Int): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        try fn(spark, TinyDir).collect().map(_.toString).toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      assert(run(3) == run(13), s"$name output depends on shuffle width")
    }
  }
}
