package graft

import graft.sources.{Tables => T}

/** Empty-input sweep: every query runs against ZERO-ROW tables with the
  * real schemas and either returns a (possibly empty) result or is on
  * the documented requires-data list. The first week of real operation
  * always includes an empty partition, a not-yet-loaded source, or a
  * filter that matches nothing — an operator that NPEs or throws on
  * empty input turns a data gap into a pipeline outage. */
class EmptyInputSweepSpec extends SparkSpec {

  /** Operators that genuinely need data to exist, with the reason —
    * model fits and driver folds over a series have no sensible output
    * for an empty world and fail FAST with a clear error instead. */
  private val requiresData: Map[String, String] = Map(
    "q_ann_ivf" -> "k-means codebook fit needs at least one vector",
    "q_ivf_tune" -> "k-means codebook fit needs at least one vector",
    "q_ann_pq" -> "PQ codebook fit needs at least one vector",
    // q_dedup_embed / q_knn_graph left this list in r10: the driver-side
    // router treats an empty sample as degenerate and ships the fused
    // scan, which is trivially empty-correct
    "q_embed_cluster" -> "k-means codebook fit needs at least one vector",
    "q_cluster_labels" -> "k-means codebook fit needs at least one vector",
    "q_semdedup" -> "k-means codebook fit needs at least one vector",
    "q_d4_diversify" -> "k-means codebook fit needs at least one vector",
    "q_kcenter_coreset" -> "greedy center pick needs at least one vector",
    "q_linear_probe" -> "probe fit needs labeled vectors",
    "q_logistic_probe" -> "probe fit needs labeled vectors",
    "q_multiclass_probe" -> "probe fit needs labeled vectors",
    "q_pca_embed" -> "covariance undefined over zero vectors",
    "q_embed_outliers" -> "covariance undefined over zero vectors",
    "q_stats_table" -> "zone-sidecar demo requires rows to index")

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    T.names.foreach { n =>
      T.tableNormalized(spark, TinyDir, n).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  SparkEntry.allQ.foreach { q =>
    test(s"${q.name}: empty input is a result, not an outage") {
      if (requiresData.contains(q.name)) {
        // documented requires-data operator: any failure is acceptable as
        // long as it is an ERROR, not a wrong answer — just pin that the
        // classification stays curated (remove entries that start passing)
        val outcome = scala.util.Try(q.fn(spark, emptyDir).count())
        assert(outcome.isFailure,
          s"${q.name} now handles empty input — remove it from requiresData")
      } else {
        val n = q.fn(spark, emptyDir).count()
        assert(n >= 0)
      }
    }
  }
}
