package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch upsert semantics (SURVEY.md §2.1 sink_upsert): every reference
  * loader is an insert-or-update against the warehouse
  * (loaders/TCRD.py `ins_*`/`upd_*` helpers); the Spark-native equivalent
  * is a keyed merge producing the next table snapshot — the pattern a
  * Delta/Iceberg MERGE compiles to, expressed directly so it runs on
  * plain parquet.
  *
  * Scale shape: one shuffle on the key (the window), no driver-side
  * diffing. With both sides bucketed by the key (graft.sources.Buckets)
  * even that shuffle disappears.
  */
object MergeOps {

  /** Last-writer-wins upsert: rows from `updates` replace same-key rows in
    * `base`; unmatched update rows are inserts. Both sides must share the
    * schema. `versionCol` breaks ties deterministically (higher wins;
    * updates win over base at equal version). */
  def upsert(base: DataFrame, updates: DataFrame, key: String, versionCol: String): DataFrame = {
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(key)
      .orderBy(col(versionCol).desc, col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** Incremental aggregate maintenance: fold a delta batch into an
    * existing (cnt, per-column sums) rollup WITHOUT recomputing from the
    * full fact table — the nightly-load refresh of a 100 TB table's
    * summary: cost is O(delta + touched groups), not O(history). The
    * aggregate must be algebraic (count/sum here; avg derives as
    * sum/cnt downstream). `baseAgg` columns: keys ++ ("cnt" +: sumCols);
    * delta rows are raw facts. Deletions fold in as negative deltas
    * (pass `negate=true`). Groups whose count reaches zero drop out. */
  def incrementalAgg(baseAgg: DataFrame, delta: DataFrame, keys: Seq[String],
                     sumCols: Seq[String], negate: Boolean = false): DataFrame = {
    val sign = if (negate) lit(-1L) else lit(1L)
    val deltaAgg = delta.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(col(c)).as(c)): _*)
    val signedDelta = ("cnt" +: sumCols).foldLeft(deltaAgg)((df, c) =>
      df.withColumn(c, col(c) * sign))
    baseAgg.unionByName(signedDelta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sumCols.map(c => sum(col(c)).as(c)): _*)
      .filter(col("cnt") > 0)
  }

  /** Incremental JOIN maintenance: the delta of A⋈B after delta batches
    * land on both sides, computed WITHOUT re-joining the full tables —
    * Δ(A⋈B) = ΔA⋈B ∪ A'⋈ΔB where A' = A∪ΔA (the standard delta-rule
    * factorization; each term joins a delta against one full side, so
    * the cost is O(|Δ|·match-rate), not O(|A|·|B|)). Appends only — the
    * retraction variant composes with [[incrementalAgg]]'s negative
    * deltas downstream. The maintained view is the union of the previous
    * materialization and this delta; the spec pins delta-applied ==
    * full-recompute equality.
    *
    * At 100 TB: ΔA and ΔB are load-batch-sized, so both terms plan as
    * broadcast joins against the big sides; the full A⋈B never runs
    * again after the initial materialization. */
  def incrementalJoinDelta(baseA: DataFrame, deltaA: DataFrame,
                           baseB: DataFrame, deltaB: DataFrame,
                           key: String): DataFrame = {
    val aPrime = baseA.unionByName(deltaA)
    deltaA.join(baseB, key).unionByName(aPrime.join(deltaB, key))
  }

  /** Soft-delete variant: update rows with `deleteFlag` true remove the
    * key from the result entirely (the loaders' delete-then-reload step). */
  def upsertWithDeletes(base: DataFrame, updates: DataFrame, key: String,
                        versionCol: String, deleteFlag: String): DataFrame = {
    val merged = upsert(
      base.withColumn(deleteFlag, coalesce(col(deleteFlag), lit(false))),
      updates, key, versionCol)
    merged.filter(!col(deleteFlag))
  }

  /** Targeted physical delete (right-to-be-forgotten / retention purge)
    * over a `partitionBy(partCol)` parquet table: rewrite ONLY the
    * partitions that contain doomed keys; every other partition's files
    * are left byte-identical on disk. At 100 TB this is the difference
    * between rewriting gigabytes and rewriting the table — the same
    * touched-file-only contract a Delta/Iceberg DELETE compiles to,
    * expressed on plain parquet.
    *
    * Mechanics: (1) a column-pruned semi-join finds touched partition
    * values (doomed side broadcast — delete batches are small by nature);
    * (2) surviving rows of ONLY those partitions rewrite via dynamic
    * partition overwrite (untouched partitions are not in the written
    * data, so the committer never looks at them); (3) partitions whose
    * every row was doomed — which dynamic overwrite would silently leave
    * stale — are dropped explicitly. The rewrite is localCheckpoint-
    * materialized first because it reads the same files it replaces; on a
    * cluster, stage to a sibling dir and swap (the Tables.compact
    * pattern) for the same effect without block-store residency.
    *
    * Returns the touched partition values (feed them to
    * ProvenanceOps.record for the deletion audit trail). */
  def deleteByKey(spark: org.apache.spark.sql.SparkSession, tableDir: String,
                  partCol: String, keyCol: String,
                  doomed: DataFrame): Seq[String] = {
    val t = spark.read.parquet(tableDir)
    val touched = t.select(partCol, keyCol)
      .join(broadcast(doomed), Seq(keyCol), "left_semi")
      .select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (touched.nonEmpty) {
      val survivors = t.filter(col(partCol).cast("string").isin(touched: _*))
        .join(broadcast(doomed), Seq(keyCol), "left_anti")
        .select(t.columns.map(col): _*)
        .localCheckpoint(true)
      val kept = survivors.select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet
      survivors.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol).parquet(tableDir)
      val fs = new org.apache.hadoop.fs.Path(tableDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      touched.filterNot(kept).foreach { p =>
        fs.delete(new org.apache.hadoop.fs.Path(tableDir, s"$partCol=$p"), true)
        ()
      }
    }
    touched
  }
}
