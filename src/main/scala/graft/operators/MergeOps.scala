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

  /** Soft-delete variant: update rows with `deleteFlag` true remove the
    * key from the result entirely (the loaders' delete-then-reload step). */
  def upsertWithDeletes(base: DataFrame, updates: DataFrame, key: String,
                        versionCol: String, deleteFlag: String): DataFrame = {
    val merged = upsert(
      base.withColumn(deleteFlag, coalesce(col(deleteFlag), lit(false))),
      updates, key, versionCol)
    merged.filter(!col(deleteFlag))
  }
}
