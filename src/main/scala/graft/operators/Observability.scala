package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-flight QC counters via `Dataset.observe` (SURVEY.md §2.5
  * obs_metrics): the per-load row/validity counts the reference's loaders
  * print and persist with every run (the counts feeding
  * `ins_provenance` / the loader progress logs in loaders/TCRD.py) —
  * collected DURING the job that writes the data, as accumulator-backed
  * metrics on the plan, never as a second scan.
  *
  * Contrast [[ProvenanceOps.writeWithProvenance]], which deliberately
  * re-reads persisted bytes so its ledger survives nondeterministic
  * upstreams; observe() is the cheap always-on layer (zero extra passes,
  * exact counts of what the job actually processed), and the two compose:
  * observe for run telemetry, provenance read-back for the durable
  * fingerprint. At 100 TB an extra QC scan is real money; a metric bundle
  * on the write plan is free.
  */
object Observability {

  /** Standard QC bundle over (key, value): total rows, null keys, null
    * values, value min/max, and an exact DECIMAL value sum (so the metric
    * is partitioning-independent, same discipline as the oracled aggs). */
  def qcMetrics(keyCol: String, valCol: String): Seq[Column] = Seq(
    count(lit(1)).as("n_rows"),
    sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("null_keys"),
    sum(when(col(valCol).isNull, 1L).otherwise(0L)).as("null_values"),
    min(col(valCol)).as("v_min"),
    max(col(valCol)).as("v_max"),
    sum(col(valCol).cast(DecimalType(38, 6))).as("v_sum"))

  /** Write `df` to parquet with the QC bundle attached to the writing
    * job's plan; returns the observed metrics. One action, one scan. */
  def observedWrite(df: DataFrame, path: String, keyCol: String,
                    valCol: String): Map[String, Any] = {
    val obs = Observation()
    val ms = qcMetrics(keyCol, valCol)
    df.observe(obs, ms.head, ms.tail: _*)
      .write.mode("overwrite").parquet(path)
    obs.get
  }

  /** Attach arbitrary observed metrics to any DataFrame; read
    * `observation.get` after the caller runs its action. */
  def observed(df: DataFrame, metrics: Seq[Column]): (DataFrame, Observation) = {
    val obs = Observation()
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
