package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.WholeStageCodegenExec

/** Codegen hygiene for the hot relational core: these queries are the
  * shapes that run over the FULL corpus at 100 TB (scan → filter →
  * project → agg/join/window), so they must stay inside whole-stage
  * codegen — an interpreted expression in this path is a 2-10x row-loop
  * regression that no correctness test notices. Pins (a) at least one
  * WholeStageCodegen span in the executed plan and (b) ZERO
  * CodegenFallback expressions anywhere in it. Sketch/custom-aggregate
  * queries are deliberately out of scope (TypedImperativeAggregate
  * buffers don't codegen and aren't meant to). */
class CodegenSweepSpec extends SparkSpec {

  private val hotPath = Seq(
    "q1_pricing_summary", "q_enrich_join", "q_top_revenue",
    "q_region_volume", "q_semi_join", "q_anti_join", "q_union_dedup",
    "q_window_topk", "q_lag_delta", "q_zscore", "q_percentile",
    "q_token_count", "q_lang_id", "q_quality_score", "q_redact",
    "q_fingerprint", "q_tumbling_window", "q_delta_detect",
    "q_dedup_exact", "q_text_normalize",
    // session-5 corpus-scan additions. q_para_dedup is deliberately NOT
    // pinned: its array higher-order functions (filter/array_position
    // lambdas) are CodegenFallback in Spark — the accepted trade for a
    // ZERO-SHUFFLE plan (the explode+window alternative codegens but
    // shuffles the corpus; the plan-shape spec pins the zero-exchange
    // side). q_ngram_novelty IS pinned: its gram projection moved to the
    // native expr_ngram_hashes codegen expression.
    "q_dedup_savings", "q_calibration", "q_ab_test", "q_ngram_novelty")

  hotPath.foreach { name =>
    test(s"$name: whole-stage codegen, no interpreted fallback in the plan") {
      val df = SparkEntry.queries(name)(spark, TinyDir)
      df.collect() // materialize: AQE collapses codegen stages per-stage
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("*("),
        s"$name has no WholeStageCodegen span:\n$planStr")
      // CodegenFallback is a property of the expression objects themselves,
      // so the optimized logical plan sees the same instances the physical
      // projections would interpret row-at-a-time. Aggregate FUNCTIONS are
      // excluded: imperative aggregate buffers (Percentile, the sketches)
      // evaluate inside the agg operator once per group, not in a per-row
      // projection loop — they are outside codegen by design, not by
      // accident.
      val fallbacks = df.queryExecution.optimizedPlan
        .flatMap(_.expressions)
        .flatMap(_.collect {
          case e: CodegenFallback if !e.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction] => e
        })
        .map(_.getClass.getSimpleName).distinct
      assert(fallbacks.isEmpty,
        s"$name carries interpreted expressions: ${fallbacks.mkString(", ")}")
    }
  }
}
