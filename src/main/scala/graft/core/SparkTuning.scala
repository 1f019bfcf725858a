package graft.core

import org.apache.spark.sql.SparkSession

/** Session-level optimizer tuning applied at every table load.
  *
  * `InferFiltersFromGenerate` clones the generator's child expression into a
  * `size(e) > 0` filter; predicate pushdown then sinks that clone below the
  * projections that named its sub-expressions, re-inlining the full lambda
  * pipeline. Higher-order functions are interpreted and share no CSE, so a
  * shingling expression ends up re-tokenizing the document once per array
  * element inside the filter — measured 10-70× slowdowns on the dedup and
  * apply_dimension operators. The pruning the rule buys (skipping rows with
  * empty arrays before the Generate) is negligible for every operator in
  * this engine, so it is excluded wholesale.
  */
object SparkTuning {

  private val excluded =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  def tune(spark: SparkSession): Unit = {
    val key = "spark.sql.optimizer.excludedRules"
    val cur = spark.conf.getOption(key).getOrElse("")
    if (!cur.contains(excluded)) {
      spark.conf.set(key, if (cur.isEmpty) excluded else s"$cur,$excluded")
    }
    // Floor AQE's post-shuffle coalescing at the session's core count.
    // AQE merges partitions by BYTES (parallelismFirst still bottoms out at
    // minPartitionSize = 1 MB), so a stage whose rows are small but whose
    // per-row compute is heavy — candidate-pair verification joins, packed
    // band tables — collapses to ONE task and serializes the work
    // (measured: fuzzy_join's verify stage ran 2.7 s on 1 task at cpus=8
    // over a 0.5 MB shuffle read). The floor is derived from
    // defaultParallelism, never a constant: on a real cluster partition
    // counts exceed it anyway, so it only bites where coalescing would
    // leave cores idle. Respect an explicit user/session setting.
    val minPN = "spark.sql.adaptive.coalescePartitions.minPartitionNum"
    if (spark.conf.getOption(minPN).isEmpty) {
      spark.conf.set(minPN, spark.sparkContext.defaultParallelism.toString)
    }
    // engine-native codegen'd functions (see graft.functions.DotProduct)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => graft.functions.DotProduct(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_probe",
      exprs => graft.functions.BloomProbe(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_repetition",
      exprs => graft.functions.RepetitionStats(exprs(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      exprs => exprs match {
        case Seq(text, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
          graft.functions.Shingles(text, n)
        case _ => throw new IllegalArgumentException(
          "graft_shingles(text, n) requires a literal int n")
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash_bits",
      exprs => graft.functions.SimhashBits(exprs(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe",
      exprs => graft.functions.BpeEncode(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_trigram_score",
      exprs => graft.functions.TrigramScore(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dsir_units",
      exprs => graft.functions.DsirUnits(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_html_extract",
      exprs => graft.functions.HtmlExtract(exprs(0)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngrams",
      exprs => exprs match {
        case Seq(text, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
          graft.functions.Shingles(text, n, distinct = false)
        case _ => throw new IllegalArgumentException(
          "graft_ngrams(text, n) requires a literal int n")
      },
      "built-in")
    // engine-native optimizer rules (see graft.plans.NanosPredicatePushdown)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.NanosPredicatePushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.NanosPredicatePushdown
    }
  }
}
