package graft.pipeline

import graft.core.Joins
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Language-model quality scoring for corpus filtering — the CCNet-style
  * "perplexity against a model of the good distribution" rule (Wenzek et
  * al. 2020, public), with a deliberately simple model: an add-one-smoothed
  * char-TRIGRAM frequency LM trained on the target subset of the same
  * corpus. Weaker than a Kneser-Ney 5-gram LM, but the plumbing — train on
  * target, broadcast the model, score every doc at scan speed — is exactly
  * the production shape, and the model needs no external artifacts.
  *
  * Scale shape: one explode to (doc, trigram) rows; the model is ONE
  * combinable groupBy over the TARGET trigrams (bounded by the observed
  * char-trigram space, ≪ corpus); scoring is a size-gated broadcast join
  * plus one per-doc aggregation. The trigram rows feed both the training
  * and the scoring branch, so they persist like the MinHash diamond.
  *
  * Determinism: per-trigram log-probs are quantized ONCE to integer
  * micro-units; per-doc scores are integer sums — summation order cannot
  * perturb the DuckDB-oracle match (same discipline as
  * [[Importance.dsirWeights]]).
  */
object LanguageModel {

  /** Per-document cross-entropy under the target char-trigram LM:
    * `(idCol, n_tri, lp_sum, xent)` where `lp_sum = Σ lp_units(tri)`,
    * `lp_units(tri) = floor(ln((cnt+1)/(N+D+1))·scale + ½)` for target
    * trigram counts `cnt` (unseen trigrams get the `cnt = 0` constant),
    * and `xent = −lp_sum/(n_tri·scale)` in nats (0.0 for docs shorter
    * than 3 chars). Lower xent = more target-like; callers threshold the
    * ROUNDED value.
    *
    * Precondition: `isTarget` must select a non-empty subset with at least
    * one trigram — an empty model has no distribution to score against
    * (the smoothing scalars become NULL and every score degenerates).
    */
  def charTrigramScore(df: DataFrame, idCol: String, text: Column,
      isTarget: Column, scale: Long = 1000000L,
      cacheTrigrams: Boolean = true): DataFrame = {
    // Materialize the normalized string as a NAMED column before the HOF:
    // transform() is interpreted and does no CSE, so inlining trim(lower())
    // into the lambda would re-normalize the whole document PER TRIGRAM —
    // O(len²) per doc, measured 45 s → 3 s on the 50k-doc stress corpus.
    // The multi-use non-trivial alias survives CollapseProject (same
    // discipline as Dedup.shinglesHof).
    val base = df.select(col(idCol), isTarget.as("_tgt"),
      trim(lower(text)).as("_s"))
    val len = length(col("_s"))
    val nW = when(len < 3, lit(0L)).otherwise(len.cast("long") - 2L)
    // sequence(1, 0) DESCENDS — the nW===0 guard avoids it
    val winArr = when(nW === 0L, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1L), nW),
        i => col("_s").substr(i.cast("int"), lit(3))))
    val triBase = base.select(col(idCol), col("_tgt"),
      explode(winArr).as("tri"))
    val tris = if (cacheTrigrams)
      triBase.persist(StorageLevel.MEMORY_AND_DISK)
    else triBase
    // The MODEL is tiny (bounded by the observed trigram space, ≪ corpus):
    // checkpoint it eagerly so the smoothing scalars and the per-trigram
    // log-probs derive from ONE corpus pass — leaving them as lazy
    // sub-plans replays the 15M-row explode once per branch (measured 3
    // Generate nodes + two BroadcastNestedLoopJoin crossJoins in the
    // cache-off plan) and hides the model's true size from maybeBroadcast.
    val tcnt = tris.filter(col("_tgt"))
      .groupBy(col("tri")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // two scalars, ONE bounded driver row — inlined as literals, so the
    // scoring pass carries no crossJoin at all
    val totRow = tcnt.agg(sum(col("cnt")), count(lit(1))).first()
    val nTot = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    val denom = (nTot + totRow.getLong(1) + 1L).toDouble
    val lp = tcnt
      .withColumn("lp_units",
        floor(log((col("cnt") + 1L).cast("double") / denom) * scale + 0.5)
          .cast("long"))
      .select(col("tri"), col("lp_units"))
    // same arithmetic as the expression above at cnt = 0 (unseen trigram)
    val unseenUnits = math.floor(math.log(1.0 / denom) * scale + 0.5).toLong
    val scored = tris
      .join(Joins.maybeBroadcast(lp), Seq("tri"), "left")
      .withColumn("_u", coalesce(col("lp_units"), lit(unseenUnits)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tri"), sum(col("_u")).as("lp_sum"))
    val res = df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tri", "lp_sum"))
      .withColumn("xent", when(col("n_tri") === 0L, 0.0).otherwise(
        round(-col("lp_sum") / (col("n_tri") * scale).cast("double"), 6)))
    // close the cache scope: materialize per-doc scores while the trigram
    // rows are hot, then release them (see graft.core.Caching)
    if (cacheTrigrams) graft.core.Caching.scoped(res, tris) else res
  }
}
