package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and train/val/test splitting for
  * training-data pipelines.
  *
  * Assignment is a pure function of (id, salt) — the first 16 bits of
  * `md5("<id>:<salt>")` — so the same row lands in the same split at any
  * cluster size, partition layout, or engine (the DuckDB oracle mirrors the
  * arithmetic verbatim). No RNG state, no `rand()` partition sensitivity.
  * The hash-threshold operators are pure codegen'd Column arithmetic: one
  * scan, ZERO shuffles — at 100 TB a split is free, piggybacked on whatever
  * scan already runs. Only the exact-quota variant shuffles (once, by
  * stratum), and is meant for bounded-cardinality strata.
  */
object Sampling {

  /** Uniform bucket in [0, 65536): first 4 hex nibbles of md5("<id>:<salt>"). */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 4),
      16, 10).cast("long")

  /** Deterministic split assignment: `fracs` are (name, fraction) in
    * declaration order, summing to ≤ 1 (any remainder falls into the last
    * split). A row's split is fixed by its id alone — growing the corpus
    * never reassigns existing rows, the property that keeps eval sets
    * uncontaminated across pipeline re-runs.
    */
  def splitColumn(id: Column, salt: String, fracs: Seq[(String, Double)]): Column = {
    require(fracs.nonEmpty && fracs.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions must sum to <= 1: $fracs")
    val b = hashBucket(id, salt)
    val cuts = fracs.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 65536).toLong
    }.tail
    fracs.zip(cuts).dropRight(1).foldRight(lit(fracs.last._1): Column) {
      case (((name, _), cut), elseCol) => when(b < cut, name).otherwise(elseCol)
    }
  }

  /** Proportional-in-expectation sample: keep rows with bucket < frac·2¹⁶.
    * Shuffle-free and stratum-agnostic — uniform hashing makes every
    * stratum's keep-rate ≈ frac. This is the 100-TB path.
    */
  def sampleByHash(df: DataFrame, idCol: String, frac: Double,
      salt: String): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < math.round(frac * 65536))

  /** EXACT per-stratum quota: ⌈frac·n⌉ rows of every stratum, chosen by
    * hash order (so membership is still deterministic and re-run-stable
    * while the stratum grows only at the quota boundary). One shuffle by
    * stratum; intended for bounded-cardinality strata (languages, sources)
    * — for unbounded strata use [[sampleByHash]].
    */
  def stratifiedExact(df: DataFrame, idCol: String, strataCols: Seq[String],
      frac: Double, salt: String): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
    val b = hashBucket(col(idCol), salt)
    df.withColumn("_rn", row_number().over(w.orderBy(b, col(idCol))))
      .withColumn("_n", count(lit(1)).over(w))
      .filter(col("_rn") <= ceil(col("_n") * frac))
      .drop("_rn", "_n")
  }
}
