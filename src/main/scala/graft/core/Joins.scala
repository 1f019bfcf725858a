package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-side sizing helpers.
  *
  * A bare `broadcast(df)` hint is an unconditional promise that the side fits
  * in driver + executor memory; on a 100-TB run a full-resolution mask cube or
  * the lower-dimensional side of a merge can be as big as the data itself, and
  * the hint would OOM the driver. Instead we gate the hint on Catalyst's own
  * size estimate and otherwise leave the join strategy to Catalyst/AQE, which
  * re-plans sort-merge → broadcast at runtime when the built side turns out
  * small anyway.
  */
object Joins {

  /** Default cap: conservative multiple of the usual 10 MB
    * autoBroadcastJoinThreshold — logical-plan estimates overshoot after
    * aggregations, and a hint below this is still safely broadcastable.
    */
  val DefaultBroadcastCap: Long = 256L << 20

  /** Attach a broadcast hint only when Catalyst's logical size estimate is
    * below `capBytes`; otherwise return the frame unhinted so the optimizer
    * and AQE pick the strategy from runtime statistics.
    */
  def maybeBroadcast(df: DataFrame, capBytes: Long = DefaultBroadcastCap): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= BigInt(capBytes)) broadcast(df) else df
  }

  /** As-of (point-in-time) join: enrich every left row with the payload of
    * the temporally nearest right row per key — `backward` = latest right
    * with `rightTime <= leftTime` (the classic "state as of this event"),
    * `forward` = earliest right with `rightTime >= leftTime`; `strict`
    * excludes equal timestamps. Left rows with no match keep null payloads
    * (left-outer semantics).
    *
    * Spark has no native as-of join; the naive encodings are a range
    * inequality join (BroadcastNestedLoop / O(n·m)) or a per-key
    * max-subquery + rejoin (two extra shuffles). This is instead the
    * sort-merge form: tag both sides, union, and take
    * `last(payload, ignoreNulls)` over ONE window partitioned by key,
    * ordered by (time, tag) with a GROWING frame — each side is shuffled
    * once on the key, ordering within a partition does the matching, and
    * the frame never re-aggregates (O(n) per key, the same discipline as
    * the cumulative operators). `forward` reuses the identical plan with
    * the time order reversed, not a shrinking frame.
    *
    * Ties among right rows sharing (key, time): the largest payload struct
    * wins — deterministic across partitionings.
    *
    * `payload` names must not collide with left columns.
    */
  /** Internal helper-column names must not pre-exist on an input:
    * `withColumn` would silently REPLACE the user's column and the final
    * projection would emit internal values under the user's name.
    */
  private def requireNoInternal(df: DataFrame, names: Seq[String],
      op: String): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"$op: input columns ${clash.mkString(",")} collide with internal " +
        "helper names; rename them first")
  }

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      direction: String = "backward", strict: Boolean = false): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val internal = Seq("_t", "_p", "_tag", "_side", "_m")
    requireNoInternal(left, internal, "asofJoin")
    requireNoInternal(right, internal, "asofJoin")
    val leftCols = left.columns.toSeq
    require(payload.forall(p => !leftCols.contains(p)),
      s"payload columns ${payload.mkString(",")} collide with left columns")
    // inclusive: right rows at an equal time must be visible to the left row
    // → they sort first; strict: they sort after and fall out of the frame
    val (rightTag, leftTag) = if (strict) (1, 0) else (0, 1)

    val r = right.select((keys.map(col) :+
        col(rightTime).as("_t") :+ struct(payload.map(col): _*).as("_p")): _*)
      .withColumn("_tag", lit(rightTag)).withColumn("_side", lit(0))
    val extras = leftCols.filterNot(keys.contains)
    val l = left.withColumn("_t", col(leftTime))
      .withColumn("_p", lit(null).cast(r.schema("_p").dataType))
      .withColumn("_tag", lit(leftTag)).withColumn("_side", lit(1))
    val rAligned = extras.foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = (keys ++ extras).map(col) ++ Seq(col("_t"), col("_p"),
      col("_tag"), col("_side"))
    val unioned = l.select(cols: _*).unionByName(rAligned.select(cols: _*))

    val timeOrd = if (direction == "backward") col("_t").asc else col("_t").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("_tag").asc, col("_p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned.withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("_m").getField(p).as(p)): _*)
  }

  /** Exact floor-division of a BIGINT column by a positive literal width.
    * `x - pmod(x, w)` is an exact multiple of `w`; the division runs in
    * decimal because Spark's `/` on longs is DOUBLE division, which
    * misrounds above 2^53 (epoch-nanos territory). Floors toward -infinity
    * for negative values, unlike SQL `div`'s truncation toward zero.
    */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  /** Range (point-in-interval) join: each `points` row joins the `intervals`
    * rows whose half-open `[lo, hi)` contains its `point`, matching on
    * `keys` equality first. All three bound columns must be BIGINT (cast
    * timestamps to epoch seconds/micros at the call site).
    *
    * Spark plans a bare `p >= lo AND p < hi` predicate as a broadcast
    * nested loop (or a cartesian when neither side fits) — O(n·m) row
    * probes that no 100-TB run survives. This is the bucketed form: each
    * interval is exploded to the bucket ids it covers
    * (`sequence(⌊lo/w⌋, ⌊(hi-1)/w⌋)`, codegen'd, no UDF), each point maps
    * to exactly ONE bucket, and the join becomes an equi-join on
    * `keys :+ bucket` — one shuffle per side, sort-merge or broadcast as
    * the optimizer sees fit, residual bound-filter after. A point lands in
    * a single bucket so the output needs no dedup.
    *
    * `bucketWidth` trades replication for selectivity: replication per
    * interval is `span/width + 1`, probe fan-in per point is the intervals
    * overlapping its bucket. `maxBucketsPerInterval` bounds the explode —
    * a single degenerate interval spanning the whole axis would otherwise
    * replicate itself into every bucket (the classic skew cliff); crossing
    * it raises at executor time with the offending span in the message
    * rather than silently materializing the blow-up.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, point: String,
      lo: String, hi: String, keys: Seq[String] = Nil, bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096, joinType: String = "inner"): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(joinType == "inner" || joinType == "left",
      s"joinType must be inner|left, got $joinType")
    requireNoInternal(points, Seq("_b"), "rangeJoin")
    requireNoInternal(intervals, Seq("_b"), "rangeJoin")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns ${overlap.mkString(",")} appear on both sides")

    val firstB = floorDiv(col(lo), bucketWidth)
    val lastB = floorDiv(col(hi) - lit(1L), bucketWidth)
    val guarded = when(lastB - firstB >= lit(maxBucketsPerInterval.toLong),
        raise_error(concat(lit(s"rangeJoin: interval spans > $maxBucketsPerInterval" +
          s" buckets of width $bucketWidth (["), col(lo), lit(", "), col(hi),
          lit(")); widen bucketWidth or split the interval"))))
      .otherwise(sequence(firstB, lastB))
    val ivals = intervals.filter(col(lo) < col(hi))
      .withColumn("_b", explode(guarded))
    val pts = points.withColumn("_b", floorDiv(col(point), bucketWidth))

    val cond = keys.map(k => pts(k) === ivals(k))
      .fold(pts("_b") === ivals("_b"))(_ && _) &&
      pts(point) >= ivals(lo) && pts(point) < ivals(hi)
    val ivalCols = intervals.columns.filterNot(keys.contains).toSeq
    pts.join(ivals, cond, joinType)
      .select(points.columns.toSeq.map(pts(_)) ++ ivalCols.map(ivals(_)): _*)
  }

  /** Interval-overlap join: pairs of (left, right) rows whose half-open
    * intervals intersect (`lLo < rHi && rLo < lHi`), matching on `keys`
    * equality first. Same bucketed plan as [[rangeJoin]] — both sides
    * explode to covered buckets and equi-join on `keys :+ bucket` — but an
    * overlapping pair shares EVERY bucket their intersection covers, so the
    * join keeps only the bucket that holds `max(lLo, rLo)`: each pair is
    * emitted exactly once with no distinct (which would shuffle the joined
    * payload a second time).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      keys: Seq[String] = Nil, bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    requireNoInternal(left, Seq("_b"), "intervalOverlapJoin")
    requireNoInternal(right, Seq("_b"), "intervalOverlapJoin")
    val overlap = right.columns.toSet.intersect(left.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns ${overlap.mkString(",")} appear on both sides")

    def explodeBuckets(df: DataFrame, loC: String, hiC: String): DataFrame = {
      val firstB = floorDiv(col(loC), bucketWidth)
      val lastB = floorDiv(col(hiC) - lit(1L), bucketWidth)
      df.filter(col(loC) < col(hiC)).withColumn("_b",
        explode(when(lastB - firstB >= lit(maxBucketsPerInterval.toLong),
            raise_error(concat(
              lit(s"intervalOverlapJoin: interval spans > $maxBucketsPerInterval" +
                s" buckets of width $bucketWidth (["), col(loC), lit(", "),
              col(hiC), lit(")); widen bucketWidth or split the interval"))))
          .otherwise(sequence(firstB, lastB))))
    }
    val l = explodeBuckets(left, lLo, lHi)
    val r = explodeBuckets(right, rLo, rHi)
    val cond = keys.map(k => l(k) === r(k)).fold(l("_b") === r("_b"))(_ && _) &&
      l(lLo) < r(rHi) && r(rLo) < l(lHi) &&
      l("_b") === floorDiv(greatest(l(lLo), r(rLo)), bucketWidth)
    val rCols = right.columns.filterNot(keys.contains).toSeq
    l.join(r, cond)
      .select(left.columns.toSeq.map(l(_)) ++ rCols.map(r(_)): _*)
  }
}
