package graft.core

import org.apache.spark.sql.DataFrame
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
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      direction: String = "backward", strict: Boolean = false): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
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
}
