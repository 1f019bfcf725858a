package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

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
}
