package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stateful-streaming semantics: the session operator must reach the same
  * answer as the batch sessionize logic while carrying only per-user state
  * across micro-batches.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("sessionizeStream matches batch sessionization across micro-batches") {
    val gap = 1800L * 1000000L // 30 min in micros
    val m = 60L * 1000000L     // one minute
    // user 1: events at 0,10,20 min (one session), then 120..125 min (second)
    // user 2: single event, then one more within the gap in a LATER batch
    //         (state must extend the open session, not start a new one)
    val chunk1 = Seq((1L, 0L), (1L, 10 * m), (2L, 5 * m))
    val chunk2 = Seq((1L, 20 * m), (2L, 25 * m))
    val chunk3 = Seq((1L, 120 * m), (1L, 125 * m))

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val q = StreamingOps.sessionizeStream(stream.toDS(), gap)
      .writeStream.outputMode("update").format("memory")
      .queryName("sess_test").start()
    try {
      Seq(chunk1, chunk2, chunk3).foreach { c =>
        stream.addData(c); q.processAllAvailable()
      }
    } finally q.stop()

    // snapshots are monotone → the max per user is the final state
    val got = spark.table("sess_test")
      .groupBy(col("user_id"))
      .agg(max(col("n_sessions")).as("n"), max(col("longest")).as("l"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // batch ground truth: user 1 → sessions {3 events, 2 events};
    // user 2 → one session of 2 events
    assert(got == Map(1L -> ((2L, 3L)), 2L -> ((1L, 2L))))
  }
}
