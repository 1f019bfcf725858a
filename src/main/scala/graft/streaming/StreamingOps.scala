package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is batch-only (SURVEY §2.13),
  * but the long-form cube model extends to streams unchanged: a streaming
  * DataFrame of (t, dims, value) rows flows through the same Column-tree
  * operators; temporal aggregation becomes watermarked tumbling windows.
  * This module carries the streaming shape of aggregate_temporal_period —
  * the operator a live ingest pipeline needs.
  */
object StreamingOps {

  /** Tumbling-window aggregation over a parquet-backed event stream,
    * driven to completion synchronously (file source + memory sink) so
    * batch harnesses can verify the result. In production the same plan
    * runs against a live source with `.start()` left running; watermark
    * bounds the state store.
    */
  def windowedEventAggregate(spark: SparkSession, eventsPath: String,
      windowLength: String = "6 hours", queryName: String = "graft_stream")
      : DataFrame = {
    graft.core.SparkTuning.tune(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsPath).schema
    // the file streaming source wants a DIRECTORY; select the single table
    // file out of the shared testdata dir with a glob filter
    val dir = new java.io.File(eventsPath).getParent
    val fileName = new java.io.File(eventsPath).getName
    val events = spark.readStream.schema(schema)
      .option("pathGlobFilter", fileName)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 day")

    val agg = events
      .groupBy(window(col("ts"), windowLength), col("event_type").as("band"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("bigint")).as("sum_cents"))

    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    spark.table(queryName).select(
      (unix_micros(col("window.start")) / lit(21600000000L)).cast("bigint")
        .as("bucket"),
      col("band"), col("n"), col("sum_cents"))
  }

  /** Per-user session accumulator for [[sessionizeStream]]: the open
    * session's last event time + length, and the closed sessions' lengths.
    */
  final case class SessState(lastTs: Long, curLen: Long, closed: List[Long])
  final case class SessOut(user_id: Long, n_sessions: Long, longest: Long)

  /** Stateful streaming sessionization — the live counterpart of the batch
    * `sessionize` query, built on `flatMapGroupsWithState`: per-user state
    * carries the open session across micro-batches, a gap larger than
    * `gapMicros` closes it, and every trigger emits the user's updated
    * (n_sessions, longest) snapshot (monotone, so Update sinks converge on
    * the final values).
    *
    * Input rows are (user_id, event-time micros). Within a batch events are
    * sorted; ACROSS batches the operator assumes per-user event-time order —
    * the usual contract for session streams fed from a watermarked,
    * time-partitioned source. State is one small record per ACTIVE user,
    * the property that lets this run indefinitely on an unbounded stream.
    */
  def sessionizeStream(events: Dataset[(Long, Long)],
      gapMicros: Long): Dataset[SessOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long)], state: GroupState[SessState]) =>
          val sorted = it.map(_._2).toArray.sorted
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, Nil))
          sorted.foreach { t =>
            st =
              if (st.curLen == 0) SessState(t, 1, st.closed)
              else if (t - st.lastTs > gapMicros)
                SessState(t, 1, st.curLen :: st.closed)
              else SessState(t, st.curLen + 1, st.closed)
          }
          state.update(st)
          val all = if (st.curLen > 0) st.curLen :: st.closed else st.closed
          if (all.isEmpty) Iterator.empty
          else Iterator.single(SessOut(user, all.size.toLong, all.max))
      }
  }
}
