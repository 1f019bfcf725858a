package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
