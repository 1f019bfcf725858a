package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off measurement harness (not a test): the CDC compaction design
  * choice — `Scd.latestByKey`'s map-side-combinable max_by vs the textbook
  * row_number() window — timed on the same events table. Run via
  * `Test/runMain graft.CdcPerfProbe <sfDir> [reps]`.
  */
object CdcPerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.SparkTuning.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("bigint").as("cents"))

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"$label: $s%.2f s ($n rows)"); s
      }
      println(f"$label MIN: ${ts.min}%.2f s")
    }
    time("max_by (Scd.latestByKey)") {
      graft.core.Scd.latestByKey(ev, Seq("user_id", "event_type"), "ts",
        "event_id", Seq("event_id", "cents")).count()
    }
    time("row_number window") {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn").count()
    }
    spark.stop()
  }
}
