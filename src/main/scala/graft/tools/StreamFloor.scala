package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stream harness-floor measurement: times a DEGENERATE stream (four
  * rows, stateless projection, memory sink) through the exact
  * [[graft.streaming.StreamingOps]] run machinery, bracketed by the same
  * contention canary the bench carries. The probe's min wall time is the
  * irreducible start/plan/commit/stop cost every streaming registry row
  * pays on top of its real work — the number that adjudicates whether the
  * streaming family's bench total is harness floor or state-store cost.
  * Honors SPARK_GRAFT_STREAM_TRIGGER so the default-trigger and
  * AvailableNow paths A/B under one canary.
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 1L << 24, 1L, 8)
        .selectExpr("sum(id % 7) as s", "count(1) as n")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val c0 = (1 to 3).map(_ => canary()).min
    val times = (1 to reps).map { r =>
      val t0 = System.nanoTime()
      graft.streaming.StreamingOps.floorProbe(spark, s"graft_floor_$r")
      (System.nanoTime() - t0) / 1e9
    }
    val c1 = (1 to 3).map(_ => canary()).min
    val trig = sys.env.getOrElse("SPARK_GRAFT_STREAM_TRIGGER", "default")
    println(f"""{"probe":"stream_floor","trigger":"$trig","reps":$reps,""" +
      f""""min":${times.min}%.3f,"median":${times.sorted.apply(reps / 2)}%.3f,""" +
      f""""all":[${times.map(t => f"$t%.3f").mkString(",")}],""" +
      f""""canary_before":$c0%.3f,"canary_after":$c1%.3f}""")
    spark.stop()
  }
}
