package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.headOption.map(_.split(',').toSet)
    // The measured action is a noop-format write, not count(): under count()
    // Catalyst prunes every unreferenced aggregate/projection expression, so
    // compute-heavy plans would be under-measured; noop materialises every
    // output column and discards rows at the sink.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // warm the session once (codegen, parquet footers) so the first measured
    // query doesn't absorb JVM start-up
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // min of two runs per query: single-run numbers swing with GC/compilation
    // noise; the minimum is the stable estimate of the plan's cost
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        def once(): Double = {
          val t0 = System.nanoTime()
          try { run(fn) } catch { case _: Throwable => () }
          (System.nanoTime() - t0) / 1e9
        }
        val t = math.min(once(), once())
        name -> t
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
