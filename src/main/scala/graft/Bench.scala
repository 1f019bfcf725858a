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
    spark.sparkContext.setLogLevel("ERROR")
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
    // A failing query must surface as an error, not report the fast time of
    // a broken run (the correctness gate would catch it too, but the bench
    // record has to be honest on its own).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // min of two runs per query: single-run numbers swing with GC/compilation
    // noise; the minimum is the stable estimate of the plan's cost
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .flatMap { case (name, fn) =>
        def once(): Option[Double] = {
          val t0 = System.nanoTime()
          try { run(fn); Some((System.nanoTime() - t0) / 1e9) }
          catch {
            case e: Throwable =>
              errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"
              None
          }
        }
        (once(), once()) match {
          case (Some(a), Some(b)) => Some(name -> math.min(a, b))
          case _ => None
        }
      }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    // millisecond precision keeps the line SHORT — a 74-query object at full
    // double precision was long enough to get tail-truncated by the driver
    def sec(t: Double): String = f"$t%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // ONE parseable line, printed alone and flushed BEFORE session teardown
    // so no shutdown logging can interleave with it
    System.out.println(
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
