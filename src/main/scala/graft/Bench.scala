package graft

import java.io.{OutputStream, PrintStream}

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    // Anything any library prints on stdout during the run (Spark, log4j
    // misconfig, shutdown chatter) would corrupt the single JSON line the
    // driver parses — mute stdout for the whole run and restore it only for
    // the final line, printed AFTER spark.stop() so no teardown logging can
    // interleave.
    val realOut = System.out
    System.setOut(new PrintStream(OutputStream.nullOutputStream(), true))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // ≥3 interleaved rounds: round-robin over the whole query list each round,
    // so machine-wide drift (GC, page cache, CPU contention) lands on every
    // query equally instead of biasing whichever query ran during the spike.
    // min is the stable plan-cost estimate; (max-min) is the recorded spread.
    val rounds = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3).max(1)
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
    val qseq = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val samples = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    for (_ <- 0 until rounds; (name, fn) <- qseq if !errors.contains(name)) {
      val t0 = System.nanoTime()
      try {
        run(fn)
        samples(name) = samples.getOrElse(name, Nil) :+ ((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"
          samples.remove(name)
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
    val results = samples.toSeq.map { case (k, ts) => (k, ts.min, ts.max - ts.min) }
    val qs = results.map { case (k, mn, _) => "\"" + k + "\":" + sec(mn) }
      .mkString("{", ",", "}")
    // per-query spread (max-min over the rounds) at coarser precision: the
    // judge needs it to tell plan regressions from harness noise
    val sp = results.map { case (k, _, d) => "\"" + k + "\":" + f"$d%.2f" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    spark.stop()
    // ONE parseable line, alone on stdout
    System.setOut(realOut)
    System.out.println(
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","runs":$rounds,"queries":$qs,"spread":$sp,"errors":$errJson,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
