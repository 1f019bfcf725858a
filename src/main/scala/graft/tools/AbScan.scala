package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for the scan-parallelism knobs (optimization guide §1:
  * measure under MATCHED conditions). Serial whole-process arms proved
  * unreadable on this box — contention drifts faster than an arm runs, and
  * the canary can only normalize CPU-shaped noise. Both knobs are runtime
  * session confs, so this runs every (query, arm) pair inside ONE JVM,
  * round-robin across rounds: arm deltas are then differences between
  * adjacent executions, not between 10-minutes-apart process runs.
  *
  * Arms: rebalance off/auto ("spark.graft.scan.rebalance") crossed with
  * AQE coalesce floor 1/defaultParallelism (minPartitionNum).
  *
  * `runMain graft.tools.AbScan <q1,q2,...> [sfDir]`, AB_ROUNDS=n (default 3).
  */
object AbScan {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(sys.error("usage: AbScan <q1,q2,...> [sfDir]"))
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val rounds = sys.env.get("AB_ROUNDS").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val allArms = Seq( // (tag, rebalance, AQE coalesce minPartitionSize)
      ("off/1m", "off", "1m"),
      ("reb/1m", "auto", "1m"),
      ("off/64k", "off", "64k"),
      ("reb/64k", "auto", "64k"))
    // AB_ARMS=tag,tag narrows the grid (e.g. "off/64k,reb/64k" to decide
    // only the rebalance with the coalesce floor already adopted)
    val arms = sys.env.get("AB_ARMS")
      .map(s => allArms.filter(a => s.split(',').contains(a._1)))
      .getOrElse(allArms)
    def setArm(a: (String, String, String)): Unit = {
      spark.conf.set("spark.graft.scan.rebalance", a._2)
      // SparkTuning.tune copies this into the live coalescer conf on the
      // next table read (and we set it directly too, for stream-only rows)
      spark.conf.set("spark.graft.aqe.minPartitionSize", a._3)
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", a._3)
    }
    val fns = names.map(n => n -> graft.SparkEntry.queries(n))
    // warmup: every (query, arm) once so codegen/JIT and memo frames are hot
    // before anything is recorded
    for (arm <- arms; (_, fn) <- fns) {
      setArm(arm)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"WARM FAIL: ${e.getMessage.take(80)}") }
    }
    val t = collection.mutable.Map[(String, String), List[Double]]()
    // Rotate the arm ORDER per (round, query): back-to-back runs of the
    // same query give the LATER position a strong recency advantage (page
    // cache, JIT profile) — measured ~2× on sub-second queries whose arms
    // were IDENTICAL plans. Rotation gives each arm an equal share of
    // every position, so min-of-rounds compares like positions.
    for (r <- 0 until rounds; ((name, fn), qi) <- fns.zipWithIndex) {
      val rot = (r + qi) % arms.size
      for (arm <- arms.drop(rot) ++ arms.take(rot)) {
        setArm(arm)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        t((name, arm._1)) = t.getOrElse((name, arm._1), Nil) :+ dt
      }
    }
    println(f"${"query"}%-34s " + arms.map(a => f"${a._1}%8s").mkString(" "))
    for (name <- names) {
      val mins = arms.map(a => t((name, a._1)).min)
      println(f"$name%-34s " + mins.map(m => f"$m%8.2f").mkString(" "))
    }
    println(f"${"TOTAL(min)"}%-34s " + arms.map(a =>
      f"${names.map(n => t((n, a._1)).min).sum}%8.2f").mkString(" "))
    spark.stop()
  }
}
