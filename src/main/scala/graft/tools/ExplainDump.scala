package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dumps physical plans for representative queries — the plan-review
  * artifact (run: `sbt "runMain graft.tools.ExplainDump [names...]"`).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "filter_temporal", "reduce_stats", "merge_cubes", "mask",
      "aggregate_temporal", "resample_cube_temporal", "apply_kernel",
      "dedup_minhash_lsh", "ann_brute_topk", "topk_revenue")
    // SPARK_GRAFT_CPUS sizes the session like Bench does (plan shapes —
    // rebalance widths, AQE targets — depend on parallelism, so plan
    // artifacts should be dumped at the core count the claim is about);
    // EXPLAIN_CONF="k=v;k=v" sets session confs before planning (the
    // before/after arms, e.g. spark.graft.scan.rebalance.rowsPerTask=1
    // reproduces the r19 uncapped width).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("EXPLAIN_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
