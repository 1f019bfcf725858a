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
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
