package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-iteration PageRank cost probe (SCALE.md "pagerank iteration
  * depth"): times `LinkGraph.pageRank` over the link_pagerank query's
  * id-derived edge synthesis at a CLI-chosen iteration count and
  * checkpoint stride — the evidence that the per-`checkpointEvery` lazy
  * lineage truncation keeps cost near-linear in k instead of paying
  * Catalyst analysis on an O(k)-deep unrolled plan.
  *
  * `runMain graft.tools.PageRankProbe <iters> [checkpointEvery] [sfDir]
  * [tolUnits]` (checkpointEvery 0 = the pre-r17 no-truncation shape, for
  * the comparison row; tolUnits engages the r18 convergence cutoff and
  * prints the iterations actually run). RUNONE_REPS repeats the timing
  * like RunOne.
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(
      sys.error("usage: PageRankProbe <iters> [checkpointEvery] [sfDir] [tolUnits]"))
    val every = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val tol = args.lift(3).map(_.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.sources.Tables.read(spark, sfDir, "documents")
    val srcNode = concat(col("source"), lit("_"),
      pmod(col("doc_id"), lit(1000L)).cast("string"))
    val dsts = (1 to 3).map { j =>
      concat(lit("src"),
        pmod(col("doc_id") * 7 + lit(j.toLong), lit(20L)).cast("string"),
        lit("_"),
        pmod(col("doc_id") * 31 + lit(j.toLong), lit(1000L)).cast("string"))
    }
    val edges = d.select(srcNode.as("src"), explode(array(dsts: _*)).as("dst"))
    val reps = sys.env.get("RUNONE_REPS").map(_.toInt).getOrElse(1)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val (out, ran) = graft.pipeline.LinkGraph.pageRankRun(edges, iters,
        checkpointEvery = if (every > 0) every else Int.MaxValue,
        tolUnits = tol)
      val agg = out.agg(count(lit(1)), sum(col("rank_units"))).first()
      println(f"PRPROBE rep=$i iters=$iters ran=$ran every=$every " +
        f"tol=${tol.getOrElse(-1L)} " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s nodes=${agg.getLong(0)} " +
        f"mass=${agg.getLong(1)}")
    }
    spark.stop()
  }
}
