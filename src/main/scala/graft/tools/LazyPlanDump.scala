package graft.tools

import graft.pipeline.{Dedup, Retrieval}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-artifact dump for the registry rows whose production form returns
  * an eagerly checkpointed frame (`Caching.scoped`/`eager` truncates the
  * lineage to `Scan ExistingRDD`, so `ExplainDump` on the registry entry
  * shows a stub). Prints the SAME operator chain with its cache flag off —
  * the identical plan minus the materialization points, the established
  * audit discipline (see PlanAuditSpec's "cache-disabled form" comments).
  */
object LazyPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same hook as ExplainDump: EXPLAIN_CONF="k=v;k=v" sets session confs
    // before planning (e.g. spark.sql.adaptive.enabled=false reproduces
    // the AQE-scoped executed form of the pagerank rows — F9)
    sys.env.get("EXPLAIN_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    val docsRaw = Tables.read(spark, dir, "documents")

    println("\n===== fuzzy_join =====")
    Dedup.jaccardJoin(
      docs.filter(col("doc_id") % 10 === 0),
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id",
      col("text"), shingleLen = 3, threshold = 0.5, cachePrefix = false)
      .explain("formatted")

    println("\n===== substring_dup =====")
    Dedup.substringDupStats(docs, "doc_id", col("text"), k = 40,
      stride = 10, cacheWindows = false).explain("formatted")

    println("\n===== bm25_topk =====")
    Retrieval.bm25TopK(docs, Seq("vector", "merge", "scan", "window"),
      k = 20, cachePostings = false).explain("formatted")

    println("\n===== link_pagerank (lazy form, materialize=false) =====")
    graft.pipeline.LinkGraph.pageRank(
      graft.queries.PipelineQueries.pagerankEdges(docsRaw), iters = 3,
      materialize = false).explain("formatted")

    println("\n===== dedup_incremental_near =====")
    Dedup.incrementalNearNew(
      docs.filter(col("doc_id") % 10 === 0),
      Dedup.minhashIndex(docsRaw.filter(col("doc_id") % 10 =!= 0),
        "doc_id", col("text")),
      col("text"), threshold = 0.5, materialize = false).explain("formatted")

    spark.stop()
  }
}
