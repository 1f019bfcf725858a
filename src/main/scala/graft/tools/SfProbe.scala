package graft.tools

import graft.pipeline.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 geometry adjudication probe (SCALE.md round-11): the embedding
  * candidate generators ran superlinear in the sf1 bench because the
  * BENCH QUERIES pin their bucket geometry for the sf0.01 oracle scale
  * (16 IVF centroids; 16 hyperplanes in 4 bands = 16 buckets/band) — at
  * 10× corpus a fixed bucket count means 10× per-bucket population and
  * ~100× candidate pairs, which is quadratic by construction, not an
  * operator property. This probe measures the same operators on the same
  * sf1 tables with geometry scaled the way a deployment scales it
  * (centroids ∝ corpus; +1 bit per band per corpus doubling).
  *
  *   sbt "runMain graft.tools.SfProbe /tmp/graft_sf1"
  */
object SfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sfprobe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val emb = graft.sources.Tables.embeddings(spark, dir)
    println(s"[sfprobe] embeddings: ${emb.count()} vectors in $dir")
    // warm-up pass (JIT + footers), then min-of-3 per config
    def minOf3(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[sfprobe] $name%-40s min ${ts.min}%7.2f s  spread ${ts.max - ts.min}%5.2f")
    }
    minOf3("ivf_near_dups cells=16 (query geometry)") {
      force(Similarity.ivfNearDups(emb, "vec_id", "embedding",
        threshold = 0.35, numCentroids = 16, probes = 3))
    }
    minOf3("ivf_near_dups cells=160 (scaled)") {
      force(Similarity.ivfNearDups(emb, "vec_id", "embedding",
        threshold = 0.35, numCentroids = 160, probes = 3))
    }
    minOf3("lsh_topk 16 planes/4 bands (query)") {
      force(Similarity.lshTopK(emb, "vec_id", "embedding",
        dims = 64, nPlanes = 16, bands = 4, k = 3))
    }
    minOf3("lsh_topk 28 planes/4 bands (scaled)") {
      force(Similarity.lshTopK(emb, "vec_id", "embedding",
        dims = 64, nPlanes = 28, bands = 4, k = 3))
    }
    minOf3("semdedup cells=160 (scaled)") {
      force(Similarity.semDedupSurvivors(emb, "vec_id", "embedding",
        threshold = 0.35, numCentroids = 160, probes = 3)
        .select(col("vec_id")))
    }
    // ---- PQ family (round 12): FIXED 200-query probe set so the sf axis
    // measures corpus scaling, not query-set growth (the bench queries'
    // %25 filter grows the query side with the corpus — quadratic by
    // construction for the flat ADC scan). IVFADC's coarse cells scale
    // with the corpus like the IVF rows above.
    val n = emb.count()
    val qmod = math.max(1L, n / 200L)
    val queries = emb.filter(col("vec_id") % qmod === 0)
    println(s"[sfprobe] pq probe queries: ${queries.count()}")
    val book = Similarity.pqCodebook(emb, "vec_id", "embedding",
      dims = 64, m = 16, k = 32)
    minOf3("pq_refine flat ADC (200 queries)") {
      force(Similarity.pqTopKRefined(queries, emb, "vec_id", "embedding",
        book, k = 3, shortlist = 25))
    }
    val coarseScaled = math.max(16, (n / 125L).toInt) // cells ∝ corpus
    val coarse = Similarity.strideCentroids(emb, "vec_id", "embedding",
      coarseScaled)
    minOf3(s"ivfpq cells=$coarseScaled probes=3 (scaled)") {
      force(Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding",
        coarse, book, k = 3, shortlist = 25, probes = 3))
    }
    spark.stop()
  }
}
