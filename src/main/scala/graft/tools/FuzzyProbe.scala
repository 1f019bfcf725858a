package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost probe for [[Dedup.jaccardJoin]] — times each diamond
  * arm in isolation on the bench split so the heaviest-query entry in
  * BENCH_DETAIL has an attributed breakdown.
  *
  *   sbt "runMain graft.tools.FuzzyProbe /root/testdata/sf0.1"
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.SparkTuning.tune(spark)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fuzzy] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val probes = docs.filter(col("doc_id") % 10 === 0)
    val refs = docs.filter(col("doc_id") % 10 =!= 0)

    // arm 1: shingle explode + dfreq + sorted set aggregation
    val tagged = probes.select(lit("L").as("_side"), col("doc_id"),
        col("text").as("_t"))
      .unionByName(refs.select(lit("R").as("_side"), col("doc_id"),
        col("text").as("_t")))
    val sh = tagged.select(col("_side"), col("doc_id"),
      explode(Dedup.shingleArray(col("_t"), 3)).as("shingle"))
    time("shingle rows")(println(s"  n=${sh.count()}"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
    val sets = sh.join(dfreq, Seq("shingle"))
      .groupBy(col("_side"), col("doc_id"))
      .agg(sort_array(collect_list(struct(col("_df"), col("shingle"))))
        .as("_ord"))
      .select(col("_side"), col("doc_id"),
        transform(col("_ord"), x => x.getField("shingle")).as("_set"),
        size(col("_ord")).as("n_sh"))
      .withColumn("_prefix", slice(col("_set"), lit(1),
        (col("n_sh") - ceil(lit(0.5) * col("n_sh")) + 1).cast("int")))
    val cached = time("sets materialize") {
      val c = sets.persist(); println(s"  sets=${c.count()}"); c
    }
    def side(s: String, x: String) = cached.filter(col("_side") === s)
      .select(col("doc_id").as(s"id_$x"), col("_set").as(s"_set_$x"),
        col("n_sh").as(s"n_$x"), col("_prefix").as(s"_pfx_$x"))
    val l = side("L", "l"); val r = side("R", "r")
    val cand = time("candidates (prefix join)") {
      val c = l.select(col("id_l"), explode(col("_pfx_l")).as("shingle"))
        .join(r.select(col("id_r"), explode(col("_pfx_r")).as("shingle")),
          Seq("shingle"))
        .select(col("id_l"), col("id_r")).distinct().persist()
      println(s"  cand=${c.count()}"); c
    }
    time("verify (set intersect)") {
      val out = cand.join(l.drop("_pfx_l"), Seq("id_l"))
        .join(r.drop("_pfx_r"), Seq("id_r"))
        .withColumn("_ni", size(array_intersect(col("_set_l"), col("_set_r"))))
        .withColumn("jaccard", col("_ni") /
          (col("n_l") + col("n_r") - col("_ni")).cast("double"))
        .filter(col("jaccard") >= 0.5)
      println(s"  pairs=${out.count()}")
    }
    time("full operator (as shipped)") {
      println(s"  pairs=${Dedup.jaccardJoin(probes, refs, "doc_id",
        col("text"), 3, 0.5).count()}")
    }
    spark.stop()
  }
}
