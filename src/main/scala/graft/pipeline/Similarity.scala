package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  *  - Brute-force cosine top-k: broadcast the (small) query set against the
  *    corpus — scales linearly in corpus size, embarrassingly parallel; the
  *    correctness baseline.
  *  - LSH-bucketed top-k: sign-bit bucket signature (axis-aligned random
  *    hyperplanes), candidates only within a bucket — the scale path: the
  *    corpus shuffles once on the bucket key, each bucket is tiny.
  *
  * Dot products run in double via zip_with+aggregate (sequential fold in
  * array order → deterministic); no UDFs.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double, left-to-right — the codegen'd DotProduct expression
    * (registered by SparkTuning at every table load). Bit-identical to the
    * interpreted HOF fold in [[dotHof]], ~6× faster on pairwise workloads.
    */
  def dot(a: Column, b: Column): Column = {
    graft.core.SparkTuning.tune(org.apache.spark.sql.SparkSession.active)
    call_function("graft_dot", a.cast("array<double>"), b.cast("array<double>"))
  }

  /** Reference HOF implementation of [[dot]] (interpreted; used by tests to
    * pin the codegen path's semantics).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Exact top-k neighbors by cosine for each query vector (self excluded).
    * `queries` must be small enough to broadcast; the corpus is only
    * scanned, never shuffled.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** Sign-bit LSH bucket over the first `nBits` dimensions: '1' where the
    * component is positive. Axis-aligned hyperplanes — deterministic and
    * engine-portable; swap in md5-seeded pseudo-random planes for better
    * isotropy without changing the plumbing.
    */
  def signBucket(vec: Column, nBits: Int): Column =
    concat_ws("", transform(slice(vec, 1, nBits),
      x => when(x > 0, "1").otherwise("0")))

  /** Top-k within LSH buckets: every vector joins only its own bucket.
    * Recall < 1 by construction; bucket width (nBits) trades recall for
    * bucket size.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      nBits: Int, k: Int): DataFrame = {
    val keyed = df.select(col(idCol), col(vecCol),
      signBucket(col(vecCol), nBits).as("bucket"))
    val a = keyed.select(col("bucket"), col(idCol).as("query_id"), col(vecCol).as("qv"))
    val b = keyed.select(col("bucket"), col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** Embedding-cosine near-dup pairs within label blocks (a < b,
    * cosine ≥ threshold) — the vector-space analogue of Dedup's text paths.
    */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(blockCol), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(blockCol), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq(blockCol)).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
