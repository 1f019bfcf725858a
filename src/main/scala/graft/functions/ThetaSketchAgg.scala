package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** KMV ("k minimum values") / theta cardinality sketch as a typed,
  * MERGEABLE Spark `Aggregator` — the scale path for distinct-count and
  * SET-OVERLAP questions (shared shingles between crawls, audience overlap
  * between cohorts) where an exact `count(distinct)` shuffles every
  * distinct key and an exact intersection joins two full key sets: the
  * sketch is one map-side-combinable pass with O(k) state per partition,
  * one O(k) record per partition on the wire, and set operations run on
  * the k-row summaries instead of the data (Beyer et al., "On synopses for
  * distinct-value estimation under multiset operations", SIGMOD'07; the
  * theta-sketch framing of Dasgupta et al.).
  *
  * Input is the 64-bit hash of the key (pass `xxhash64(col)` — hashing in
  * the plan keeps the aggregator codegen-friendly and deterministic). The
  * sketch keeps the k SMALLEST hashes in unsigned order, stored
  * SIGN-FLIPPED (`h ^ Long.MinValue`) so signed comparisons realize
  * unsigned order; the output array is sorted ascending in that domain.
  *
  * While a set's distinct count stays ≤ k — the correctness-gate regime
  * the driver oracle pins — the sketch IS the complete distinct hash set:
  * cardinalities and intersections are EXACT (up to 64-bit hash
  * collisions, ~n²/2⁶⁵). The sketch retains k+1 minima so "exactly k
  * distinct" (k entries, complete) is distinguishable from "k retained
  * of more" (k+1 entries, the last being θ) — without that extra slot
  * the ≤ k exactness contract would silently break AT k. Beyond k it
  * degrades to the standard estimators: distinct ≈ k/θ (θ = the true
  * (k+1)-th minimum, exclusive) and |A∩B| ≈ |{h ∈ A∩B : h < θ}|/θ with
  * θ = min(θ_A, θ_B), relative error O(1/√k) — spec-measured.
  */
class ThetaSketchAgg(k: Int)
    extends Aggregator[Long, mutable.HashSet[Long], Array[Long]] {
  require(k >= 16, s"ThetaSketch: k ($k) must be >= 16")

  // the buffer over-collects to 4k distinct hashes and trims back to the
  // k+1 smallest in one sort — amortized O(1) per insert, 4k longs of
  // state, and a plain HashSet stays kryo-round-trippable (an ordered
  // set's comparator does not survive generic kryo decode). k+1, not k:
  // any value discarded here already has k+1 smaller values, so it can
  // never be among the final k+1 minima — the retained set always
  // contains the TRUE (k+1)-th minimum, which is what θ must be.
  private val trimAt = 4 * k

  private def trim(b: mutable.HashSet[Long]): mutable.HashSet[Long] =
    if (b.size <= trimAt) b
    else {
      val kept = b.toArray.sorted.take(k + 1)
      b.clear()
      b ++= kept
    }

  override def zero: mutable.HashSet[Long] = mutable.HashSet.empty

  override def reduce(b: mutable.HashSet[Long], hash: Long): mutable.HashSet[Long] =
    trim(b += (hash ^ Long.MinValue))

  override def merge(a: mutable.HashSet[Long],
      b: mutable.HashSet[Long]): mutable.HashSet[Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    trim(big ++= small)
  }

  override def finish(b: mutable.HashSet[Long]): Array[Long] =
    b.toArray.sorted.take(k + 1)

  override def bufferEncoder: Encoder[mutable.HashSet[Long]] =
    Encoders.kryo[mutable.HashSet[Long]]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object ThetaSketchAgg {

  /** Column form: the sorted sign-flipped minimum-hash array of `hash`
    * (a 64-bit hash column, e.g. `xxhash64(key)`) — ≤ k entries when the
    * set's distinct count is ≤ k (complete), k+1 entries when filled
    * (the last entry is θ, the true (k+1)-th minimum, not a member).
    */
  def column(hash: Column, k: Int): Column =
    udaf(new ThetaSketchAgg(k)).apply(hash)

  /** θ of a sketch in flipped-signed space: the exclusive upper bound on
    * retained hashes — the (k+1)-th minimum when the sketch filled. A
    * sketch with ≤ k entries saw its whole set → θ = +∞
    * (Long.MaxValue flipped-domain sentinel).
    */
  private def thetaF(s: Array[Long], k: Int): Long =
    if (s.length <= k) Long.MaxValue else s(k)

  /** Fraction of the unsigned 64-bit hash space below flipped θ. */
  private def thetaFrac(tF: Long): Double =
    if (tF == Long.MaxValue) 1.0
    else (tF ^ Long.MinValue).toDouble / math.pow(2.0, 64)

  /** Estimated distinct count: exact size when the set stayed ≤ k
    * distinct (the sketch is complete — including EXACTLY k, which the
    * k+1-th slot disambiguates), else the theta estimator k/θ (k values
    * retained strictly below the exclusive θ).
    */
  def estimate(s: Array[Long], k: Int): Long =
    if (s.length <= k) s.length.toLong
    else math.rint(k.toDouble / thetaFrac(s(k))).toLong

  /** (|A|, |B|, |A∩B|) estimates from two sketches built with the same k.
    * Exact (collision-negligible) when neither sketch filled; otherwise
    * the theta intersection: common hashes strictly below θ =
    * min(θ_A, θ_B) (a filled sketch's own θ entry is excluded — it is a
    * bound, not a member), scaled by 1/θ.
    */
  def pairStats(a: Array[Long], b: Array[Long], k: Int): (Long, Long, Long) = {
    val tF = math.min(thetaF(a, k), thetaF(b, k))
    var i = 0; var j = 0; var common = 0L
    while (i < a.length && j < b.length && a(i) < tF && b(j) < tF) {
      if (a(i) == b(j)) { common += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val nc =
      if (tF == Long.MaxValue) common
      else math.rint(common.toDouble / thetaFrac(tF)).toLong
    (estimate(a, k), estimate(b, k), nc)
  }

  /** UDF form of [[pairStats]] + integer-ppm Jaccard, for combining the
    * per-group sketch columns. This runs on the SUMMARY frame (one row
    * per group pair, data-independent cardinality), never on the data —
    * the one place a Scala UDF costs nothing.
    */
  def pairStatsUdf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (a: Seq[Long], b: Seq[Long]) =>
      val (na, nb, nc) = pairStats(a.toArray, b.toArray, k)
      val union = na + nb - nc
      (na, nb, nc, if (union > 0) nc * 1000000L / union else 0L)
    }

  /** UDF form of [[estimate]], same summary-frame-only caveat. */
  def estimateUdf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: Seq[Long]) => estimate(s.toArray, k))
}
