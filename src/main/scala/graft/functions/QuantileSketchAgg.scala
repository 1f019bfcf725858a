package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** One quantile probe: `v` is the smallest sketched value whose cumulative
  * weight reaches rank `max(1, ceil(pm/1000 · n))` — `pm` is the probe in
  * PER-MILLE (integer, so the rank arithmetic is exact in longs on both
  * this engine and any SQL oracle; a fractional `0.1 * n` would round
  * differently between double and decimal engines), `n` the total weight.
  */
final case class QuantilePoint(pm: Int, v: Long, n: Long)

/** Mergeable weighted-quantile sketch as a typed Spark `Aggregator` — the
  * scale path for distribution questions (length/quality score percentiles,
  * value histograms) where an exact quantile needs a full sort of the
  * column: at 100 TB that sort IS the job. The sketch is one map-side-
  * combinable pass with O(capacity) state per partition and one
  * O(capacity) record per partition on the wire — no data-sized shuffle.
  *
  * Input is (value, weight) with values ALREADY QUANTIZED by the caller
  * (e.g. deci-units of a score): quantization is what bounds the distinct
  * count independently of row count, which is the honest exactness story —
  * while the number of distinct quantized values stays ≤ capacity, nothing
  * ever compresses, the state is the exact weighted histogram (canonical,
  * merge-order independent), and every probe equals the exact quantile —
  * the regime the driver oracle pins, and one that survives any row-count
  * scale-up because the value DOMAIN, not the data, sets the state size.
  *
  * Above capacity it degrades gracefully: entries sort by value and greedy
  * buckets of weight ≤ ~2W/capacity collapse onto their MAX value (a real
  * data value, never an interpolation), so a probe's reported value has
  * true rank within +2W/capacity of the requested rank — the classic
  * ε-summary bound (Manku-Rajagopalan-Lindsay construction), ε = 2/capacity
  * per compression generation. Merging concatenates histograms and
  * re-compresses only on overflow (mergeable-summaries style).
  */
class QuantileSketchAgg(capacity: Int, pms: Seq[Int])
    extends Aggregator[(Long, Long), mutable.HashMap[Long, Long],
      Seq[QuantilePoint]] {
  require(capacity >= 8, s"QuantileSketch: capacity ($capacity) must be >= 8")
  require(pms.nonEmpty && pms.forall(p => p >= 0 && p <= 1000),
    s"QuantileSketch: probes must be per-mille in [0,1000], got $pms")

  override def zero: mutable.HashMap[Long, Long] = mutable.HashMap.empty

  /** Greedy ε-compression: sorted entries collapse into runs of weight
    * ≤ max(1, ceil(2W/capacity)) represented by the run's max value. Runs
    * close BEFORE exceeding the cap (a single over-cap entry stays alone),
    * so every entry's rank displacement is bounded by the cap.
    */
  private def compress(b: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    if (b.size <= capacity) return b
    val sorted = b.toArray.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val cap = math.max(1L, (2L * total + capacity - 1) / capacity)
    val out = mutable.HashMap.empty[Long, Long]
    var runW = 0L
    var i = 0
    while (i < sorted.length) {
      val (v, w) = sorted(i)
      if (runW > 0 && runW + w > cap) {
        // close the previous run on its max value (sorted(i-1)._1)
        out(sorted(i - 1)._1) = runW
        runW = 0L
      }
      runW += w
      i += 1
    }
    if (runW > 0) out(sorted.last._1) = runW
    out
  }

  override def reduce(b: mutable.HashMap[Long, Long],
      in: (Long, Long)): mutable.HashMap[Long, Long] = {
    if (in._2 > 0) {
      b(in._1) = b.getOrElse(in._1, 0L) + in._2
      if (b.size > capacity) compress(b) else b
    } else b
  }

  override def merge(a: mutable.HashMap[Long, Long],
      b: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (v, w) => big(v) = big.getOrElse(v, 0L) + w }
    if (big.size > capacity) compress(big) else big
  }

  override def finish(b: mutable.HashMap[Long, Long]): Seq[QuantilePoint] = {
    val sorted = b.toArray.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    if (total == 0L) return Seq.empty
    pms.map { pm =>
      // exact-integer rank: max(1, ceil(pm·n / 1000)) in long arithmetic
      val r = math.max(1L, (pm.toLong * total + 999L) / 1000L)
      var cum = 0L
      var i = 0
      while (i < sorted.length && cum < r) { cum += sorted(i)._2; i += 1 }
      QuantilePoint(pm, sorted(math.min(i, sorted.length) - 1)._1, total)
    }
  }

  override def bufferEncoder: Encoder[mutable.HashMap[Long, Long]] =
    Encoders.kryo[mutable.HashMap[Long, Long]]
  override def outputEncoder: Encoder[Seq[QuantilePoint]] =
    ExpressionEncoder[Seq[QuantilePoint]]()
}

object QuantileSketchAgg {
  /** The registry's standard probe set (per-mille). */
  val DefaultPms: Seq[Int] = Seq(10, 100, 250, 500, 750, 900, 990)

  /** Column form: an array<struct<pm,v,n>> of quantile probes of the
    * (quantized value, weight) pairs, sketched at `capacity` entries.
    */
  def column(value: Column, weight: Column, capacity: Int,
      pms: Seq[Int] = DefaultPms): Column =
    udaf(new QuantileSketchAgg(capacity, pms)).apply(value, weight)
}
