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

/** Sketch state: an EXACT pending histogram (value → weight) plus a
  * Greenwald-Khanna-style tuple summary the histogram folds into on
  * overflow. Tuples are flattened as (v, g, Δ, spread) strides of 4 longs,
  * sorted by v: `g` is the mass assigned between the previous tuple and
  * `v`, true rank(v) ∈ [Σg, Σg + Δ], and `spread`=1 marks mass no longer
  * known to sit exactly at `v` (an absorbed neighbor) — the flag that lets
  * fresh inserts above an ATOMIC tuple keep Δ = 0, preserving exactness
  * for as long as nothing has ever collapsed.
  */
final class QSketchState(
    val hist: mutable.HashMap[Long, Long],
    var tuples: Array[Long]) extends Serializable

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
  * ever folds, the state is the exact weighted histogram (canonical,
  * merge-order independent), and every probe equals the exact quantile —
  * the regime the driver oracle pins, and one that survives any row-count
  * scale-up because the value DOMAIN, not the data, sets the state size.
  *
  * Above capacity it degrades to a Greenwald-Khanna summary (Greenwald &
  * Khanna, "Space-efficient online computation of quantile summaries",
  * SIGMOD'01; merge bookkeeping after the mergeable-summaries literature):
  * adjacent tuples collapse while g_i + g_{i+1} + Δ_{i+1} ≤ θ =
  * ceil(2W/capacity), inserts under a SPREAD successor charge its g + Δ − 1
  * as their Δ (the hidden-mass bound), and cross-merges charge the other
  * summary's local uncertainty the same way. A probe's reported value then
  * has true rank within O(W/capacity) of the requested rank — measured ≤
  * 3W/capacity across merge shapes in the spec, against the 6W/capacity
  * envelope it pins.
  */
class QuantileSketchAgg(capacity: Int, pms: Seq[Int])
    extends Aggregator[(Long, Long), QSketchState, Seq[QuantilePoint]] {
  require(capacity >= 8, s"QuantileSketch: capacity ($capacity) must be >= 8")
  require(pms.nonEmpty && pms.forall(p => p >= 0 && p <= 1000),
    s"QuantileSketch: probes must be per-mille in [0,1000], got $pms")

  override def zero: QSketchState =
    new QSketchState(mutable.HashMap.empty, Array.emptyLongArray)

  // ---- tuple helpers (stride-4 flat array: v, g, delta, spread) ----
  private def nTuples(t: Array[Long]): Int = t.length / 4
  private def totalG(t: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < t.length) { s += t(i + 1); i += 4 }
    s
  }
  /** Hidden-mass bound charged by the tuple at index k (as successor):
    * a SPREAD tuple may conceal up to g + Δ − 1 items below a value that
    * precedes it; an atomic tuple conceals nothing.
    */
  private def hidden(t: Array[Long], k: Int): Long =
    if (k < nTuples(t) && t(4 * k + 3) == 1L) t(4 * k + 1) + t(4 * k + 2) - 1L
    else 0L

  /** GK compress: absorb tuple runs left-into-right while the surviving
    * tuple's g_i + g_{i+1} + Δ_{i+1} stays ≤ θ = ceil(2W/capacity). The
    * survivor keeps its own Δ (rank invariants are untouched — only the
    * absorbed value's identity is lost) and becomes SPREAD.
    */
  private def compress(t: Array[Long]): Array[Long] = {
    val n = nTuples(t)
    if (n == 0) return t
    val w = totalG(t)
    val theta = math.max(1L, (2L * w + capacity - 1) / capacity)
    val out = new Array[Long](t.length)
    var m = 0 // tuples written
    var i = 0
    while (i < n) {
      val v = t(4 * i); val g = t(4 * i + 1); val d = t(4 * i + 2)
      val sp = t(4 * i + 3)
      if (m > 0 && out(4 * (m - 1) + 1) + g + d <= theta) {
        val pg = out(4 * (m - 1) + 1)
        out(4 * (m - 1)) = v
        out(4 * (m - 1) + 1) = pg + g
        out(4 * (m - 1) + 2) = d
        out(4 * (m - 1) + 3) = 1L
      } else {
        out(4 * m) = v; out(4 * m + 1) = g; out(4 * m + 2) = d
        out(4 * m + 3) = sp
        m += 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, 4 * m)
  }

  /** Fold the pending histogram into the tuple summary: merge-sort by
    * value; a histogram entry lands as an atomic tuple whose Δ is the
    * hidden-mass bound of its successor in the EXISTING summary; equal
    * values add their mass to the existing tuple. Compresses after.
    */
  private def fold(b: QSketchState): Unit = {
    if (b.hist.isEmpty) { b.tuples = compress(b.tuples); return }
    val fresh = b.hist.toArray.sortBy(_._1)
    b.hist.clear()
    val t = b.tuples
    val n = nTuples(t)
    val out = new Array[Long](t.length + 4 * fresh.length)
    var m = 0; var i = 0; var j = 0
    while (i < n || j < fresh.length) {
      if (j >= fresh.length || (i < n && t(4 * i) <= fresh(j)._1)) {
        var g = t(4 * i + 1)
        if (j < fresh.length && fresh(j)._1 == t(4 * i)) { g += fresh(j)._2; j += 1 }
        out(4 * m) = t(4 * i); out(4 * m + 1) = g
        out(4 * m + 2) = t(4 * i + 2); out(4 * m + 3) = t(4 * i + 3)
        m += 1; i += 1
      } else {
        out(4 * m) = fresh(j)._1; out(4 * m + 1) = fresh(j)._2
        out(4 * m + 2) = hidden(t, i); out(4 * m + 3) = 0L
        m += 1; j += 1
      }
    }
    b.tuples = compress(java.util.Arrays.copyOf(out, 4 * m))
  }

  override def reduce(b: QSketchState, in: (Long, Long)): QSketchState = {
    if (in._2 > 0) {
      b.hist(in._1) = b.hist.getOrElse(in._1, 0L) + in._2
      if (b.hist.size > capacity) fold(b)
    }
    b
  }

  override def merge(a: QSketchState, b: QSketchState): QSketchState = {
    b.hist.foreach { case (v, w) => a.hist(v) = a.hist.getOrElse(v, 0L) + w }
    if (b.tuples.nonEmpty) {
      fold(a) // settle a's pending mass against a's own summary first
      val x = a.tuples; val y = b.tuples
      val nx = nTuples(x); val ny = nTuples(y)
      val out = new Array[Long](x.length + y.length)
      var m = 0; var i = 0; var j = 0
      while (i < nx || j < ny) {
        if (j >= ny || (i < nx && x(4 * i) < y(4 * j))) {
          out(4 * m) = x(4 * i); out(4 * m + 1) = x(4 * i + 1)
          out(4 * m + 2) = x(4 * i + 2) + hidden(y, j)
          out(4 * m + 3) = x(4 * i + 3)
          m += 1; i += 1
        } else if (i >= nx || y(4 * j) < x(4 * i)) {
          out(4 * m) = y(4 * j); out(4 * m + 1) = y(4 * j + 1)
          out(4 * m + 2) = y(4 * j + 2) + hidden(x, i)
          out(4 * m + 3) = y(4 * j + 3)
          m += 1; j += 1
        } else { // equal values: both rank ranges add
          out(4 * m) = x(4 * i)
          out(4 * m + 1) = x(4 * i + 1) + y(4 * j + 1)
          out(4 * m + 2) = x(4 * i + 2) + y(4 * j + 2)
          out(4 * m + 3) = x(4 * i + 3) | y(4 * j + 3)
          m += 1; i += 1; j += 1
        }
      }
      a.tuples = compress(java.util.Arrays.copyOf(out, 4 * m))
    }
    if (a.hist.size > capacity) fold(a)
    a
  }

  override def finish(b: QSketchState): Seq[QuantilePoint] = {
    // exact regime: the histogram IS the answer — never fold it (folding
    // compresses); the tuple walk below then reads sorted exact weights
    val (vs, gs) =
      if (b.tuples.isEmpty) {
        val h = b.hist.toArray.sortBy(_._1)
        (h.map(_._1), h.map(_._2))
      } else {
        fold(b)
        val t = b.tuples
        (Array.tabulate(nTuples(t))(k => t(4 * k)),
          Array.tabulate(nTuples(t))(k => t(4 * k + 1)))
      }
    val total = gs.sum
    if (total == 0L) return Seq.empty
    pms.map { pm =>
      // exact-integer rank: max(1, ceil(pm·n / 1000)) in long arithmetic
      val r = math.max(1L, (pm.toLong * total + 999L) / 1000L)
      var cum = 0L
      var i = 0
      while (i < vs.length && cum < r) { cum += gs(i); i += 1 }
      QuantilePoint(pm, vs(math.min(i, vs.length) - 1), total)
    }
  }

  override def bufferEncoder: Encoder[QSketchState] =
    Encoders.kryo[QSketchState]
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
