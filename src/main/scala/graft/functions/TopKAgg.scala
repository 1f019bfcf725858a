package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** One retained row of a per-group top-k: the ordering value and the row's
  * id payload (unique ids make the (v desc, id asc) order TOTAL, so the
  * result is deterministic under any partitioning).
  */
final case class TopEntry(id: Long, v: Double)

/** Bounded-heap top-k-per-group as a typed, MERGEABLE Spark `Aggregator` —
  * the scale path for "top N rows per key by value" questions. Spark's
  * native answers are `max_by` (k = 1 only) or a `row_number()` window,
  * and the window SORTS EVERY ROW of every group after shuffling the full
  * table on the group key: at 100 TB that is a whole-corpus exchange plus
  * an O(n log n) per-group sort for an answer of size k·groups. This
  * aggregator is one map-side-combinable pass — each partition retains at
  * most k (value, id) pairs per group, so only O(k · groups · partitions)
  * records cross the wire and the final reduce is a k-way merge.
  *
  * EXACT under any partitioning (not a sketch): top-k selection over a
  * TOTAL order is associative and commutative — `merge(a, b)` keeps the
  * best k of a ∪ b, and ids are unique so (v desc, id asc) never ties.
  *
  * The buffer is an unsorted ArrayBuffer compacted geometrically (sort +
  * take k when it exceeds 4k ∨ 64): amortized O(log k) per row without
  * paying a heap's per-insert boxing, and the buffer ships compacted.
  *
  * The reference has no ranking machinery (its arrays are dense rasters);
  * this extends the engine's relational family alongside
  * [[SpaceSavingAgg]] (frequency top-k) — this one ranks by a VALUE.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), mutable.ArrayBuffer[(Double, Long)],
      Seq[TopEntry]] {
  require(k > 0, s"TopKAgg: need k > 0, got $k")

  private val cap = math.max(4 * k, 64)

  /** (v desc, id asc): true when `a` outranks `b`. */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def compact(b: mutable.ArrayBuffer[(Double, Long)],
      to: Int): mutable.ArrayBuffer[(Double, Long)] =
    if (b.size <= to) b
    else {
      val kept = b.sortWith(beats).take(to)
      b.clear()
      b ++= kept
    }

  override def zero: mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  override def reduce(b: mutable.ArrayBuffer[(Double, Long)],
      in: (Double, Long)): mutable.ArrayBuffer[(Double, Long)] = {
    // NaN is unrankable (neither > nor == any value): admitting one makes
    // beats() intransitive — sortWith may throw or order
    // partitioning-dependently, breaking the exactness contract. NaN rows
    // drop here, the same contract as the callers' null pre-filters.
    if (!in._1.isNaN) {
      b += in
      compact(b, if (b.size > cap) k else cap)
    }
    b
  }

  override def merge(a: mutable.ArrayBuffer[(Double, Long)],
      b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    big ++= small
    compact(big, k)
  }

  override def finish(b: mutable.ArrayBuffer[(Double, Long)]): Seq[TopEntry] =
    b.sortWith(beats).take(k).map { case (v, id) => TopEntry(id, v) }.toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[TopEntry]] =
    ExpressionEncoder[Seq[TopEntry]]()
}

object TopKAgg {
  /** Column form: an array<struct<id,v>> of the group's top `k` rows by
    * (v desc, id asc). Callers must pre-filter nulls — a null v or id is
    * a caller bug, not a rankable row.
    */
  def column(v: Column, id: Column, k: Int): Column =
    udaf(new TopKAgg(k)).apply(v, id)
}
