package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** One heavy-hitter: `count` over-estimates the true frequency by at
  * most `err` (SpaceSaving invariant: true ∈ [count − err, count]).
  */
final case class HeavyHitter(key: String, count: Long, err: Long)

/** SpaceSaving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") as a
  * typed, MERGEABLE Spark `Aggregator` — the scale path for top-k
  * frequency questions (domain quotas, URL hot-spots, vocabulary heads)
  * where an exact `groupBy(key).count` would shuffle EVERY distinct key:
  * at 100 TB a crawl has billions of distinct domains/URLs, but the
  * sketch is one map-side-combinable pass with O(capacity) state per
  * partition and one O(capacity) record per partition on the wire — no
  * key-space shuffle at all.
  *
  * Guarantees: with capacity m over n items, every true count is
  * captured within n/m (the classic bound), and any key with true
  * frequency > n/m is PRESENT in the sketch. When the number of
  * distinct keys never exceeds the capacity — the correctness-gate
  * regime the driver oracle pins — no eviction ever happens and the
  * sketch is EXACT (err = 0 on every entry, counts = groupBy counts).
  *
  * Merging follows the mergeable-summaries construction (Agarwal et
  * al.): matching keys sum counts and error bounds; absent keys carry
  * over; overflow trims to the capacity's top counts. Under eviction
  * the per-entry counts depend on partitioning (any SpaceSaving does) —
  * the ε-bound holds either way, and the gate regime is
  * partition-independent because nothing ever evicts.
  *
  * The reference has no sketch machinery (its arrays are dense rasters);
  * this extends the engine's LLM-pipeline family.
  */
class SpaceSavingAgg(capacity: Int, outK: Int)
    extends Aggregator[String, mutable.HashMap[String, (Long, Long)],
      Seq[HeavyHitter]] {
  require(capacity > 0 && outK > 0 && outK <= capacity,
    s"SpaceSaving: need 0 < outK ($outK) <= capacity ($capacity)")

  override def zero: mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def insert(b: mutable.HashMap[String, (Long, Long)], key: String,
      w: Long, e: Long): Unit =
    b.get(key) match {
      case Some((c0, e0)) => b(key) = (c0 + w, e0 + e)
      case None if b.size < capacity => b(key) = (w, e)
      case None =>
        // evict the minimum-count entry (ties by key for determinism);
        // the newcomer inherits its count as the classic error bound
        val (mk, (mc, _)) = b.minBy { case (k, (c, _)) => (c, k) }
        b.remove(mk)
        b(key) = (mc + w, mc + e)
    }

  override def reduce(b: mutable.HashMap[String, (Long, Long)],
      key: String): mutable.HashMap[String, (Long, Long)] = {
    if (key != null) insert(b, key, 1L, 0L)
    b
  }

  override def merge(a: mutable.HashMap[String, (Long, Long)],
      b: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (k, (c, e)) =>
      big.get(k) match {
        case Some((c0, e0)) => big(k) = (c0 + c, e0 + e)
        case None => big(k) = (c, e)
      }
    }
    if (big.size > capacity) {
      // trim to the top `capacity` counts (mergeable-summaries style);
      // dropped mass is below the retained minimum by construction
      val keep = big.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
        .take(capacity)
      big.clear()
      keep.foreach { case (k, v) => big(k) = v }
    }
    big
  }

  override def finish(b: mutable.HashMap[String, (Long, Long)]): Seq[HeavyHitter] =
    b.toSeq.sortBy { case (k, (c, e)) => (-c, e, k) }
      .take(outK)
      .map { case (k, (c, e)) => HeavyHitter(k, c, e) }

  override def bufferEncoder: Encoder[mutable.HashMap[String, (Long, Long)]] =
    Encoders.kryo[mutable.HashMap[String, (Long, Long)]]
  override def outputEncoder: Encoder[Seq[HeavyHitter]] =
    ExpressionEncoder[Seq[HeavyHitter]]()
}

object SpaceSavingAgg {
  /** Column form: an array<struct<key,count,err>> of the top `outK`
    * heavy hitters of `key`, sketched at `capacity` counters.
    */
  def column(key: Column, capacity: Int, outK: Int): Column =
    udaf(new SpaceSavingAgg(capacity, outK)).apply(key)
}
