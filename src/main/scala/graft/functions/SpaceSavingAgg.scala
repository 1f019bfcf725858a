package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** One heavy hitter: `count` over-estimates the true frequency by at
  * most `err` (SpaceSaving invariant: true ∈ [count − err, count]).
  */
final case class HeavyHitter(key: String, count: Long, err: Long)

/** SpaceSaving sketch state: the counter map plus the sketch-level
  * `floor` — an upper bound on the true frequency of every ABSENT key.
  * `floor` starts at 0, rises to the evicted/trimmed count whenever a
  * key is dropped, and is what keeps the bracket invariant true across
  * merges: a key that was trimmed away and later re-appears from
  * another partial re-enters with the floor folded into its count and
  * error, never from zero.
  *
  * Map invariant: every entry's count ≥ `floor` (entries are created at
  * ≥ floor and only grow; floor only rises to a then-minimum count).
  *
  * The eviction min is served by a lazily-maintained heap (increase-key
  * by re-push): pushed counts are always ≤ current counts, so the heap
  * top is a lower bound of the true minimum — a stale top re-pushes at
  * its current count and the loop terminates at the true (count, key)
  * minimum. O(log capacity) amortized per eviction instead of a full
  * O(capacity) scan per new key, which is what makes the
  * beyond-capacity regime (billions of distinct keys) actually run.
  * The heap is @transient (rebuilt on demand after
  * serialization/merge), so the wire and the streaming state store
  * carry only the map and the floor.
  */
final class SsBuffer extends Serializable {
  var floor: Long = 0L
  val m: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
  @transient private var heap: mutable.PriorityQueue[(Long, String)] = _

  private def minOrd: Ordering[(Long, String)] =
    Ordering.Tuple2(Ordering.Long, Ordering.String).reverse // min-heap

  private def ensureHeap(): Unit = {
    if (heap == null) {
      heap = mutable.PriorityQueue.empty(minOrd)
      m.foreach { case (k, (c, _)) => heap.enqueue((c, k)) }
    }
  }

  def invalidateHeap(): Unit = heap = null

  def pushHeap(c: Long, k: String): Unit =
    if (heap != null) heap.enqueue((c, k))

  /** Pop the true minimum (count, key) entry, skipping/refreshing stale
    * heap records (a record is stale when the key grew past it or was
    * evicted since the push).
    */
  def evictMin(): (String, Long) = {
    ensureHeap()
    while (true) {
      val (c, k) = heap.dequeue()
      m.get(k) match {
        case Some((cc, _)) if cc == c => m.remove(k); return (k, cc)
        case Some((cc, _)) => heap.enqueue((cc, k))
        case None => // evicted earlier; drop the stale record
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

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
  * Guarantees: for every PRESENT key, true ∈ [count − err, count]; for
  * every absent key, true ≤ the sketch's floor (= 0 until something is
  * dropped). With capacity m over n items the floor stays ≤ n/m, so any
  * key with true frequency > n/m is present — the classic bound. When
  * the number of distinct keys never exceeds the capacity — the
  * correctness-gate regime the driver oracle pins — no eviction ever
  * happens and the sketch is EXACT (err = 0, counts = groupBy counts).
  *
  * Merging follows the mergeable-summaries construction (Agarwal et
  * al., "Mergeability of summaries"): floors ADD; matching keys sum
  * counts and error bounds; a key present on one side only absorbs the
  * OTHER side's floor into both its count and its err (its true count
  * over there is at most that floor — it may have been trimmed, not
  * absent); overflow trims to the capacity's top counts and raises the
  * floor to the largest dropped count. Under eviction the per-entry
  * counts depend on partitioning (any SpaceSaving does) — the bracket
  * invariant holds either way, and the gate regime is
  * partition-independent because nothing ever evicts.
  *
  * The reference has no sketch machinery (its arrays are dense rasters);
  * this extends the engine's LLM-pipeline family.
  */
class SpaceSavingAgg(capacity: Int, outK: Int)
    extends Aggregator[String, SsBuffer, Seq[HeavyHitter]] {
  require(capacity > 0 && outK > 0 && outK <= capacity,
    s"SpaceSaving: need 0 < outK ($outK) <= capacity ($capacity)")

  override def zero: SsBuffer = new SsBuffer

  override def reduce(b: SsBuffer, key: String): SsBuffer = {
    if (key != null) {
      b.m.get(key) match {
        case Some((c0, e0)) => b.m(key) = (c0 + 1L, e0)
        case None if b.m.size < capacity =>
          b.m(key) = (b.floor + 1L, b.floor)
          b.pushHeap(b.floor + 1L, key)
        case None =>
          // evict the true minimum-count entry (ties by key for
          // determinism); the newcomer inherits its count as the error
          val (_, mc) = b.evictMin()
          b.floor = mc // mc >= old floor by the map invariant
          b.m(key) = (mc + 1L, mc)
          b.pushHeap(mc + 1L, key)
      }
    }
    b
  }

  override def merge(a: SsBuffer, b: SsBuffer): SsBuffer = {
    val (big, small) = if (a.m.size >= b.m.size) (a, b) else (b, a)
    val (bigFloor, smallFloor) = (big.floor, small.floor)
    small.m.foreach { case (k, (c, e)) =>
      big.m.get(k) match {
        case Some((c0, e0)) => big.m(k) = (c0 + c, e0 + e)
        case None => big.m(k) = (c + bigFloor, e + bigFloor)
      }
    }
    if (smallFloor > 0) {
      // keys the SMALL side may have trimmed: fold its floor into every
      // entry it does not hold
      big.m.foreach { case (k, (c, e)) =>
        if (!small.m.contains(k)) big.m(k) = (c + smallFloor, e + smallFloor)
      }
    }
    big.floor = bigFloor + smallFloor
    if (big.m.size > capacity) {
      val all = big.m.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
      val (keep, drop) = all.splitAt(capacity)
      big.m.clear()
      keep.foreach { case (k, v) => big.m(k) = v }
      big.floor = math.max(big.floor, drop.head._2._1)
    }
    big.invalidateHeap()
    big
  }

  override def finish(b: SsBuffer): Seq[HeavyHitter] =
    b.m.toSeq.sortBy { case (k, (c, e)) => (-c, e, k) }
      .take(outK)
      .map { case (k, (c, e)) => HeavyHitter(k, c, e) }

  override def bufferEncoder: Encoder[SsBuffer] = Encoders.kryo[SsBuffer]
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
