package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact integer product as a typed Aggregator (reference: math.py:401-409
  * `product`, math.py:125-174 `cumproduct`, both exact in the scaled-decimal
  * domain while the running product stays under 2^53).
  *
  * Why an Aggregator and not `aggregate(collect_list(v), ...)`: the fold form
  * materialises the whole group per evaluation — under a running window frame
  * that is O(n²) work and O(n) memory PER ROW, a scale-killer on long series.
  * An Aggregator buffer is a single Long: groupBy gets map-side partial
  * aggregation, and Spark's running-frame window processor updates the buffer
  * incrementally — O(n) total per series.
  *
  * Null handling is done by the caller (coalesce inputs to the multiplicative
  * identity; null-out outputs), keeping the Aggregator a pure monoid.
  */
object ProductAgg extends Aggregator[Long, Long, Long] {
  def zero: Long = 1L
  def reduce(b: Long, a: Long): Long = b * a
  def merge(b1: Long, b2: Long): Long = b1 * b2
  def finish(r: Long): Long = r
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** The registered aggregate Column: nulls are skipped (multiplied as 1). */
  def column(v: Column): Column = udaf(ProductAgg).apply(coalesce(v.cast("long"), lit(1L)))
}
