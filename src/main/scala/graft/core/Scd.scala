package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction and slowly-changing-dimension layout.
  *
  * Every lakehouse ingest pipeline sits on these two shapes: an append-only
  * change log must compact to "the current row per key" (upsert
  * materialization), and a dimension consumed by point-in-time joins must
  * become versioned validity intervals (SCD type 2). Both are one-shuffle
  * operators here; the interval output composes directly with
  * [[Joins.rangeJoin]] (point-in-interval) and [[Joins.asofJoin]] for the
  * enrichment side.
  */
object Scd {

  /** Compact a change log to its latest row per key — the CDC upsert view.
    *
    * The textbook encoding is `row_number() OVER (PARTITION BY keys ORDER
    * BY time DESC) = 1`: a full shuffle of every log row followed by a
    * per-key (time, seq) sort, with nothing reduced map-side — on a 100-TB
    * log the wire carries the whole table to keep one row per key. This is
    * instead `max_by(payload, (time, seq))`: a declarative aggregate, so
    * the map side already reduces each partition to one candidate row per
    * key and the ONE exchange carries ≤ keys × partitions rows. (The
    * struct-typed buffer lands it on SortAggregate physically — the
    * within-partition sorts are on the grouping key only, and the
    * post-exchange one runs over the already-compacted candidate set, not
    * the log.)
    *
    * `(timeCol, seqCol)` must be a total order within a key (a CDC
    * sequence number, an event id) — that makes the result EXACT under any
    * partitioning, not a sketch: max over a total order is associative and
    * commutative, so partial merges cannot disagree.
    *
    * Output: `keys ++ payload`, each payload column taken from the winning
    * row.
    */
  def latestByKey(log: DataFrame, keys: Seq[String], timeCol: String,
      seqCol: String, payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "latestByKey needs at least one key column")
    require(payload.nonEmpty, "latestByKey needs at least one payload column")
    val bad = payload.filter(keys.contains)
    require(bad.isEmpty, s"payload columns ${bad.mkString(",")} are keys")
    val ord = struct(col(timeCol), col(seqCol))
    val row = struct(payload.map(col): _*)
    log.groupBy(keys.map(col): _*)
      .agg(max_by(row, ord).as("_r"))
      .select(keys.map(col) ++ payload.map(p => col(s"_r.$p").as(p)): _*)
  }

  /** Build SCD type-2 validity intervals from a change log: each change
    * row becomes a dimension version valid over `[valid_from, valid_to)`,
    * where `valid_from` is its own change time and `valid_to` is the next
    * change's time for the same key — NULL for the currently-open version.
    * Several changes sharing one `(key, time)` collapse to the
    * `(timeCol, seqCol)`-last writer (the superseded rows would be
    * zero-length `[t, t)` versions, which no point-in-time query can ever
    * observe, so they are dropped rather than emitted as degenerate rows).
    *
    * One window shuffle (partition by key, order by `(time, seq)`), `lead`
    * over the sorted run — O(n log n_key) per key and the log never
    * crosses the wire twice. The output joins against facts with
    * [[Joins.rangeJoin]] after `coalesce(valid_to, +inf)`, or skip the
    * interval materialization entirely and use [[Joins.asofJoin]] on the
    * raw log when only one fact table consumes it.
    *
    * All input columns pass through; `valid_from`/`valid_to` are appended
    * (input must not already have them). `timeCol` may be any orderable
    * type — timestamps or epoch integers.
    */
  def scd2(changes: DataFrame, keys: Seq[String], timeCol: String,
      seqCol: String): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val taken = changes.columns.toSet
    require(!taken.contains("valid_from") && !taken.contains("valid_to"),
      "input already has valid_from/valid_to columns")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(seqCol).asc)
    changes
      .withColumn("valid_from", col(timeCol))
      .withColumn("valid_to", lead(col(timeCol), 1).over(w))
      .filter(col("valid_to").isNull || col("valid_from") < col("valid_to"))
  }
}
