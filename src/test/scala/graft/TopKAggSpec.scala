package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-heap top-k-per-group aggregator: EXACT under any partitioning
  * (total order via unique ids), equal to the row_number() window answer
  * it replaces, and O(k) per (group, partition) instead of a full-table
  * shuffle + per-group sort — the property that makes it the scale path
  * for "top N rows per key" at 100 TB.
  */
class TopKAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (group, id, value) rows; values collide across ids to exercise the
    * (v desc, id asc) tie-break.
    */
  private def corpus(n: Int): Seq[(String, Long, Double)] =
    (0 until n).map { i =>
      (s"g${i % 7}", i.toLong, (i % 13).toDouble)
    }

  private def windowAnswer(rows: Seq[(String, Long, Double)], k: Int)
      : Set[(String, Int, Long, Double)] =
    rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy { case (_, id, v) => (-v, id) }.take(k).zipWithIndex
        .map { case ((_, id, v), i) => (g, i + 1, id, v) }
    }.toSet

  private def aggAnswer(rows: Seq[(String, Long, Double)], k: Int,
      parts: Int): Set[(String, Int, Long, Double)] = {
    val sess = spark
    import sess.implicits._
    rows.toDF("g", "id", "v").repartition(parts)
      .groupBy(col("g"))
      .agg(TopKAgg.column(col("v"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("e.id"), col("e.v"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  test("equals the row_number() window answer, ties broken (v desc, id asc)") {
    val rows = corpus(500) // heavy value collisions: 13 values, 7 groups
    assert(aggAnswer(rows, k = 3, parts = 4) == windowAnswer(rows, 3))
  }

  test("partition-count invariant (1 vs 9 partitions)") {
    val rows = corpus(300)
    val one = aggAnswer(rows, k = 5, parts = 1)
    val nine = aggAnswer(rows, k = 5, parts = 9)
    assert(one == nine)
    assert(one == windowAnswer(rows, 5))
  }

  test("k larger than the group returns the whole group, ranked") {
    val rows = Seq(("a", 1L, 2.0), ("a", 2L, 9.0), ("b", 3L, 1.0))
    assert(aggAnswer(rows, k = 10, parts = 3) ==
      Set(("a", 1, 2L, 9.0), ("a", 2, 1L, 2.0), ("b", 1, 3L, 1.0)))
  }

  test("compaction stress: one group, n >> cap, exact top k") {
    // 50k rows in one group forces many geometric compactions per
    // partition plus a k-trim on every merge; the answer must still be
    // the exact global top
    val rows = (0 until 50000).map(i => ("g", i.toLong, (i * 2654435761L % 99991).toDouble))
    assert(aggAnswer(rows, k = 4, parts = 8) == windowAnswer(rows, 4))
  }

  test("driver row topk_per_type matches its window oracle at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.PipelineQueries.queries("topk_per_type")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val ev = graft.sources.Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("event_id").isNotNull)
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val want = ev
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("event_type"), col("rank"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("NaN values drop instead of poisoning the comparator") {
    // NaN makes (v desc, id asc) intransitive — admitted into the buffer
    // it can throw from sortWith or rank partitioning-dependently; the
    // contract is the same as the callers' null filters: unrankable rows
    // are not ranked
    val clean = corpus(200)
    val dirty = clean ++ (1000 until 1040).map(i => ("g1", i.toLong, Double.NaN))
    for (parts <- Seq(1, 5)) {
      assert(aggAnswer(dirty, 3, parts) == windowAnswer(clean, 3))
    }
  }

  test("rejects k <= 0") {
    intercept[IllegalArgumentException] { new TopKAgg(0) }
  }
}
