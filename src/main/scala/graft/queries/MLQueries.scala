package graft.queries

import graft.operators.MLOps
import graft.sources.Tables
import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML + streaming queries. `ml_random_forest` has no SQL oracle (MLlib tree
  * ensembles aren't DuckDB-expressible) → the driver records the weaker
  * rows-only check; the model run itself is seeded and deterministic.
  * `streaming_window` runs a real Structured Streaming query to completion
  * and IS oracle-checked against the batch equivalent.
  */
object MLQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "ml_random_forest" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey").cast("double").as("f_part"),
          col("l_suppkey").cast("double").as("f_supp"),
          col("l_discount").as("f_disc"),
          col("l_extendedprice").as("f_price"),
          col("l_quantity"))
      val feats = Seq("f_part", "f_supp", "f_disc", "f_price")
      val model = MLOps.fitRandomForest(li, feats, "l_quantity",
        numTrees = 10, maxDepth = 5)
      MLOps.predictRandomForest(model, li.limit(200), feats)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("prediction"), 4).as("pred_qty"))
    },
    "streaming_window" -> { (s, dir) =>
      StreamingOps.windowedEventAggregate(s, s"$dir/events.parquet")
    },

    // run_udf: user Python source executed against the cube through the
    // subprocess-pipe bridge (UdfOps) — truncation to cents happens INSIDE
    // the UDF, the engine only aggregates the returned cells.
    "run_udf" -> { (s, dir) =>
      val c = Tables.eventsCube(s, dir)
      val out = graft.operators.UdfOps.runUdf(c,
        "def udf(row):\n    return float(int(row['value'] * 100))")
      out.df.groupBy(col("band")).agg(count(lit(1)).as("n"),
        sum(col("value")).cast("bigint").as("sum_cents"))
    },

    // OpenEO JSON process graph compiled end-to-end (SURVEY §3.4): the
    // reference's canonical load → filter → apply(callback) →
    // reduce_dimension(reducer) slice, arriving as wire-format JSON.
    "process_graph" -> { (s, dir) =>
      val graph =
        """{"process_graph": {
          |  "load": {"process_id": "load_collection",
          |           "arguments": {"id": "events"}},
          |  "filt": {"process_id": "filter_temporal",
          |           "arguments": {"data": {"from_node": "load"},
          |                         "extent": ["2024-01-05", "2024-01-25"]}},
          |  "sc":   {"process_id": "apply",
          |           "arguments": {"data": {"from_node": "filt"},
          |             "process": {"process_graph": {
          |               "m": {"process_id": "multiply",
          |                     "arguments": {"x": {"from_parameter": "x"}, "y": 100}},
          |               "f": {"process_id": "floor",
          |                     "arguments": {"x": {"from_node": "m"}},
          |                     "result": true}}}}},
          |  "red":  {"process_id": "reduce_dimension",
          |           "arguments": {"data": {"from_node": "sc"}, "dimension": "t",
          |             "reducer": {"process_graph": {
          |               "m1": {"process_id": "mean",
          |                      "arguments": {"data": {"from_parameter": "data"}},
          |                      "result": true}}}},
          |           "result": true}
          |}}""".stripMargin
      val out = graft.plans.ProcessGraph.execute(s, graph,
        { case "events" => Tables.eventsCube(s, dir)
          case c => throw new IllegalArgumentException(s"unknown collection $c") })
      out.df.select(col("band"), col("value").as("avg_cents"))
    }
  )

  val oracles: Map[String, String] = Map(
    // ml_random_forest intentionally omitted (rows-only check)
    "run_udf" ->
      // python int() truncates toward zero; events values are positive, so
      // floor(value*100) over the same parquet doubles is the same integer
      """SELECT event_type AS band, count(*) AS n,
        |       CAST(sum(floor(value*100)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1""".stripMargin,
    "streaming_window" ->
      """SELECT epoch_us(ts) // 21600000000 AS bucket, event_type AS band,
        |       count(*) AS n, CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "process_graph" ->
      """SELECT event_type AS band, avg(floor(value * 100)) AS avg_cents
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-25 00:00:00'
        |GROUP BY 1""".stripMargin
  )
}
