package graft.queries

import graft.operators.MLOps
import graft.sources.Tables
import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML + streaming queries. `ml_random_forest` is checked against a FROZEN
  * prediction oracle (MLlib tree ensembles aren't DuckDB-expressible, but the
  * seeded, partition-pinned model is bit-reproducible — see
  * tools/freeze_rf_oracle.py). `streaming_window` runs a real Structured
  * Streaming query to completion and is oracle-checked against the batch
  * equivalent; `run_udf` exercises the subprocess-pipe UDF bridge.
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
      // Pin the training partitioning: MLlib's bootstrap sampling seeds per
      // PARTITION INDEX, so without a fixed hash-partitioning + in-partition
      // order the forest would vary with the session's core count. With it,
      // the seeded model is bit-reproducible — which is what lets the frozen
      // VALUES oracle below hash-check this query.
      val train = li.repartition(4, col("l_orderkey"), col("l_linenumber"))
        .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
      val feats = Seq("f_part", "f_supp", "f_disc", "f_price")
      val model = MLOps.fitRandomForest(train, feats, "l_quantity",
        numTrees = 10, maxDepth = 5)
      val head = li.orderBy(col("l_orderkey"), col("l_linenumber")).limit(200)
      MLOps.predictRandomForest(model, head, feats)
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
    // ml_random_forest: FROZEN oracle — the seeded, partition-pinned model's
    // predictions at sf0.01 (the driver gate's scale factor; other SFs have
    // different data and will mismatch by construction), regenerated via
    // tools/freeze_rf_oracle.py when the model config changes. MLlib trees
    // aren't SQL-expressible, but the frozen VALUES make the query
    // hash-checkable instead of rows-only.
    "ml_random_forest" ->
      """SELECT CAST(k AS BIGINT) AS l_orderkey, CAST(ln AS INT) AS l_linenumber, p AS pred_qty
        |FROM (VALUES (0, 1, '25.4933'::DOUBLE), (0, 2, '25.5409'::DOUBLE), (0, 4, '25.5122'::DOUBLE), (1, 3, '25.4674'::DOUBLE), (1, 7, '25.074'::DOUBLE), (1, 7, '25.2844'::DOUBLE), (2, 2, '25.4589'::DOUBLE), (2, 4, '24.8983'::DOUBLE), (2, 6, '25.4647'::DOUBLE), (2, 6, '25.1116'::DOUBLE), (2, 7, '25.1484'::DOUBLE), (3, 2, '25.8487'::DOUBLE), (3, 4, '25.4349'::DOUBLE), (3, 6, '25.3895'::DOUBLE), (3, 7, '25.0531'::DOUBLE), (4, 2, '25.59'::DOUBLE), (4, 4, '25.5916'::DOUBLE), (4, 5, '25.1578'::DOUBLE), (4, 6, '25.4941'::DOUBLE), (4, 6, '25.3702'::DOUBLE), (5, 2, '25.4853'::DOUBLE), (5, 2, '25.3934'::DOUBLE), (5, 3, '24.6051'::DOUBLE), (5, 5, '25.5934'::DOUBLE), (6, 5, '24.9516'::DOUBLE), (6, 5, '25.5691'::DOUBLE), (6, 6, '25.4764'::DOUBLE), (6, 6, '25.6036'::DOUBLE), (7, 1, '24.7504'::DOUBLE), (7, 2, '25.4319'::DOUBLE), (7, 3, '25.0622'::DOUBLE), (7, 4, '26.2061'::DOUBLE), (7, 4, '25.3632'::DOUBLE), (8, 2, '24.8043'::DOUBLE), (8, 4, '25.6772'::DOUBLE), (8, 6, '24.9208'::DOUBLE), (9, 2, '25.3648'::DOUBLE), (9, 3, '25.6613'::DOUBLE), (9, 4, '25.6924'::DOUBLE), (9, 5, '25.3839'::DOUBLE), (10, 1, '25.4961'::DOUBLE), (10, 4, '25.4779'::DOUBLE), (11, 2, '25.1321'::DOUBLE), (11, 2, '25.4125'::DOUBLE), (11, 4, '24.9775'::DOUBLE), (12, 5, '25.5224'::DOUBLE), (12, 7, '25.421'::DOUBLE), (13, 2, '25.5255'::DOUBLE), (13, 5, '25.504'::DOUBLE), (13, 7, '25.9874'::DOUBLE), (14, 3, '25.564'::DOUBLE), (14, 3, '25.5575'::DOUBLE), (14, 5, '25.2939'::DOUBLE), (14, 6, '26.2651'::DOUBLE), (15, 3, '25.4826'::DOUBLE), (15, 5, '25.5926'::DOUBLE), (15, 6, '25.191'::DOUBLE), (16, 5, '25.384'::DOUBLE), (17, 1, '26.1796'::DOUBLE), (17, 5, '25.5513'::DOUBLE), (17, 5, '25.3215'::DOUBLE), (17, 7, '25.2772'::DOUBLE), (18, 1, '25.0005'::DOUBLE), (18, 3, '25.5396'::DOUBLE), (18, 7, '25.3601'::DOUBLE), (19, 1, '25.3564'::DOUBLE), (19, 1, '25.0107'::DOUBLE), (19, 2, '25.3531'::DOUBLE), (19, 2, '25.3151'::DOUBLE), (19, 3, '25.0507'::DOUBLE), (19, 4, '25.5874'::DOUBLE), (20, 1, '25.3532'::DOUBLE), (20, 2, '25.4378'::DOUBLE), (20, 2, '24.9404'::DOUBLE), (20, 4, '25.248'::DOUBLE), (20, 6, '25.5904'::DOUBLE), (20, 7, '25.028'::DOUBLE), (21, 3, '25.1512'::DOUBLE), (21, 3, '25.4651'::DOUBLE), (21, 3, '25.49'::DOUBLE), (21, 4, '25.2191'::DOUBLE), (21, 7, '25.4627'::DOUBLE), (22, 3, '25.1966'::DOUBLE), (22, 5, '25.2271'::DOUBLE), (22, 5, '27.315'::DOUBLE), (22, 6, '25.4684'::DOUBLE), (23, 2, '25.3655'::DOUBLE), (23, 7, '25.4441'::DOUBLE), (24, 1, '25.254'::DOUBLE), (24, 1, '25.2542'::DOUBLE), (25, 4, '25.2562'::DOUBLE), (25, 7, '25.2779'::DOUBLE), (26, 1, '25.5691'::DOUBLE), (26, 3, '25.3919'::DOUBLE), (26, 4, '25.5106'::DOUBLE), (26, 6, '25.6725'::DOUBLE), (26, 6, '25.1203'::DOUBLE), (27, 1, '24.9964'::DOUBLE), (27, 3, '24.8635'::DOUBLE), (27, 7, '25.6036'::DOUBLE), (27, 7, '25.5014'::DOUBLE), (28, 1, '25.597'::DOUBLE), (28, 6, '25.5019'::DOUBLE), (29, 1, '25.0932'::DOUBLE), (29, 2, '25.6295'::DOUBLE), (29, 4, '24.7962'::DOUBLE), (29, 5, '25.4349'::DOUBLE), (29, 5, '25.3356'::DOUBLE), (29, 7, '25.1501'::DOUBLE), (30, 3, '25.4184'::DOUBLE), (30, 5, '24.5873'::DOUBLE), (30, 7, '25.4947'::DOUBLE), (31, 4, '25.5718'::DOUBLE), (31, 5, '25.5711'::DOUBLE), (32, 4, '25.4365'::DOUBLE), (33, 5, '25.4951'::DOUBLE), (34, 1, '25.28'::DOUBLE), (34, 2, '25.5893'::DOUBLE), (34, 2, '25.6009'::DOUBLE), (34, 3, '25.804'::DOUBLE), (34, 6, '25.5486'::DOUBLE), (35, 1, '24.9423'::DOUBLE), (35, 6, '25.4017'::DOUBLE), (35, 7, '25.4035'::DOUBLE), (36, 1, '26.0415'::DOUBLE), (36, 1, '25.4647'::DOUBLE), (36, 5, '25.5937'::DOUBLE), (36, 7, '25.1793'::DOUBLE), (37, 3, '25.0947'::DOUBLE), (37, 3, '25.1755'::DOUBLE), (37, 6, '25.0378'::DOUBLE), (38, 2, '25.7699'::DOUBLE), (38, 2, '25.4091'::DOUBLE), (38, 7, '26.1663'::DOUBLE), (39, 7, '25.2872'::DOUBLE), (41, 2, '25.4641'::DOUBLE), (41, 2, '25.7607'::DOUBLE), (41, 5, '25.4941'::DOUBLE), (41, 5, '26.0382'::DOUBLE), (41, 7, '25.2305'::DOUBLE), (41, 7, '25.4853'::DOUBLE), (42, 1, '25.0508'::DOUBLE), (42, 2, '25.2307'::DOUBLE), (42, 4, '25.4589'::DOUBLE), (42, 4, '25.2317'::DOUBLE), (42, 5, '25.4337'::DOUBLE), (42, 7, '24.8958'::DOUBLE), (43, 1, '25.4265'::DOUBLE), (43, 1, '25.5812'::DOUBLE), (43, 2, '25.3518'::DOUBLE), (43, 5, '25.4656'::DOUBLE), (43, 6, '25.4135'::DOUBLE), (44, 3, '25.0756'::DOUBLE), (44, 5, '25.5744'::DOUBLE), (44, 5, '25.1776'::DOUBLE), (45, 4, '25.4263'::DOUBLE), (45, 6, '25.3601'::DOUBLE), (45, 6, '25.5129'::DOUBLE), (45, 7, '25.3391'::DOUBLE), (45, 7, '25.5009'::DOUBLE), (46, 2, '25.6386'::DOUBLE), (46, 3, '25.5152'::DOUBLE), (46, 4, '25.6623'::DOUBLE), (46, 4, '25.575'::DOUBLE), (46, 5, '24.117'::DOUBLE), (47, 2, '25.0897'::DOUBLE), (47, 3, '25.2294'::DOUBLE), (47, 3, '25.3087'::DOUBLE), (47, 3, '25.4698'::DOUBLE), (47, 5, '25.5005'::DOUBLE), (47, 6, '25.3973'::DOUBLE), (48, 4, '25.361'::DOUBLE), (48, 4, '26.0629'::DOUBLE), (48, 5, '24.7488'::DOUBLE), (48, 7, '25.5519'::DOUBLE), (49, 4, '24.9905'::DOUBLE), (50, 3, '25.55'::DOUBLE), (50, 3, '25.4464'::DOUBLE), (50, 4, '25.7108'::DOUBLE), (50, 6, '24.9518'::DOUBLE), (50, 6, '25.2951'::DOUBLE), (50, 7, '25.5978'::DOUBLE), (51, 3, '24.6709'::DOUBLE), (51, 4, '25.0007'::DOUBLE), (51, 6, '25.5023'::DOUBLE), (51, 7, '25.4509'::DOUBLE), (51, 7, '25.6487'::DOUBLE), (52, 1, '25.1803'::DOUBLE), (52, 2, '25.6144'::DOUBLE), (52, 6, '25.6798'::DOUBLE), (53, 2, '25.4818'::DOUBLE), (53, 4, '25.0875'::DOUBLE), (53, 7, '25.4284'::DOUBLE), (53, 7, '25.5843'::DOUBLE), (54, 2, '24.3095'::DOUBLE), (54, 2, '25.5378'::DOUBLE), (54, 5, '24.6416'::DOUBLE), (55, 2, '25.6536'::DOUBLE), (55, 3, '25.5556'::DOUBLE), (55, 4, '25.2094'::DOUBLE)) t(k, ln, p)""".stripMargin,
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
