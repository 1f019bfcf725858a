package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the pipeline extensions)
  * is exposed as a named query over the driver testdata, paired with a DuckDB
  * oracle in [[oracleSql]]. Query registries live under `graft.queries`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("reduce_stats")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CubeQueries.queries ++ SeriesQueries.queries ++
      PipelineQueries.queries ++ SpatialQueries.queries ++ MLQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CubeQueries.oracles ++ SeriesQueries.oracles ++
      PipelineQueries.oracles ++ SpatialQueries.oracles ++ MLQueries.oracles
}
