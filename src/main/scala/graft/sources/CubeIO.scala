package graft.sources

import graft.core._
import org.apache.spark.sql.SparkSession

/** Cube I/O + misc processes without a computational core. */
object CubeIO {

  /** save_result — absent from the reference (backend-specific, SURVEY §2.1);
    * here: partitioned parquet, the cluster-native sink. `partitionBy` on
    * the band/temporal dims gives partition-pruned reads downstream.
    */
  def saveResult(cube: DataCube, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = cube.df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** create_data_cube: empty cube (reference: cubes/general.py:38-39). */
  def createDataCube(spark: SparkSession): DataCube =
    DataCube(spark.emptyDataFrame, CubeMetadata(Nil))

  /** inspect: log-and-pass-through with the reference's code/level
    * arguments (reference: inspect.py:9-29 — `{code}: {message} {data}` at
    * the chosen level, case-insensitive, data returned unchanged). The
    * structured data summary is plan metadata only (schema + dims) — never
    * an action on the cube.
    */
  def inspect(cube: DataCube, message: String = "", code: String = "User",
      level: String = "info"): DataCube = {
    val logger = org.apache.log4j.Logger.getLogger("graft.inspect")
    val line = s"$code: $message schema=${cube.df.schema.simpleString} " +
      s"dims=${cube.meta.dimNames.mkString(",")} crs=${cube.meta.crs.getOrElse("-")}"
    level.toLowerCase match {
      case "info" => logger.info(line)
      case "warning" => logger.warn(line)
      case "error" => logger.error(line)
      case "debug" => logger.debug(line)
      case other => throw new IllegalArgumentException(
        s"OpenEOException: unsupported inspect level $other")
    }
    cube
  }
}
