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

  /** inspect: log-and-pass-through (reference: inspect.py:9-29). */
  def inspect(cube: DataCube, message: String = ""): DataCube = {
    org.apache.log4j.Logger.getLogger("graft.inspect")
      .info(s"$message schema=${cube.df.schema.simpleString} dims=${cube.meta.dimNames}")
    cube
  }
}
