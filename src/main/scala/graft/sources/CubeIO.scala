package graft.sources

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cube I/O + misc processes without a computational core. */
object CubeIO {

  /** save_result — absent from the reference (backend-specific, SURVEY §2.1).
    * Formats: `parquet` (default — partitioned, the cluster-native sink;
    * `partitionBy` on band/temporal dims gives partition-pruned reads
    * downstream), `csv` / `json` (distributed text sinks for interchange),
    * and `gtiff` (ONE raster file via [[saveGeoTiff]]).
    */
  def saveResult(cube: DataCube, path: String,
      partitionBy: Seq[String] = Nil, format: String = "parquet"): Unit =
    format.toLowerCase match {
      case "parquet" =>
        val w = cube.df.write.mode("overwrite")
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
          .parquet(path)
      case "csv" =>
        val w = cube.df.write.mode("overwrite").option("header", "true")
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
          .csv(path)
      case "json" =>
        val w = cube.df.write.mode("overwrite")
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
          .json(path)
      case "gtiff" | "geotiff" => saveGeoTiff(cube, path)
      case "zarr" => ZarrWriter.writeGrid(cube, path) // distributed chunks
      case "zarr3" => // v3 store, sharded: the object-count-friendly sink
        ZarrWriter.writeGrid(cube, path, format = 3,
          shardInner = Some((64, 64)))
      case other => throw new IllegalArgumentException(
        s"FormatUnsuitable: $other (parquet, csv, json, gtiff, zarr, zarr3)")
    }

  /** save_result format "GTiff": one single-band float32 raster through the
    * pure-JVM [[TiffWriter]] (row 0 = northernmost y, x ascending — the
    * standard north-up layout). A single raster FILE is a driver artifact
    * by nature (the reference's rioxarray path materializes the same way),
    * so this is size-gated: grids above `maxCells` error and point to the
    * parquet sink. Non-spatial dims must be singular — reduce or filter
    * them first, exactly as the reference requires a 2-D slice.
    */
  def saveGeoTiff(cube: DataCube, path: String,
      maxCells: Long = 1L << 26): Unit = {
    val dims = cube.meta.dimNames
    require(dims.contains("x") && dims.contains("y"),
      s"FormatUnsuitable: GTiff needs x and y dims, got ${dims.mkString(",")}")
    val extras = dims.filterNot(Set("x", "y"))
    val gate = cube.df.agg(
      countDistinct(col("x")).as("nx"), countDistinct(col("y")).as("ny"),
      (if (extras.isEmpty) lit(1L)
       else countDistinct(struct(extras.map(col): _*))).as("nz")).first()
    val (nx, ny, nz) = (gate.getLong(0), gate.getLong(1), gate.getLong(2))
    require(nz <= 1, s"FormatUnsuitable: GTiff writes ONE raster slice; " +
      s"non-spatial dims ${extras.mkString(",")} carry $nz label combinations " +
      "— reduce_dimension or filter first")
    require(nx * ny <= maxCells, s"GTiff grid $nx x $ny exceeds the " +
      s"$maxCells-cell driver gate — use the parquet sink for rasters this size")
    val cells = cube.df.select(col("x").cast("double"),
      col("y").cast("double"), col("value").cast("double")).collect()
    val xs = cells.map(_.getDouble(0)).distinct.sorted
    val ys = cells.map(_.getDouble(1)).distinct.sorted.reverse // north-up
    val xi = xs.zipWithIndex.toMap
    val yi = ys.zipWithIndex.toMap
    val grid = Array.fill((nx * ny).toInt)(Float.NaN)
    cells.foreach { r =>
      grid(yi(r.getDouble(1)) * nx.toInt + xi(r.getDouble(0))) =
        r.getDouble(2).toFloat
    }
    TiffWriter.write(path, nx.toInt, ny.toInt, grid)
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
