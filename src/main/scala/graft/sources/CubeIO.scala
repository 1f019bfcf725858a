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
        // metadata sidecar so load_result reconstructs the CUBE (dims in
        // order, types, CRS, value column), not just a bare table — the
        // same travels-with-the-data discipline as the ML feature sidecar
        writeCubeSidecar(cube.df.sparkSession, path, cube.meta)
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

  /** The cube-metadata sidecar's filesystem-correct path: same Hadoop FS
    * as the data (object stores and HDFS included), like the ML sidecar.
    */
  private def sidecarFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_cube.json")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def dimTypeName(t: DimType): String = t match {
    case DimType.Spatial => "spatial"
    case DimType.Temporal => "temporal"
    case DimType.Bands => "bands"
    case DimType.Other => "other"
  }

  private def dimTypeOf(s: String): DimType = s match {
    case "spatial" => DimType.Spatial
    case "temporal" => DimType.Temporal
    case "bands" => DimType.Bands
    case _ => DimType.Other
  }

  /** Write the `_graft_cube.json` metadata sidecar beside a parquet sink:
    * ordered dims with types, optional CRS, value column. Label sets are
    * NOT persisted — they are implicit in the data (the canonical source)
    * and a materialized copy could go stale against a rewritten store.
    */
  def writeCubeSidecar(spark: SparkSession, path: String,
      meta: CubeMetadata): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val doc = JObject(
      "dims" -> JArray(meta.dims.map(d => JObject(
        "name" -> JString(d.name),
        "type" -> JString(dimTypeName(d.dimType)))).toList),
      "crs" -> meta.crs.map(JString(_)).getOrElse(JNull),
      "value_col" -> JString(meta.valueCol))
    val (fs, side) = sidecarFs(spark, path)
    val out = fs.create(side, true)
    try out.write(JsonMethods.compact(JsonMethods.render(doc)).getBytes("UTF-8"))
    finally out.close()
  }

  /** openEO `load_result`: reload a [[saveResult]] parquet sink as a CUBE,
    * metadata reconstructed from the sidecar — the lifecycle closure that
    * lets one graph end in save_result and the next begin from it. The
    * read stays a lazy distributed parquet scan (partition-pruned when the
    * sink was partitioned). Missing store or sidecar → the wire-level
    * ResultNotFound; a sidecar naming columns the data lacks →
    * loud error, never a silently mis-shaped cube.
    */
  def loadResult(spark: SparkSession, path: String): DataCube = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val (fs, side) = sidecarFs(spark, path)
    require(fs.exists(side),
      s"ResultNotFound: no saved result at $path (missing _graft_cube.json " +
        "— only the parquet sink is reloadable as a cube; rasters reload " +
        "through load_stac)")
    val in = fs.open(side)
    val doc = try JsonMethods.parse(
        new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    val dims = (doc \ "dims") match {
      case JArray(ds) => ds.map { d =>
        val name = (d \ "name") match {
          case JString(s) => s
          case v => throw new IllegalArgumentException(
            s"ResultNotFound: malformed cube sidecar at $path ($v)")
        }
        val t = (d \ "type") match { case JString(s) => s; case _ => "other" }
        CubeDim(name, dimTypeOf(t))
      }
      case v => throw new IllegalArgumentException(
        s"ResultNotFound: malformed cube sidecar at $path ($v)")
    }
    val crs = (doc \ "crs") match { case JString(s) => Some(s); case _ => None }
    val valueCol = (doc \ "value_col") match {
      case JString(s) => s
      case _ => "value"
    }
    val df = spark.read.parquet(path)
    val missing = (dims.map(_.name) :+ valueCol).filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"ResultNotFound: sidecar names columns ${missing.mkString(",")} " +
        s"absent from the parquet store at $path")
    DataCube(df, CubeMetadata(dims, crs, valueCol))
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
