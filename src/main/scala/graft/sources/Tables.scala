package graft.sources

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders + cube constructors over the driver testdata
  * (/root/repo/TESTDATA.md). The long-form cube columns follow the
  * reference's canonical (x, y, t, bands) naming
  * (reference: tests/mockdata.py:50-56) so dim-type inference by name works.
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.core.SparkTuning.tune(spark)
    // set BEFORE any read, not just in events(): an INT64 TIMESTAMP(NANOS)
    // column in ANY table would otherwise throw or not depending on
    // whether an events-based query happened to run first in the session
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  // l_shipdate / o_orderdate ship as naive parquet timestamps too —
  // normalize like events.ts so epoch arithmetic (`cast("double")`, which
  // Spark forbids on TIMESTAMP_NTZ) is legal on every temporal column a
  // loader hands out, whatever encoding the next testdata generation picks.
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(read(spark, dir, "lineitem"), "l_shipdate")
  def orders(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(read(spark, dir, "orders"), "o_orderdate")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")

  /** events.parquet has shipped with three different `ts` physical
    * encodings across testdata generations: INT64 TIMESTAMP(NANOS) (read as
    * long via spark.sql.legacy.parquet.nanosAsLong, floor-divided to micros
    * with integer `div` — a double division would lose precision above
    * 2^53 ns), TIMESTAMP_NTZ (isAdjustedToUTC=false micros, the current
    * DuckDB-written form), and session-zoned TIMESTAMP. Normalize all three
    * to TimestampType HERE so downstream epoch arithmetic
    * (`ts.cast("double")`) never sees an NTZ column — Spark forbids that
    * cast and every consumer would have to special-case it otherwise. The
    * session timezone is pinned to UTC, so NTZ→LTZ relabeling is a no-op on
    * the stored instant.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(read(spark, dir, "events"))

  /** Normalize a `ts` column of any of the three observed encodings
    * (long nanos / TIMESTAMP_NTZ / TIMESTAMP) to TimestampType micros.
    * A missing column is named loudly — that is the NEXT drift class
    * (renamed/dropped temporal columns), and the generic schema-lookup
    * error would not say which loader's contract broke.
    */
  def normalizeTs(raw: DataFrame, tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    require(raw.schema.fieldNames.contains(tsCol),
      s"testdata drift: expected temporal column '$tsCol' in " +
        s"[${raw.schema.fieldNames.mkString(", ")}]")
    val out = raw.schema(tsCol).dataType match {
      case LongType =>
        raw.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampNTZType =>
        raw.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => raw
    }
    // a FOURTH encoding (DATE, string, …) must fail here with a drift
    // message, not pass through and strand downstream epoch casts the way
    // the r8 NTZ drift did — the catch-all above is only for frames that
    // are already TimestampType
    require(out.schema(tsCol).dataType == TimestampType,
      s"testdata drift: '$tsCol' has unhandled encoding " +
        s"${raw.schema(tsCol).dataType.catalogString}; teach normalizeTs " +
        "the new physical type before trusting any temporal query")
    out
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")

  /** events as a (t, band) cube: t = event timestamp, band = event_type,
    * value = the metric. Extra id dims opt-in.
    */
  def eventsCube(spark: SparkSession, dir: String,
      extraDims: Seq[String] = Nil): DataCube = {
    val df = events(spark, dir)
      .withColumnRenamed("ts", "t")
      .withColumnRenamed("event_type", "band")
    DataCube.fromTable(df, Seq("t", "band") ++ extraDims, "value")
  }

  /** lineitem as a cube: t = shipdate, band = returnflag by default; callers
    * can pick other dim/value columns.
    */
  def lineitemCube(spark: SparkSession, dir: String,
      dims: Seq[(String, String)] = Seq("l_shipdate" -> "t", "l_returnflag" -> "band"),
      valueCol: String = "l_quantity"): DataCube = {
    val df = dims.foldLeft(lineitem(spark, dir)) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }.withColumnRenamed(valueCol, "value")
    DataCube.fromTable(df, dims.map(_._2), "value")
  }
}
