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
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")

  /** events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects by default; read the nanos as long
    * (spark.sql.legacy.parquet.nanosAsLong) and floor-divide to micros with
    * integer `div` (a double division would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
