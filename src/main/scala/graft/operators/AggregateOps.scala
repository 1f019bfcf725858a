package graft.operators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** aggregate_temporal / aggregate_temporal_period
  * (reference: openeo_processes_dask/process_implementations/cubes/aggregate.py).
  */
object AggregateOps {

  /** One explicit aggregation interval: half-open [start, end), labeled. */
  final case class Interval(start: String, end: String, label: String)

  /** aggregate_temporal: bin by explicit intervals
    * (reference: cubes/aggregate.py:29-101). Intervals may overlap (a cell
    * can land in several bins), which rules out a plain CASE — the cube is
    * joined against a tiny interval table on a range predicate. The interval
    * table is broadcast, so the range join is a broadcast nested-loop over a
    * handful of interval rows: the fact side never shuffles for the join,
    * only for the following aggregation.
    *
    * Empty bins are preserved as null-valued rows via a final left join from
    * the label list (reference: aggregate.py:80-98 — NaN for gap bins).
    */
  def aggregateTemporal(cube: DataCube, intervals: Seq[Interval],
      reducer: Column => Column, dimension: Option[String] = None): DataCube = {
    val dim = dimension.getOrElse(cube.temporalDim)
    cube.requireDim(dim)
    val spark = cube.df.sparkSession
    import spark.implicits._

    val iv = intervals.map(i => (i.start, i.end, i.label))
      .toDF("_start", "_end", "_label")
      .select(to_timestamp(col("_start")).as("_start"),
        to_timestamp(col("_end")).as("_end"), col("_label"))
    val others = cube.meta.dimNames.filterNot(_ == dim)

    val binned = cube.df.join(broadcast(iv),
      col(dim) >= col("_start") && col(dim) < col("_end"), "inner")
    val agged = binned.groupBy((col("_label") +: others.map(col)): _*)
      .agg(reducer(cube.value).as(cube.meta.valueCol))

    // preserve empty bins: left join from the complete label list
    val labels = intervals.map(_.label).toDF("_label")
    val out = labels.join(agged, Seq("_label"), "left_outer")
      .withColumnRenamed("_label", dim)

    val meta = cube.meta.copy(dims = cube.meta.dims.map(d =>
      if (d.name == dim) CubeDim(dim, DimType.Temporal) else d))
    DataCube(out.select((dim +: others :+ cube.meta.valueCol).map(col): _*), meta)
  }

  /** Calendar-period binning expression for aggregate_temporal_period
    * (reference: cubes/aggregate.py:104-253). Pure Column arithmetic —
    * no interval table needed for non-overlapping calendar periods.
    */
  def periodBin(t: Column, period: String): Column = period match {
    case "hour" | "day" | "week" | "month" | "year" =>
      date_trunc(period, t)
    case "dekad" =>
      // 10-day slots in a month: days 1-10 → +0, 11-20 → +10, 21+ → +20
      // (reference: aggregate.py:137-158)
      date_add(date_trunc("month", t).cast("date"),
        (least(floor((dayofmonth(t) - 1) / 10), lit(2)) * 10).cast("int"))
        .cast("timestamp")
    case "season" =>
      // meteorological seasons DJF/MAM/JJA/SON labeled by start month;
      // Jan/Feb belong to the DJF that started the previous December
      // (reference: aggregate.py:159-176)
      val idx = floor(pmod(month(t), lit(12)) / 3) // 0=DJF 1=MAM 2=JJA 3=SON
      val startMonth = (pmod(idx * 3 + 11, lit(12)) + 1).cast("int") // 12,3,6,9
      val yr = (year(t) - when(month(t) <= 2, 1).otherwise(0)).cast("int")
      make_date(yr, startMonth, lit(1)).cast("timestamp")
    case "tropical-season" =>
      // NDJFMA (starts Nov) / MJJASO (starts May)
      // (reference: aggregate.py:177-188)
      val yr = (year(t) - when(month(t) <= 4, 1).otherwise(0)).cast("int")
      when(month(t) >= 11 || month(t) <= 4,
        make_date(yr, lit(11), lit(1)))
        .otherwise(make_date(year(t).cast("int"), lit(5), lit(1)))
        .cast("timestamp")
    case "decade" =>
      make_date((floor(year(t) / 10) * 10).cast("int"), lit(1), lit(1)).cast("timestamp")
    case "decade-ad" =>
      make_date((floor((year(t) - 1) / 10) * 10 + 1).cast("int"), lit(1), lit(1)).cast("timestamp")
    case p => throw new IllegalArgumentException(s"unknown period: $p")
  }

  /** aggregate_temporal_period: standard periods via `date_trunc`, custom
    * calendars (dekad/season/tropical-season/decade) via `periodBin` —
    * one shuffle on (period, other dims).
    */
  def aggregateTemporalPeriod(cube: DataCube, period: String,
      reducer: Column => Column, dimension: Option[String] = None): DataCube = {
    val dim = dimension.getOrElse(cube.temporalDim)
    cube.requireDim(dim)
    val others = cube.meta.dimNames.filterNot(_ == dim)
    val out = cube.df
      .withColumn("_period", periodBin(col(dim), period))
      .groupBy((col("_period").alias(dim) +: others.map(col)): _*)
      .agg(reducer(cube.value).as(cube.meta.valueCol))
    DataCube(out, cube.meta)
  }
}
