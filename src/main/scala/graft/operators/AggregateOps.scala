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

  /** Climatology key of a timestamp — the YEAR-COLLAPSING twin of
    * [[periodBin]] (which keeps years apart): every January of every year
    * maps to the same label. openEO climatological_normal frequencies:
    * `day` (day-of-year 1..366), `month` (1..12), `season` (djf/mam/jja/
    * son), `climatology-period` (one bin).
    */
  def climoKey(t: Column, frequency: String): Column = frequency match {
    case "day" => dayofyear(t).cast("long")
    case "month" => month(t).cast("long")
    case "season" =>
      val idx = floor(pmod(month(t), lit(12)) / 3) // 0=DJF 1=MAM 2=JJA 3=SON
      when(idx === 0, "djf").when(idx === 1, "mam")
        .when(idx === 2, "jja").otherwise("son")
    case "climatology-period" => lit("climatology-period")
    case f => throw new IllegalArgumentException(
      s"climatological_normal: unknown frequency '$f' " +
        "(day, month, season, climatology-period)")
  }

  /** openEO proposal `climatological_normal` (beyond the reference's
    * exports): the arithmetic mean per climatology key — the multi-year
    * baseline an anomaly subtracts. `climatologyPeriod` optionally bounds
    * the years that define the normal (`[from, to)` on the temporal dim),
    * matching the spec's climatology_period argument; data outside it
    * never contributes. One keyed aggregation shuffle; the output's
    * temporal dimension carries the climatology labels.
    */
  def climatologicalNormal(cube: DataCube, frequency: String,
      dimension: Option[String] = None,
      climatologyPeriod: Option[(String, String)] = None): DataCube = {
    val dim = dimension.getOrElse(cube.temporalDim)
    cube.requireDim(dim)
    val others = cube.meta.dimNames.filterNot(_ == dim)
    val bounded = climatologyPeriod.fold(cube.df) { case (from, to) =>
      cube.df.filter(col(dim) >= lit(from).cast("timestamp") &&
        col(dim) < lit(to).cast("timestamp"))
    }
    val out = bounded
      .withColumn("_climo", climoKey(col(dim), frequency))
      .groupBy((col("_climo").alias(dim) +: others.map(col)): _*)
      .agg(avg(cube.value).as(cube.meta.valueCol))
    DataCube(out, cube.meta)
  }

  /** openEO proposal `anomaly`: data minus its climatological normal —
    * each cell's deviation from the multi-year baseline for its period.
    * `normals` is a [[climatologicalNormal]] output over the SAME
    * frequency and shared dims; it is metadata-sized (≤ 366 keys × other
    * labels), so the join is a broadcast onto the fact scan — the cube
    * itself never shuffles.
    */
  def anomaly(cube: DataCube, normals: DataCube, frequency: String,
      dimension: Option[String] = None): DataCube = {
    val dim = dimension.getOrElse(cube.temporalDim)
    cube.requireDim(dim)
    require(normals.meta.has(dim),
      s"anomaly: normals lack dimension '$dim' " +
        s"(${normals.meta.dimNames.mkString(",")})")
    // a normals dim ABSENT from the data would be silently projected away
    // below, collapsing several normal rows onto one join key and
    // duplicating every matching fact row — refuse instead
    val extra = normals.meta.dimNames.filterNot(d =>
      d == dim || cube.meta.has(d))
    require(extra.isEmpty,
      s"anomaly: normals carry dimensions ${extra.mkString(",")} absent " +
        "from the data cube; reduce them first")
    val shared = cube.meta.dimNames.filterNot(_ == dim)
      .filter(normals.meta.has)
    val nDf = normals.df.select(
      (col(dim).as("_nk") +: shared.map(col) :+
        col(normals.meta.valueCol).as("_normal")): _*)
    // LEFT join: a fact row whose climatology key is missing from the
    // normals (e.g. a month outside the climatology_period the normals
    // were built with) must SURVIVE with a null anomaly — an inner join
    // would silently shrink the cube, the openEO no-data contract is null
    val joined = cube.df
      .withColumn("_nk", climoKey(col(dim), frequency))
      .join(graft.core.Joins.maybeBroadcast(nDf),
        ("_nk" +: shared).toSeq, "left")
    val out = joined
      .withColumn(cube.meta.valueCol, cube.value - col("_normal"))
      .drop("_nk", "_normal")
      .select((cube.meta.dimNames :+ cube.meta.valueCol).map(col): _*)
    cube.withDf(_ => out)
  }
}
