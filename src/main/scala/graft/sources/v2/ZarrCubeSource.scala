package graft.sources.v2

import graft.sources.ZarrReader
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** DataSourceV2 facade over [[ZarrReader]]: one zarr asset exposed as a
  * CUBE-COORDINATE table `(x, y, t, bands, value)` whose scan translates
  * pushed Catalyst filters into chunk-index ranges.
  *
  * This is what makes extent pruning arrive via the OPTIMIZER instead of
  * loader arguments: a graph that loads first and filters later —
  * `load_stac` → `filter_bbox` → `filter_temporal`, the reference's lazy
  * xarray-slicing ergonomics (cubes/load.py:245-310) — compiles to a
  * `Filter` over this scan, Catalyst pushes the x/y/t/bands predicates
  * down, and `planInputPartitions` plans ONLY the intersecting chunks.
  * At 100 TB the difference is reading a handful of chunk files versus
  * the whole store.
  *
  * Scan layout: one [[InputPartition]] per intersecting chunk — the same
  * per-chunk executor fan-out [[ZarrReader.loadArray]] uses, now visible
  * to Spark as the scan's native partitioning. Pushed filters are also
  * RETURNED as residuals, so Spark re-applies them exactly: the index
  * translation may keep a boundary cell (it widens one cell against
  * float edges) but can never produce a wrong row.
  *
  * Axis semantics mirror [[graft.sources.StacLoader.loadCube]]:
  * rank 2 = (row=y, col=x); rank 3 with `timeLabels` matching axis 0 =
  * (time, row, col) where each slice carries its label as `t`; any other
  * rank 3 = (band, row, col) with `bands` = `<band>_<i>`. Column pruning
  * is supported (`SupportsPushDownRequiredColumns`) — a `value`-only
  * aggregate never materialises coordinates.
  */
class ZarrCubeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrCubeSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ZarrCubeTable(ZarrCubeSource.confFrom(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object ZarrCubeSource {
  val Schema: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("t", TimestampType, nullable = false),
    StructField("bands", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Immutable asset description carried from reader options into every
    * partition: store path, geo transform corners, band name, the
    * constant datetime, and (optionally) per-slice time labels.
    */
  final case class Conf(path: String, west: Double, south: Double,
      east: Double, north: Double, band: String, datetimeMicros: Long,
      labelMicros: Array[Long]) extends Serializable

  private[v2] def confFrom(props: util.Map[String, String]): Conf = {
    val ci = new CaseInsensitiveStringMap(props) // option case is caller's
    def req(k: String): String = {
      val v = ci.get(k)
      require(v != null && v.nonEmpty, s"ZarrCubeSource: missing option $k")
      v
    }
    val labels = Option(ci.get("timelabels")).filter(_.nonEmpty)
      .map(_.split(",").map(parseMicros)).getOrElse(Array.empty[Long])
    Conf(req("path"), req("west").toDouble, req("south").toDouble,
      req("east").toDouble, req("north").toDouble, req("band"),
      parseMicros(req("datetime")), labels)
  }

  /** ISO datetime → epoch micros (UTC). Accepts instants with offset,
    * bare datetimes and bare dates — the forms STAC items carry.
    */
  private[v2] def parseMicros(s: String): Long = {
    val inst =
      try java.time.Instant.parse(s)
      catch {
        case _: java.time.format.DateTimeParseException =>
          try java.time.LocalDateTime.parse(s)
            .atOffset(java.time.ZoneOffset.UTC).toInstant
          catch {
            case _: java.time.format.DateTimeParseException =>
              java.time.LocalDate.parse(s).atStartOfDay(
                java.time.ZoneOffset.UTC).toInstant
          }
      }
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  /** A pushed comparison value → epoch micros; the Filter API hands
    * TimestampType literals as java.sql.Timestamp (default) or
    * java.time.Instant (java8 datetime API).
    */
  private[v2] def toMicros(v: Any): Option[Long] = v match {
    case ts: java.sql.Timestamp =>
      Some(math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case s: String => scala.util.Try(parseMicros(s)).toOption
    case _ => None
  }

  private[v2] def toDouble(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case s: Short => Some(s.toDouble)
    case b: Byte => Some(b.toDouble)
    case d: java.math.BigDecimal => Some(d.doubleValue())
    case _ => None
  }
}

private[v2] class ZarrCubeTable(conf: ZarrCubeSource.Conf)
    extends Table with SupportsRead {
  override def name(): String = s"zarr:${conf.path}"
  override def schema(): StructType = ZarrCubeSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrCubeScanBuilder(conf)
}

/** Pushdown state accumulation lives in [[CubeExtentScanBuilder]] (one
  * definition shared with the TIFF facade); this binds it to the zarr
  * scan.
  */
private[v2] class ZarrCubeScanBuilder(conf: ZarrCubeSource.Conf)
    extends CubeExtentScanBuilder {
  override protected def buildScan(): Scan = new ZarrCubeScan(conf, required,
    (xLo, xHi), (yLo, yHi), (tLo, tHi), bandSel, accepted)
}

private[v2] class ZarrCubeScan(conf: ZarrCubeSource.Conf,
    required: StructType,
    xB: (Double, Double), yB: (Double, Double), tB: (Long, Long),
    bandSel: Option[Set[String]], accepted: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {
  import ZarrCubeSource._

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Post-pruning row estimate from the planned cell count — what lets
    * Catalyst BROADCAST a small-extent cube side of a join instead of
    * shuffling the big side (the join-planning payoff of pushdown).
    */
  override def estimateStatistics(): Statistics = {
    val rows =
      try plannedPartitions.map { p =>
        val zp = p.asInstanceOf[ZarrChunkPartition]
        // in-slice cells of this chunk (edge clip approximated by slice)
        (0 until zp.meta.shape.size).map { d =>
          val c = zp.meta.chunks(d).toLong
          val lo = math.max(zp.key(d) * c, zp.sliceLo(d))
          val hi = math.min(zp.key(d) * c + c - 1,
            math.min(zp.meta.shape(d) - 1L, zp.sliceHi(d)))
          math.max(0L, hi - lo + 1)
        }.product
      }.sum
      catch { case scala.util.control.NonFatal(_) => -1L }
    CubeScanUtil.statsOf(rows, required.size)
  }
  override def description(): String =
    s"ZarrCubeScan ${conf.path} " + CubeScanUtil.describeExtent(xB, yB, tB, bandSel)


  override def planInputPartitions(): Array[InputPartition] = plannedPartitions

  /** Planned once per Scan: the optimizer probes estimateStatistics and
    * execution calls planInputPartitions on the same instance — without
    * the cache each probe re-reads store metadata and re-walks the whole
    * chunk directory (seconds of driver I/O on a 10⁵-chunk archive).
    */
  private lazy val plannedPartitions: Array[InputPartition] = computePartitions()

  private def computePartitions(): Array[InputPartition] = {
    val meta = ZarrReader.readMeta(conf.path)
    val rank = meta.shape.size
    require(rank == 2 || rank == 3,
      s"ZarrCubeSource: rank-$rank stores unsupported (2 or 3)")
    val timeAxis = rank == 3 && conf.labelMicros.length == meta.shape(0)
    val (nr, nc) =
      if (rank == 2) (meta.shape(0).toLong, meta.shape(1).toLong)
      else (meta.shape(1).toLong, meta.shape(2).toLong)
    val rr = CubeScanUtil.axisRange(yB._1, yB._2, conf.south, conf.north - conf.south, nr)
    val cr = CubeScanUtil.axisRange(xB._1, xB._2, conf.west, conf.east - conf.west, nc)
    // constant-coordinate predicates can empty the scan outright
    val constT = !timeAxis &&
      (conf.datetimeMicros < tB._1 || conf.datetimeMicros > tB._2)
    val bandAxis = rank == 3 && !timeAxis
    val constBand = !bandAxis && bandSel.exists(!_.contains(conf.band))
    if (constT || constBand) return Array.empty
    val axis0: Option[(Long, Long)] =
      if (rank == 2) None
      else if (timeAxis) {
        // label hull of the pushed [tLo, tHi] window
        val sel = conf.labelMicros.zipWithIndex
          .filter { case (m, _) => m >= tB._1 && m <= tB._2 }.map(_._2)
        if (sel.isEmpty) return Array.empty // no slice in the window
        Some((sel.min.toLong, sel.max.toLong))
      } else bandSel match {
        // band axis: bands values are "<band>_<i>"
        case Some(names) =>
          val sel = (0 until meta.shape(0))
            .filter(i => names.contains(s"${conf.band}_$i"))
          if (sel.isEmpty) return Array.empty // no matching band slice
          Some((sel.min.toLong, sel.max.toLong))
        case None => None
      }
    val slices = if (rank == 2) Seq(rr, cr) else Seq(axis0, rr, cr)
    val selKeys = ZarrReader.planChunks(meta, slices)
    val present = ZarrReader.chunkKeys(conf.path, meta).toSet
    require(selKeys.forall(present.contains) || meta.fillValue.isDefined,
      "ZarrCorrupt: store has missing chunks but no fill_value")
    val lo = Array.tabulate(rank)(d => slices(d).map(_._1).getOrElse(0L))
    val hi = Array.tabulate(rank)(d =>
      slices(d).map(_._2).getOrElse(meta.shape(d) - 1L))
    selKeys.map(k => ZarrChunkPartition(conf, meta, k.toArray,
      present.contains(k), timeAxis, lo, hi,
      required.fieldNames): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZarrCubeReaderFactory
}

/** One chunk of one asset: everything the executor-side reader needs. */
private[v2] final case class ZarrChunkPartition(conf: ZarrCubeSource.Conf,
    meta: ZarrReader.ZarrMeta, key: Array[Int], isPresent: Boolean,
    timeAxis: Boolean, sliceLo: Array[Long], sliceHi: Array[Long],
    columns: Array[String]) extends InputPartition

private[v2] object ZarrCubeReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ZarrChunkReader(p.asInstanceOf[ZarrChunkPartition])
}

/** Decodes its chunk with the [[ZarrReader]] primitives and walks it in
  * C order, clipping edge padding and the pushed slice bounds — the same
  * cell loop as `loadArray`, emitting cube-coordinate rows directly.
  */
private[v2] class ZarrChunkReader(p: ZarrChunkPartition)
    extends PartitionReader[InternalRow] {
  private val m = p.meta
  private val rank = m.shape.size
  private val vals: Array[Double] =
    if (!p.isPresent) Array.fill(m.chunks.product)(m.fillValue.get)
    else {
      val raw = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p.conf.path, m.keyOf(p.key.toSeq)))
      if (m.shard.isDefined) ZarrReader.decodeShard(raw, m)
      else {
        val u = ZarrReader.unpack(ZarrReader.decodeChunk(raw, m), m.dtype)
        m.transpose.fold(u)(ZarrReader.untranspose(u, m.chunks, _))
      }
    }
  private val chunkShape = m.chunks.toArray
  private val strides = {
    val s = new Array[Int](rank)
    s(rank - 1) = 1
    var d = rank - 2
    while (d >= 0) { s(d) = s(d + 1) * chunkShape(d + 1); d -= 1 }
    s
  }
  private val (nr, nc) =
    if (rank == 2) (m.shape(0).toLong, m.shape(1).toLong)
    else (m.shape(1).toLong, m.shape(2).toLong)
  private val stepX = (p.conf.east - p.conf.west) / nc
  private val stepY = (p.conf.north - p.conf.south) / nr
  private val coords = new Array[Long](rank)
  private var flat = -1
  // column opcodes + per-axis-0 band strings precomputed once; the row
  // object is REUSED across get() calls (the downstream consumer copies
  // fields into its UnsafeRow before the next advance — the standard
  // row-based-reader contract)
  private val ops: Array[Int] = p.columns.map {
    case "x" => 0
    case "y" => 1
    case "t" => 2
    case "bands" => 3
    case "value" => 4
    case other => throw new IllegalArgumentException(
      s"ZarrCubeSource: unknown column $other")
  }
  private val bandStrs: Array[UTF8String] =
    if (rank == 3 && !p.timeAxis)
      Array.tabulate(m.shape(0))(i =>
        UTF8String.fromString(s"${p.conf.band}_$i"))
    else Array(UTF8String.fromString(p.conf.band))
  private val row =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      p.columns.length)

  override def next(): Boolean = {
    var ok = false
    while (!ok && flat + 1 < vals.length) {
      flat += 1
      ok = true
      var r = 0
      while (r < rank && ok) {
        val local = (flat / strides(r)) % chunkShape(r)
        val global = p.key(r).toLong * chunkShape(r) + local
        if (global >= m.shape(r) ||
          global < p.sliceLo(r) || global > p.sliceHi(r)) ok = false
        coords(r) = global
        r += 1
      }
    }
    ok
  }

  override def get(): InternalRow = {
    val (ri, ci) = if (rank == 2) (0, 1) else (1, 2)
    var i = 0
    while (i < ops.length) {
      ops(i) match {
        case 0 => row.update(i, p.conf.west + coords(ci) * stepX)
        case 1 => row.update(i, p.conf.south + coords(ri) * stepY)
        case 2 => row.update(i,
          if (p.timeAxis) p.conf.labelMicros(coords(0).toInt)
          else p.conf.datetimeMicros)
        case 3 => row.update(i,
          if (rank == 3 && !p.timeAxis) bandStrs(coords(0).toInt)
          else bandStrs(0))
        case _ => row.update(i, vals(flat))
      }
      i += 1
    }
    row
  }

  override def close(): Unit = ()
}
