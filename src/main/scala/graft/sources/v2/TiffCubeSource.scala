package graft.sources.v2

import graft.sources.TiffReader
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** The GeoTIFF/COG twin of [[ZarrCubeSource]]: one TIFF asset as a
  * cube-coordinate table `(x, y, t, bands, value)` whose scan translates
  * pushed x/y predicates into strip/tile footprints
  * ([[TiffReader.planSegments]]) — one [[InputPartition]] per
  * intersecting segment, so a small-bbox filter applied AFTER `load_stac`
  * seeks only its own strips of a huge COG. Pushed filters stay
  * residual (pruning is advisory, Spark re-applies them exactly).
  *
  * Band semantics mirror the loader: single-sample rasters carry the
  * asset band name; multi-sample rasters expose `<band>_<i>` per sample.
  * A pushed `bands` predicate empties the scan on a name mismatch
  * (single-band) and prunes whole segments on PLANAR rasters, whose
  * band-major segment table makes per-band selection a segment subset;
  * chunky interleave keeps all segments (samples interleave within one
  * strip) and relies on the residual.
  */
class TiffCubeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrCubeSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TiffCubeTable(ZarrCubeSource.confFrom(properties))
  override def supportsExternalMetadata(): Boolean = false
}

private[v2] class TiffCubeTable(conf: ZarrCubeSource.Conf)
    extends Table with SupportsRead {
  override def name(): String = s"tiff:${conf.path}"
  override def schema(): StructType = ZarrCubeSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new TiffCubeScanBuilder(conf)
}

private[v2] class TiffCubeScanBuilder(conf: ZarrCubeSource.Conf)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  import ZarrCubeSource._

  private var xLo, yLo = Double.NegativeInfinity
  private var xHi, yHi = Double.PositiveInfinity
  private var tLo = Long.MinValue
  private var tHi = Long.MaxValue
  private var bandSel: Option[Set[String]] = None
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = Schema

  private def acceptOne(f: Filter): Boolean = f match {
    case GreaterThan("x", v) => toDouble(v).exists { d => xLo = math.max(xLo, d); true }
    case GreaterThanOrEqual("x", v) => toDouble(v).exists { d => xLo = math.max(xLo, d); true }
    case LessThan("x", v) => toDouble(v).exists { d => xHi = math.min(xHi, d); true }
    case LessThanOrEqual("x", v) => toDouble(v).exists { d => xHi = math.min(xHi, d); true }
    case EqualTo("x", v) => toDouble(v).exists { d => xLo = math.max(xLo, d); xHi = math.min(xHi, d); true }
    case GreaterThan("y", v) => toDouble(v).exists { d => yLo = math.max(yLo, d); true }
    case GreaterThanOrEqual("y", v) => toDouble(v).exists { d => yLo = math.max(yLo, d); true }
    case LessThan("y", v) => toDouble(v).exists { d => yHi = math.min(yHi, d); true }
    case LessThanOrEqual("y", v) => toDouble(v).exists { d => yHi = math.min(yHi, d); true }
    case EqualTo("y", v) => toDouble(v).exists { d => yLo = math.max(yLo, d); yHi = math.min(yHi, d); true }
    case GreaterThan("t", v) => toMicros(v).exists { m => tLo = math.max(tLo, m + 1); true }
    case GreaterThanOrEqual("t", v) => toMicros(v).exists { m => tLo = math.max(tLo, m); true }
    case LessThan("t", v) => toMicros(v).exists { m => tHi = math.min(tHi, m - 1); true }
    case LessThanOrEqual("t", v) => toMicros(v).exists { m => tHi = math.min(tHi, m); true }
    case EqualTo("t", v) => toMicros(v).exists { m => tLo = math.max(tLo, m); tHi = math.min(tHi, m); true }
    case EqualTo("bands", v: String) =>
      bandSel = Some(bandSel.getOrElse(Set(v)).intersect(Set(v))); true
    case In("bands", vs) if vs.forall(_.isInstanceOf[String]) =>
      val s = vs.map(_.asInstanceOf[String]).toSet
      bandSel = Some(bandSel.fold(s)(_.intersect(s))); true
    case IsNotNull("x" | "y" | "t" | "bands" | "value") => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter(acceptOne)
    filters // all residual: exactness is Spark's, pruning is ours
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TiffCubeScan(conf, required,
    (xLo, xHi), (yLo, yHi), (tLo, tHi), bandSel)
}

private[v2] class TiffCubeScan(conf: ZarrCubeSource.Conf,
    required: StructType,
    xB: (Double, Double), yB: (Double, Double), tB: (Long, Long),
    bandSel: Option[Set[String]])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Post-pruning row estimate (same role as the zarr scan's): planned
    * segments × their in-slice pixel footprint × samples per pixel.
    */
  override def estimateStatistics(): Statistics = {
    val rows =
      try planInputPartitions().map { p =>
        val tp = p.asInstanceOf[TiffSegmentPartition]
        val m = tp.meta
        val within =
          if (m.planar) tp.seg.index % (m.segments.size / m.samplesPerPixel)
          else tp.seg.index
        val r0 = (within / m.tilesAcross).toLong * m.tileHeight
        val c0 = (within % m.tilesAcross).toLong * m.tileWidth
        val rN = math.max(0L, math.min(r0 + m.tileHeight - 1,
          math.min(m.height - 1L, tp.sliceHi(0))) -
          math.max(r0, tp.sliceLo(0)) + 1)
        val cN = math.max(0L, math.min(c0 + m.tileWidth - 1,
          math.min(m.width - 1L, tp.sliceHi(1))) -
          math.max(c0, tp.sliceLo(1)) + 1)
        rN * cN * (if (m.planar) 1 else m.samplesPerPixel)
      }.sum
      catch { case scala.util.control.NonFatal(_) => -1L }
    new Statistics {
      override def numRows(): java.util.OptionalLong =
        if (rows < 0) java.util.OptionalLong.empty()
        else java.util.OptionalLong.of(rows)
      override def sizeInBytes(): java.util.OptionalLong =
        if (rows < 0) java.util.OptionalLong.empty()
        else java.util.OptionalLong.of(rows * 8L * (required.size + 1))
    }
  }
  override def description(): String = {
    val ext = Seq(
      if (xB._1.isNegInfinity && xB._2.isPosInfinity) None
      else Some(s"x∈[${xB._1},${xB._2}]"),
      if (yB._1.isNegInfinity && yB._2.isPosInfinity) None
      else Some(s"y∈[${yB._1},${yB._2}]"),
      if (tB._1 == Long.MinValue && tB._2 == Long.MaxValue) None
      else Some(s"t∈[${tB._1},${tB._2}]µs"),
      bandSel.map(s => s"bands∈{${s.mkString(",")}}")).flatten
    s"TiffCubeScan ${conf.path} PushedExtent: " +
      (if (ext.isEmpty) "(full)" else ext.mkString(", "))
  }

  private def axisRange(lo: Double, hi: Double, origin: Double,
      span: Double, nCells: Long): Option[(Long, Long)] = {
    if (lo.isNegInfinity && hi.isPosInfinity) return None
    if (span <= 0 || nCells <= 0) return None
    val step = span / nCells
    val a =
      if (lo.isNegInfinity) 0L
      else math.max(0L, math.ceil((lo - origin) / step).toLong - 1)
    val b =
      if (hi.isPosInfinity) nCells - 1
      else math.min(nCells - 1, math.floor((hi - origin) / step).toLong + 1)
    Some((a, b))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val meta = TiffReader.readMeta(conf.path)
    if (conf.datetimeMicros < tB._1 || conf.datetimeMicros > tB._2)
      return Array.empty // constant t outside the pushed window
    val multi = meta.samplesPerPixel > 1
    if (!multi && bandSel.exists(!_.contains(conf.band)))
      return Array.empty // single band, name mismatch
    val rr = axisRange(yB._1, yB._2, conf.south, conf.north - conf.south,
      meta.height.toLong)
    val cr = axisRange(xB._1, xB._2, conf.west, conf.east - conf.west,
      meta.width.toLong)
    var segs = TiffReader.planSegments(meta, rr, cr)
    // planar rasters: the band-major segment table lets a bands
    // predicate drop whole segments
    if (multi && meta.planar) bandSel.foreach { names =>
      val spp = meta.samplesPerPixel
      val perBand = meta.segments.size / spp
      val keep = (0 until spp)
        .filter(i => names.contains(s"${conf.band}_$i")).toSet
      segs = segs.filter(s => keep.contains(s.index / perBand))
    }
    if (multi && bandSel.exists(n =>
      (0 until meta.samplesPerPixel).forall(i => !n.contains(s"${conf.band}_$i"))))
      return Array.empty
    val lo = Array(rr.map(_._1).getOrElse(0L), cr.map(_._1).getOrElse(0L))
    val hi = Array(rr.map(_._2).getOrElse(meta.height - 1L),
      cr.map(_._2).getOrElse(meta.width - 1L))
    segs.map(s => TiffSegmentPartition(conf, meta, s,
      lo, hi, required.fieldNames): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TiffCubeReaderFactory
}

private[v2] final case class TiffSegmentPartition(conf: ZarrCubeSource.Conf,
    meta: TiffReader.TiffMeta, seg: TiffReader.Segment,
    sliceLo: Array[Long], sliceHi: Array[Long],
    columns: Array[String]) extends InputPartition

private[v2] object TiffCubeReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new TiffSegmentReader(p.asInstanceOf[TiffSegmentPartition])
}

/** Decodes ONE strip/tile (seeking only its bytes) and walks its samples,
  * clipping edge padding and the pushed row/col bounds — the same pixel
  * loop as `loadArrayBands`, emitting cube-coordinate rows directly.
  */
private[v2] class TiffSegmentReader(p: TiffSegmentPartition)
    extends PartitionReader[InternalRow] {
  private val m = p.meta
  private val vals: Array[Double] = {
    val raf = new java.io.RandomAccessFile(p.conf.path, "r")
    try {
      val raw = new Array[Byte](p.seg.byteCount.toInt)
      raf.seek(p.seg.offset)
      raf.readFully(raw)
      TiffReader.unpack(raw, m)
    } finally raf.close()
  }
  private val spp = m.samplesPerPixel
  private val segsPerBand = if (m.planar) m.segments.size / spp else m.segments.size
  private val (planarBand, within) =
    if (m.planar) (p.seg.index / segsPerBand, p.seg.index % segsPerBand)
    else (0, p.seg.index)
  private val perPixel = if (m.planar) 1 else spp
  private val baseR = (within / m.tilesAcross).toLong * m.tileHeight
  private val baseC = (within % m.tilesAcross).toLong * m.tileWidth
  private val stepX = (p.conf.east - p.conf.west) / m.width
  private val stepY = (p.conf.north - p.conf.south) / m.height
  private var flat = -1
  private var r, c = 0L
  private var band = 0
  // opcodes + band strings precomputed; row object reused (see
  // ZarrChunkReader — the consumer copies before the next advance)
  private val ops: Array[Int] = p.columns.map {
    case "x" => 0
    case "y" => 1
    case "t" => 2
    case "bands" => 3
    case "value" => 4
    case other => throw new IllegalArgumentException(
      s"TiffCubeSource: unknown column $other")
  }
  private val bandStrs: Array[UTF8String] =
    if (spp > 1) Array.tabulate(spp)(i =>
      UTF8String.fromString(s"${p.conf.band}_$i"))
    else Array(UTF8String.fromString(p.conf.band))
  private val row =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      p.columns.length)

  override def next(): Boolean = {
    var ok = false
    while (!ok && flat + 1 < vals.length) {
      flat += 1
      val pixel = flat / perPixel
      band = if (m.planar) planarBand else flat % spp
      r = baseR + pixel / m.tileWidth
      c = baseC + pixel % m.tileWidth
      ok = r < m.height && c < m.width &&
        r >= p.sliceLo(0) && r <= p.sliceHi(0) &&
        c >= p.sliceLo(1) && c <= p.sliceHi(1)
    }
    ok
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < ops.length) {
      ops(i) match {
        case 0 => row.update(i, p.conf.west + c * stepX)
        case 1 => row.update(i, p.conf.south + r * stepY)
        case 2 => row.update(i, p.conf.datetimeMicros)
        case 3 => row.update(i, if (spp > 1) bandStrs(band) else bandStrs(0))
        case _ => row.update(i, vals(flat))
      }
      i += 1
    }
    row
  }

  override def close(): Unit = ()
}
