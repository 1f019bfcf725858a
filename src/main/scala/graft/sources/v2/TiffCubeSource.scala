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
    extends CubeExtentScanBuilder {
  override protected def buildScan(): Scan = new TiffCubeScan(conf, required,
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
      try plannedPartitions.map { p =>
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
    CubeScanUtil.statsOf(rows, required.size)
  }
  override def description(): String =
    s"TiffCubeScan ${conf.path} " + CubeScanUtil.describeExtent(xB, yB, tB, bandSel)


  override def planInputPartitions(): Array[InputPartition] = plannedPartitions

  /** Planned once per Scan — same statistics-probe caching rationale as
    * [[ZarrCubeScan]]: estimateStatistics and execution share one plan,
    * one metadata read, one segment walk.
    */
  private lazy val plannedPartitions: Array[InputPartition] = computePartitions()

  private def computePartitions(): Array[InputPartition] = {
    val meta = TiffReader.readMeta(conf.path)
    if (conf.datetimeMicros < tB._1 || conf.datetimeMicros > tB._2)
      return Array.empty // constant t outside the pushed window
    val multi = meta.samplesPerPixel > 1
    if (!multi && bandSel.exists(!_.contains(conf.band)))
      return Array.empty // single band, name mismatch
    val rr = CubeScanUtil.axisRange(yB._1, yB._2, conf.south, conf.north - conf.south,
      meta.height.toLong)
    val cr = CubeScanUtil.axisRange(xB._1, xB._2, conf.west, conf.east - conf.west,
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
