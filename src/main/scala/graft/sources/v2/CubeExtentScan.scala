package graft.sources.v2

import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType

/** The pushdown translation shared by the cube-coordinate DSv2 facades
  * ([[ZarrCubeSource]] / [[TiffCubeSource]]): pushed x/y/t/bands
  * predicates accumulate into inclusive, conservative extent bounds.
  * ONE definition on purpose — the strict-bound ±1 µs t arithmetic and
  * the band-set intersection are exactly the kind of subtlety that
  * silently diverges when hand-copied per source, leaving the two
  * facades pruning differently for the same predicate.
  *
  * Bounds are INCLUSIVE and conservative (strict comparisons widen to
  * non-strict where they cannot be exact): pruning may keep an extra
  * boundary chunk/segment, never drop a matching one — every filter
  * stays residual, so Spark re-applies exactness either way.
  */
private[v2] trait CubeExtentScanBuilder
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  import ZarrCubeSource.{toDouble, toMicros, Schema}

  protected var xLo, yLo: Double = Double.NegativeInfinity
  protected var xHi, yHi: Double = Double.PositiveInfinity
  protected var tLo: Long = Long.MinValue
  protected var tHi: Long = Long.MaxValue
  protected var bandSel: Option[Set[String]] = None
  protected var accepted: Array[Filter] = Array.empty
  protected var required: StructType = Schema

  /** Construct the concrete scan from the accumulated pushdown state. */
  protected def buildScan(): Scan

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
    // micros are integral, so strict bounds tighten EXACTLY by one µs —
    // a half-open [start, end) window excludes the end-label's chunk
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
    filters // ALL filters stay residual: pruning is advisory, exactness is Spark's
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = buildScan()
}

/** Geometry and statistics helpers shared by the two cube scans. */
private[v2] object CubeScanUtil {

  /** Coordinate bound → inclusive cell-index range. Cells are POINT
    * samples at `origin + i·step`, so the exact translation is
    * ceil/floor; one guard cell each way absorbs float edges, and the
    * residual filter trims the overshoot.
    */
  def axisRange(lo: Double, hi: Double, origin: Double,
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
    Some((a, b)) // a > b = empty: the planner plans nothing
  }

  /** Post-pruning statistics from a planned row estimate (−1 = unknown). */
  def statsOf(rows: Long, nFields: Int): Statistics = new Statistics {
    override def numRows(): java.util.OptionalLong =
      if (rows < 0) java.util.OptionalLong.empty()
      else java.util.OptionalLong.of(rows)
    override def sizeInBytes(): java.util.OptionalLong =
      if (rows < 0) java.util.OptionalLong.empty()
      else java.util.OptionalLong.of(rows * 8L * (nFields + 1))
  }

  /** Human-readable pushed-extent summary for `description()` — what the
    * plan-audit specs grep for in `.explain` output.
    */
  def describeExtent(xB: (Double, Double), yB: (Double, Double),
      tB: (Long, Long), bandSel: Option[Set[String]]): String = {
    val ext = Seq(
      if (xB._1.isNegInfinity && xB._2.isPosInfinity) None
      else Some(s"x∈[${xB._1},${xB._2}]"),
      if (yB._1.isNegInfinity && yB._2.isPosInfinity) None
      else Some(s"y∈[${yB._1},${yB._2}]"),
      if (tB._1 == Long.MinValue && tB._2 == Long.MaxValue) None
      else Some(s"t∈[${tB._1},${tB._2}]µs"),
      bandSel.map(s => s"bands∈{${s.mkString(",")}}")).flatten
    "PushedExtent: " + (if (ext.isEmpty) "(full)" else ext.mkString(", "))
  }
}
