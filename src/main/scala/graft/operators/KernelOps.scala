package graft.operators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** apply_kernel — 2-D spatial convolution over the long-form cube
  * (reference: openeo_processes_dask/process_implementations/cubes/apply.py:131-182,
  * which wraps scipy.ndimage.convolve).
  *
  * Spark shape: explode the (tiny) kernel into offset rows, broadcast it,
  * join each cell to its shifted neighbors, and aggregate back per cell —
  * the fact side is shuffled once on the grid key for the final groupBy.
  * Missing neighbors contribute 0 ("constant" border mode); `factor` scales
  * the result (reference: apply.py:160-182).
  *
  * At scale this is the operator to tile-partition: pre-partitioning the df
  * by coarse (x,y) tiles makes the neighbor join co-located; AQE handles the
  * residual skew. For kernels over dense rasters, a mapPartitions stencil on
  * tiled layout would avoid the join entirely — kept relational here because
  * kernel size ≪ partition size in every reference use.
  */
object KernelOps {

  /** Border handling for [[applyKernelBorder]] (reference: apply.py:138-152
    * wraps scipy.ndimage.convolve's modes; names follow the openeo spec).
    */
  sealed trait BorderMode
  case object Replicate extends BorderMode     // aaaa|abcd|dddd
  case object Reflect extends BorderMode       // dcba|abcd|dcba
  case object ReflectPixel extends BorderMode  // dcb|abcd|cba  (scipy "mirror")
  case object Wrap extends BorderMode          // abcd|abcd|abcd
  final case class Constant(value: Double) extends BorderMode

  def applyKernel(cube: DataCube, kernel: Seq[Seq[Double]],
      factor: Double = 1.0): DataCube = {
    val sd = cube.meta.spatialDims
    require(sd.size >= 2, "DimensionNotAvailable: need x and y")
    val (xd, yd) = (sd.head, sd(1))
    val others = cube.meta.dimNames.filterNot(d => d == xd || d == yd)
    val spark = cube.df.sparkSession
    import spark.implicits._

    val kh = kernel.length
    val kw = kernel.head.length
    require(kh % 2 == 1 && kw % 2 == 1, "kernel dims must be odd")
    val offsets = for {
      (row, j) <- kernel.zipWithIndex
      (w, i) <- row.zipWithIndex
      if w != 0.0
    } yield (i - kw / 2, j - kh / 2, w)
    val k = offsets.toDF("_dx", "_dy", "_w")

    val v = cube.meta.valueCol
    // Convolution, not cross-correlation: scipy.ndimage.convolve flips the
    // kernel (reference: apply.py:160-182), so the source cell at offset
    // (dx, dy) contributes to (x + dx, y + dy) — asymmetric kernels would
    // mirror under the (x - dx) correlation form.
    val contrib = cube.df.join(broadcast(k))
      .select((others.map(col) :+
        (col(xd) + col("_dx")).as(xd) :+
        (col(yd) + col("_dy")).as(yd) :+
        (col(v) * col("_w")).as("_c")): _*)
    // keep only cells that exist in the input grid (convolve output grid)
    val grid = cube.df.select((others.map(col) :+ col(xd) :+ col(yd)): _*).distinct()
    val out = contrib.join(grid, others :+ xd :+ yd, "left_semi")
      .groupBy((others :+ xd :+ yd).map(col): _*)
      .agg((sum(col("_c")) * factor).as(v))
    cube.copy(df = out)
  }

  /** apply_kernel with explicit border semantics on a dense integer grid
    * spanning [xlo..xhi] × [ylo..yhi] (reference: apply.py:131-182 —
    * scipy.ndimage.convolve border modes). Target-centric neighbor join:
    * each output cell looks up its kernel neighbors with out-of-grid
    * coordinates REMAPPED by the border mode (pure Column arithmetic on the
    * join key), or, for `Constant`, left-joined and coalesced to the fill
    * value. The grid extent is passed by the caller — it is dimension
    * metadata, not something to rescan the fact table for.
    */
  def applyKernelBorder(cube: DataCube, kernel: Seq[Seq[Double]],
      border: BorderMode, factor: Double = 1.0,
      xRange: (Long, Long), yRange: (Long, Long)): DataCube = {
    val sd = cube.meta.spatialDims
    require(sd.size >= 2, "DimensionNotAvailable: need x and y")
    val (xd, yd) = (sd.head, sd(1))
    val others = cube.meta.dimNames.filterNot(d => d == xd || d == yd)
    val spark = cube.df.sparkSession
    import spark.implicits._

    val kh = kernel.length; val kw = kernel.head.length
    require(kh % 2 == 1 && kw % 2 == 1, "kernel dims must be odd")
    val offsets = for {
      (row, j) <- kernel.zipWithIndex
      (w, i) <- row.zipWithIndex
      if w != 0.0
    } yield (i - kw / 2, j - kh / 2, w)
    val k = offsets.toDF("_dx", "_dy", "_w")

    def remap(c: Column, lo: Long, hi: Long): Column = {
      val n = hi - lo + 1
      border match {
        case Constant(_) => c // out-of-grid neighbors handled by the left join
        case _ if n == 1 => lit(lo) // degenerate single-line axis
        case Replicate => least(greatest(c, lit(lo)), lit(hi))
        case Wrap => lit(lo) + pmod(c - lo, lit(n))
        case Reflect =>
          val m = pmod(c - lo, lit(2 * n))
          lit(lo) + when(m < n, m).otherwise(lit(2 * n - 1) - m)
        case ReflectPixel =>
          val m = pmod(c - lo, lit(2 * n - 2))
          lit(lo) + when(m < n, m).otherwise(lit(2 * n - 2) - m)
      }
    }

    val v = cube.meta.valueCol
    // convolution: out(X,Y) folds in(X-dx, Y-dy) · w(dx,dy)
    val lookups = cube.df.select((others.map(col) :+ col(xd) :+ col(yd)): _*)
      .join(broadcast(k))
      .withColumn("_nx", remap(col(xd) - col("_dx"), xRange._1, xRange._2))
      .withColumn("_ny", remap(col(yd) - col("_dy"), yRange._1, yRange._2))
    val src = cube.df.select((others.map(col) :+
      col(xd).as("_nx") :+ col(yd).as("_ny") :+ col(v).as("_nv")): _*)
    val joined = border match {
      case Constant(fill) =>
        lookups.join(src, others :+ "_nx" :+ "_ny", "left_outer")
          .withColumn("_nv", coalesce(col("_nv"), lit(fill)))
      case _ => lookups.join(src, others :+ "_nx" :+ "_ny")
    }
    val out = joined
      .groupBy((others :+ xd :+ yd).map(col): _*)
      .agg((sum(col("_w") * col("_nv")) * factor).as(v))
    cube.copy(df = out)
  }
}
