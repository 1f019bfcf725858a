package graft.operators

import graft.core._
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
}
