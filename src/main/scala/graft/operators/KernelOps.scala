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
  /** Kernel offset triples (dx, dy, w) with zero weights dropped. */
  private def kernelOffsets(kernel: Seq[Seq[Double]]): Seq[(Int, Int, Double)] = {
    val kh = kernel.length; val kw = kernel.head.length
    require(kh % 2 == 1 && kw % 2 == 1, "kernel dims must be odd")
    for {
      (row, j) <- kernel.zipWithIndex
      (w, i) <- row.zipWithIndex
      if w != 0.0
    } yield (i - kw / 2, j - kh / 2, w)
  }

  /** Border remap of an out-of-grid coordinate into [lo, hi] — pure Column
    * arithmetic shared by the join and tiled physical forms.
    */
  private def remapCol(border: BorderMode)(c: Column, lo: Long, hi: Long): Column = {
    val n = hi - lo + 1
    border match {
      case Constant(_) => c // out-of-grid neighbors handled by the caller
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

  def applyKernelBorder(cube: DataCube, kernel: Seq[Seq[Double]],
      border: BorderMode, factor: Double = 1.0,
      xRange: (Long, Long), yRange: (Long, Long)): DataCube = {
    val sd = cube.meta.spatialDims
    require(sd.size >= 2, "DimensionNotAvailable: need x and y")
    val (xd, yd) = (sd.head, sd(1))
    val others = cube.meta.dimNames.filterNot(d => d == xd || d == yd)
    val spark = cube.df.sparkSession
    import spark.implicits._

    val k = kernelOffsets(kernel).toDF("_dx", "_dy", "_w")
    def remap(c: Column, lo: Long, hi: Long): Column = remapCol(border)(c, lo, hi)

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

  /** apply_kernel as a TILE-PARTITIONED STENCIL — the dense-raster scale
    * path. The join forms above fan the fact table out once per nonzero
    * kernel weight (a 15×15 kernel = 225× row amplification through the
    * shuffle); here every cell is shuffled ~once and the kernel runs as
    * per-tile map lookups:
    *
    *   1. '''Halo exchange, arithmetically.''' Each cell computes the ≤4
    *      (2 per axis) tiles whose halo covers it — no self-join; row
    *      amplification is (T+2h)²/T² ≈ 1 + 4h/T (≈ 3% for h=2, T=256).
    *      `Wrap` additionally mirrors cells within h of one global edge to
    *      virtual coordinates beyond the opposite edge, so periodic lookups
    *      stay tile-local.
    *   2. '''One shuffle.''' groupBy (other dims, tile) collects the tile's
    *      cells — memory is one (T+2h)² tile, never a raster.
    *   3. '''Stencil as Column HOFs.''' A per-tile lookup map (packed-long
    *      key) + one `transform` over interior cells unrolls the kernel into
    *      codegen-able map probes — no UDF, no custom plan node.
    *
    * Semantics are IDENTICAL to [[applyKernelBorder]] (spec'd cell-for-cell,
    * all five modes): missing in-grid neighbors contribute the fill under
    * `Constant`, are skipped otherwise, and a cell with zero found neighbors
    * is absent from the output under the non-constant modes.
    */
  def applyKernelTiled(cube: DataCube, kernel: Seq[Seq[Double]],
      border: BorderMode, factor: Double = 1.0,
      xRange: (Long, Long), yRange: (Long, Long),
      tileSize: Int = 256): DataCube = {
    val sd = cube.meta.spatialDims
    require(sd.size >= 2, "DimensionNotAvailable: need x and y")
    val (xd, yd) = (sd.head, sd(1))
    val others = cube.meta.dimNames.filterNot(d => d == xd || d == yd)

    val offsets = kernelOffsets(kernel)
    val hx = kernel.head.length / 2; val hy = kernel.length / 2
    require(2 * hx < tileSize && 2 * hy < tileSize,
      s"kernel halo ($hx,$hy) must be < tileSize/2=$tileSize/2")
    val (xlo, xhi) = xRange; val (ylo, yhi) = yRange
    val nX = xhi - xlo + 1; val nY = yhi - ylo + 1
    require(Seq(xlo, xhi, ylo, yhi).forall(c => math.abs(c) < (1L << 30)),
      "tiled stencil packs (x,y) into one long: coords must fit 31 bits")
    if (border == Wrap)
      require(hx < nX && hy < nY,
        "Wrap tiling mirrors one period: kernel reach must be < grid extent")
    val T = tileSize.toLong
    val v = cube.meta.valueCol

    def fdiv(c: Column): Column = ((c - pmod(c, lit(T))) / T).cast("long")
    def key(cx: Column, cy: Column): Column = cx * (1L << 32) + cy

    // wrap halos: a cell within h of one global edge reappears one period
    // beyond the opposite edge (virtual coords are always outside [lo,hi],
    // so they can never masquerade as interior cells)
    def virt(c: Column, lo: Long, hi: Long, n: Long, h: Int): Column = {
      val base = array(c)
      if (border != Wrap || h == 0) base
      else concat(base,
        when(c - lo < h, array(c + n)).otherwise(array().cast("array<long>")),
        when(lit(hi) - c < h, array(c - n)).otherwise(array().cast("array<long>")))
    }

    val halo = cube.df
      .withColumn("_vx", explode(virt(col(xd).cast("long"), xlo, xhi, nX, hx)))
      .withColumn("_vy", explode(virt(col(yd).cast("long"), ylo, yhi, nY, hy)))
      // the (≤2 per axis) tiles whose [tT-h, (t+1)T-1+h] halo covers the cell
      .withColumn("_tx", explode(array_distinct(
        array(fdiv(col("_vx") - hx), fdiv(col("_vx") + hx)))))
      .withColumn("_ty", explode(array_distinct(
        array(fdiv(col("_vy") - hy), fdiv(col("_vy") + hy)))))
      .filter(col("_tx").between(Math.floorDiv(xlo, T), Math.floorDiv(xhi, T)) &&
        col("_ty").between(Math.floorDiv(ylo, T), Math.floorDiv(yhi, T)))

    val tiles = halo
      .groupBy((others.map(col) :+ col("_tx") :+ col("_ty")): _*)
      .agg(collect_list(struct(col("_vx").as("cx"), col("_vy").as("cy"),
        col(v).cast("double").as("cv"))).as("_cells"))
      .withColumn("_m", map_from_entries(transform(col("_cells"),
        c => struct(key(c.getField("cx"), c.getField("cy")), c.getField("cv")))))

    val fillVal = border match { case Constant(f) => f; case _ => 0.0 }
    val emitAll = border match { case Constant(_) => true; case _ => false }
    def lookup(cx: Column, cy: Column, dx: Int, dy: Int): Column = {
      val (lx0, ly0) = (cx - dx, cy - dy)
      val (lx, ly) = border match {
        // Constant: out-of-grid == missing == fill; Wrap: virtual copies
        // make periodic neighbors resolvable without remap
        case Constant(_) | Wrap => (lx0, ly0)
        case _ => (remapCol(border)(lx0, xlo, xhi), remapCol(border)(ly0, ylo, yhi))
      }
      element_at(col("_m"), key(lx, ly)) // null when absent
    }

    val interior = filter(col("_cells"), c =>
      c.getField("cx") >= greatest(lit(xlo), col("_tx") * T) &&
        c.getField("cx") <= least(lit(xhi), col("_tx") * T + (T - 1)) &&
        c.getField("cy") >= greatest(lit(ylo), col("_ty") * T) &&
        c.getField("cy") <= least(lit(yhi), col("_ty") * T + (T - 1)))
    val outCells = transform(interior, c => {
      val lkups = offsets.map { case (dx, dy, w) =>
        (w, lookup(c.getField("cx"), c.getField("cy"), dx, dy))
      }
      val sumV = lkups.map { case (w, l) => coalesce(l, lit(fillVal)) * w }
        .reduce(_ + _) * factor
      val found = lkups.map { case (_, l) => when(l.isNotNull, 1).otherwise(0) }
        .reduce(_ + _)
      struct(c.getField("cx").as("ox"), c.getField("cy").as("oy"),
        sumV.as("ov"), (found > 0).as("emit"))
    })

    val out = tiles.select((others.map(col) :+ explode(outCells).as("_o")): _*)
      .filter(if (emitAll) lit(true) else col("_o").getField("emit"))
      .select((others.map(col) :+
        col("_o").getField("ox").as(xd) :+
        col("_o").getField("oy").as(yd) :+
        col("_o").getField("ov").as(v)): _*)
    cube.copy(df = out)
  }
}
