package graft.tools

import graft.core.DataCube
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for profiling the tiled stencil at dense-grid scale —
  * times each stage of the applyKernelTiled plan separately. Not part of
  * the library surface.
  */
object RasterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.SparkTuning.tune(spark)
    val side = 500L; val nT = 4L
    val path = "/tmp/graft_probe_raster"
    spark.range(side * side * nT)
      .select(
        (col("id") % side).as("x"),
        (expr(s"id div $side") % side).as("y"),
        timestamp_micros(lit(1704067200000000L) +
          expr(s"id div ${side * side}") * 86400000000L).as("t"),
        (pmod(col("id") * 2654435761L, lit(10000L)).cast("double") / 10.0)
          .as("value"))
      .repartition(32)
      .write.mode("overwrite").parquet(path)
    val grid = spark.read.parquet(path)
    def cube = DataCube.fromTable(grid, Seq("x", "y", "t"), "value")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val k = Seq.fill(5)(Seq.fill(5)(1.0 / 25))
    // stage 1: halo explode only (reconstructed shape)
    val T = 256L; val hx = 2; val hy = 2
    def fdiv(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(T))) / T).cast("long")
    val halo = grid
      .withColumn("_vx", col("x").cast("long"))
      .withColumn("_vy", col("y").cast("long"))
      .withColumn("_tx", explode(array_distinct(
        array(fdiv(col("_vx") - hx), fdiv(col("_vx") + hx)))))
      .withColumn("_ty", explode(array_distinct(
        array(fdiv(col("_vy") - hy), fdiv(col("_vy") + hy)))))
      .filter(col("_tx").between(0, 1) && col("_ty").between(0, 1))
    time("halo explode")(force(halo))
    val tiles = halo
      .groupBy(col("t"), col("_tx"), col("_ty"))
      .agg(collect_list(struct(col("_vx").as("cx"), col("_vy").as("cy"),
        col("value").cast("double").as("cv"))).as("_cells"))
    time("halo + collect_list")(force(tiles))
    val proj = tiles.select(col("t"), col("_tx"), col("_ty"),
      transform(col("_cells"), c => c.getField("cx")).as("xs"),
      transform(col("_cells"), c => c.getField("cy")).as("ys"),
      transform(col("_cells"), c => coalesce(c.getField("cv"), lit(0.0))).as("vs"),
      transform(col("_cells"), c => c.getField("cv").isNotNull).as("ps"))
    time("+ transform projections")(force(proj))
    time("full applyKernelTiled") {
      force(graft.operators.KernelOps.applyKernelTiled(cube, k,
        graft.operators.KernelOps.Replicate,
        xRange = (0L, side - 1), yRange = (0L, side - 1)).df)
    }
    spark.stop()
  }
}
