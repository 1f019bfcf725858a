package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure extent pushdown on a store big enough for pruning to matter:
  * writes (once) an 8192×8192 float64 zarr store under 256×256 chunks
  * (1024 chunk files, 512 MB raw), mounts it through `load_stac` (the
  * DataSourceV2 facade), and times a full aggregate against a
  * quarter-bbox and a single-chunk extent applied as FILTERS AFTER the
  * load — the 100 TB question: does a small query over a huge archive
  * read only its own bytes when the extent arrives via the optimizer?
  *
  * Prints one line per case: planned partitions (= chunk files touched)
  * and wall seconds. Scale evidence recorded in SCALE.md.
  *
  *   sbt "runMain graft.tools.ExtentProbe [/tmp/graft_extent_probe]"
  */
object ExtentProbe {
  private val N = 8192
  private val C = 256

  def ensureStore(dir: String): Unit = {
    val d = new java.io.File(dir)
    if (new java.io.File(d, ".zarray").isFile) return
    d.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(d, ".zarray").toPath,
      s"""{"zarr_format":2,"shape":[$N,$N],"chunks":[$C,$C],
         |"dtype":"<f8","compressor":null,"fill_value":0.0,
         |"filters":null,"order":"C"}""".stripMargin)
    // deterministic v(r,c) = (r*31 + c*17) % 1000; one buffer reused
    val buf = java.nio.ByteBuffer.allocate(C * C * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (ci <- 0 until N / C; cj <- 0 until N / C) {
      buf.clear()
      var r = 0
      while (r < C) {
        var c = 0
        while (c < C) {
          buf.putDouble(((ci * C + r) * 31L + (cj * C + c) * 17L) % 1000)
          c += 1
        }
        r += 1
      }
      java.nio.file.Files.write(
        new java.io.File(d, s"$ci.$cj").toPath, buf.array())
    }
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft_extent_probe")
    val store = s"$root/store"
    ensureStore(store)
    val item = s"$root/item.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(item),
      s"""{"type":"Feature","stac_version":"1.0.0","id":"probe",
         |"bbox":[0.0,0.0,$N.0,$N.0],
         |"properties":{"datetime":"2024-01-01T00:00:00Z"},
         |"assets":{"b":{"href":"file://$store",
         |  "type":"application/vnd+zarr"}}}""".stripMargin)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("ExtentProbe").getOrCreate()
    val assets = graft.sources.StacLoader.parseItem(
      java.nio.file.Files.readString(java.nio.file.Paths.get(item)))
    def run(label: String,
        cut: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      // cold cube each time: the extent is a post-load filter, never a
      // loader argument — exactly the graph shape users write
      val cube = graft.sources.StacLoader.loadCube(spark, assets)
      val df = cut(cube.df).agg(sum("value").as("s"), count(lit(1)).as("n"))
      val parts = cut(graft.sources.StacLoader.loadCube(spark, assets).df)
        .rdd.getNumPartitions
      val t0 = System.nanoTime()
      val row = df.collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"EXTENTPROBE $label%-14s partitions=$parts%5d rows=${row.getLong(1)}%10d wall=$sec%7.2f s")
    }
    for (rep <- 1 to 2) {
      println(s"-- repetition $rep (second = warm JVM)")
      run("full", identity)
      run("quarter", df => df.filter(col("x") < N / 2.0 - 0.5 && col("y") < N / 2.0 - 0.5))
      run("one-chunk", df => df.filter(
        col("x").between(1030.0, 1270.0) && col("y").between(1030.0, 1270.0)))
    }
    spark.stop()
  }
}
