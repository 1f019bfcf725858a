package graft.sources

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pure-JVM zarr v2 reader — the real pixel path for `load_stac`'s zarr
  * assets (reference: cubes/load.py:245-304 opens zarr items through
  * xarray; the format itself is public: a directory store holding a
  * `.zarray` JSON descriptor plus one file per chunk, C-order binary,
  * optionally zlib-compressed — both decodable with nothing but the JDK).
  *
  * Distribution shape: the driver reads ONLY the kilobyte `.zarray`
  * metadata and lists chunk keys; each executor task then reads, inflates
  * and unpacks its own chunk files — the same per-chunk fan-out a COG
  * asset table gets, so a thousand-chunk store spreads over the cluster
  * with no driver data path.
  *
  * Supported: dtypes `<f8 <f4 <i8 <i4 <i2 |i1 |u1 >f8 >f4 >i8 >i4 >i2`,
  * compressor `null` or `{"id":"zlib"}`, order C, any rank; edge chunks
  * are padded per the spec and clipped against `shape` on read. Blosc
  * compression needs a native lib this environment lacks → clear error.
  */
object ZarrReader {

  final case class ZarrMeta(shape: Seq[Int], chunks: Seq[Int], dtype: String,
      compressor: Option[String], order: String, fillValue: Option[Double],
      separator: String = ".")

  def readMeta(dir: String): ZarrMeta = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, ".zarray")), "UTF-8")
    val root = JsonMethods.parse(text)
    def ints(field: String): Seq[Int] = (root \ field) match {
      case JArray(xs) => xs.map {
        case JInt(i) => i.toInt
        case v => throw new IllegalArgumentException(s"bad $field entry $v")
      }
      case v => throw new IllegalArgumentException(s"bad $field: $v")
    }
    val dtype = (root \ "dtype") match {
      case JString(s) => s
      case v => throw new IllegalArgumentException(s"bad dtype: $v")
    }
    val comp = (root \ "compressor") match {
      case JNull | JNothing => None
      case o => (o \ "id") match {
        case JString(id) => Some(id)
        case _ => throw new IllegalArgumentException(s"bad compressor: $o")
      }
    }
    val order = (root \ "order") match {
      case JString(s) => s
      case _ => "C"
    }
    val fill = (root \ "fill_value") match {
      case JInt(i) => Some(i.toDouble)
      case JDouble(d) => Some(d)
      case JString("NaN") => Some(Double.NaN)
      case _ => None
    }
    // v2.8+ optional key: "." (flat, default) or "/" (nested chunk dirs)
    val sep = (root \ "dimension_separator") match {
      case JString(s) => s
      case _ => "."
    }
    require(order == "C", s"ZarrUnsupported: order $order (C only)")
    require(sep == "." || sep == "/",
      s"ZarrUnsupported: dimension_separator '$sep'")
    comp.foreach(c => require(c == "zlib",
      s"ZarrUnsupported: compressor $c (null or zlib only — blosc needs a native lib)"))
    ZarrMeta(ints("shape"), ints("chunks"), dtype, comp, order, fill, sep)
  }

  /** Chunk keys present in the store: flat file names like "0.2.1" for the
    * "." separator, or nested numeric directories ("0/2/1") for the "/"
    * separator. Driver-side listing only — names, not bytes.
    */
  def chunkKeys(dir: String, separator: String = "."): Seq[Seq[Int]] = {
    val d = new java.io.File(dir)
    if (separator == ".")
      d.listFiles().toSeq.map(_.getName)
        .filter(_.matches("[0-9]+(\\.[0-9]+)*"))
        .map(_.split('.').toSeq.map(_.toInt))
    else {
      def walk(f: java.io.File, prefix: Seq[Int]): Seq[Seq[Int]] =
        f.listFiles().toSeq.filter(_.getName.matches("[0-9]+")).flatMap { c =>
          if (c.isDirectory) walk(c, prefix :+ c.getName.toInt)
          else Seq(prefix :+ c.getName.toInt)
        }
      walk(d, Nil)
    }
  }

  private def bytesPer(dtype: String): Int = dtype.substring(2).toInt

  /** Decode one chunk's raw (already-inflated) bytes into a C-order double
    * array — executor-side, allocation-light.
    */
  def unpack(bytes: Array[Byte], dtype: String): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.order(if (dtype.startsWith(">")) java.nio.ByteOrder.BIG_ENDIAN
      else java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bytes.length / bytesPer(dtype)
    val out = new Array[Double](n)
    var i = 0
    dtype.substring(1) match {
      case "f8" => while (i < n) { out(i) = bb.getDouble(i * 8); i += 1 }
      case "f4" => while (i < n) { out(i) = bb.getFloat(i * 4).toDouble; i += 1 }
      case "i8" => while (i < n) { out(i) = bb.getLong(i * 8).toDouble; i += 1 }
      case "i4" => while (i < n) { out(i) = bb.getInt(i * 4).toDouble; i += 1 }
      case "i2" => while (i < n) { out(i) = bb.getShort(i * 2).toDouble; i += 1 }
      case "i1" => while (i < n) { out(i) = bytes(i).toDouble; i += 1 }
      case "u1" => while (i < n) { out(i) = (bytes(i) & 0xff).toDouble; i += 1 }
      case other => throw new IllegalArgumentException(s"ZarrUnsupported: dtype $other")
    }
    out
  }

  def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val k = inf.inflate(buf)
      if (k == 0 && inf.needsInput())
        throw new IllegalArgumentException("ZarrCorrupt: truncated zlib chunk")
      out.write(buf, 0, k)
    }
    inf.end()
    out.toByteArray
  }

  /** Load a zarr array as a long-form DataFrame: one row per in-bounds
    * element, columns `dimNames :+ "value"`. The chunk-key table is the
    * unit of parallelism; every task decodes its own chunk files.
    *
    * Chunks ABSENT from the store read as `fill_value` — zarr v2 semantics
    * (writers omit all-fill chunks); the fill cells are generated on the
    * executors with no file I/O. A store with missing chunks but no
    * declared fill_value is corrupt and errors clearly.
    */
  def loadArray(spark: SparkSession, dir: String,
      dimNames: Seq[String]): DataFrame = {
    val meta = readMeta(dir)
    require(dimNames.size == meta.shape.size,
      s"need ${meta.shape.size} dim names, got ${dimNames.size}")
    val gridDims = meta.shape.zip(meta.chunks).map { case (s, c) => (s + c - 1) / c }
    val allKeys = gridDims.foldLeft(Seq(Seq.empty[Int]))((acc, n) =>
      acc.flatMap(p => (0 until n).map(p :+ _)))
    val present = chunkKeys(dir, meta.separator).toSet
    require(allKeys.forall(present.contains) || meta.fillValue.isDefined,
      "ZarrCorrupt: store has missing chunks but no fill_value")
    // "/"-separated keys resolve as nested paths on the executors unchanged
    val keys = allKeys.map(k => (k.mkString(meta.separator), present.contains(k)))
    val bMeta = spark.sparkContext.broadcast(meta)
    val bDir = spark.sparkContext.broadcast(dir)
    import spark.implicits._
    val rows = spark.createDataset(keys)
      .repartition(math.min(keys.size, 64))
      .mapPartitions { it =>
        val m = bMeta.value
        val base = bDir.value
        it.flatMap { case (key, isPresent) =>
          val gridIdx = key.split(m.separator.head).map(_.toInt)
          val vals =
            if (isPresent) {
              val raw = java.nio.file.Files.readAllBytes(
                java.nio.file.Paths.get(base, key))
              val bytes = if (m.compressor.contains("zlib")) inflate(raw) else raw
              unpack(bytes, m.dtype)
            } else Array.fill(m.chunks.product)(m.fillValue.get)
          val rank = m.shape.size
          val chunkShape = m.chunks.toArray
          // C-order walk of the chunk, clipping edge padding against shape
          val strides = new Array[Int](rank)
          strides(rank - 1) = 1
          var d = rank - 2
          while (d >= 0) { strides(d) = strides(d + 1) * chunkShape(d + 1); d -= 1 }
          (0 until vals.length).iterator.flatMap { flat =>
            val coords = new Array[Long](rank)
            var ok = true
            var r = 0
            while (r < rank) {
              val local = (flat / strides(r)) % chunkShape(r)
              val global = gridIdx(r).toLong * chunkShape(r) + local
              if (global >= m.shape(r)) ok = false
              coords(r) = global
              r += 1
            }
            if (ok) Some((coords.toSeq, vals(flat))) else None
          }
        }
      }
      .toDF("_coords", "value")
    dimNames.zipWithIndex.foldLeft(rows) { case (df, (name, i)) =>
      df.withColumn(name, element_at(col("_coords"), i + 1))
    }.select((dimNames.map(col) :+ col("value")): _*)
  }

  /** Cube wrapper with name-guessed dim types. */
  def loadCube(spark: SparkSession, dir: String,
      dimNames: Seq[String]): DataCube =
    DataCube.fromTable(loadArray(spark, dir, dimNames), dimNames, "value")
}
