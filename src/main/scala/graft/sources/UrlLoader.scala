package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** load_url (reference: openeo_processes_dask/process_implementations/
  * cubes/load.py:325-401): fetch a GeoJSON / JSON / Parquet document from a
  * URL into a vector-cube DataFrame.
  *
  * The fetch is driver-side (it is a metadata-scale acquisition, exactly as
  * the reference's `requests.get`); the parsed result is distributed through
  * the normal loaders. `file://` URLs work unchanged, which is also how the
  * specs exercise this without network access.
  */
object UrlLoader {

  private val Formats = Set("GeoJSON", "JSON", "Parquet")

  def loadUrl(spark: SparkSession, url: String, format: String,
      properties: Seq[String] = Nil): DataFrame = {
    if (!Formats.contains(format))
      throw new IllegalArgumentException(
        s"FormatUnsuitable: Data can't be loaded with the requested input format $format.")
    format match {
      case "GeoJSON" =>
        graft.operators.VectorOps.loadGeoJson(spark, fetchString(url), properties)
      case "JSON" =>
        import spark.implicits._
        spark.read.json(Seq(fetchString(url)).toDS())
      case "Parquet" =>
        val tmp = java.nio.file.Files.createTempFile("graft_load_url", ".parquet")
        try {
          val in = open(url)
          try java.nio.file.Files.copy(in, tmp,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          // eagerly localize the schema read; data reads re-open the temp
          // file lazily, so keep it for the session (deleteOnExit)
          tmp.toFile.deleteOnExit()
          spark.read.parquet(tmp.toString)
        } catch {
          case e: java.io.IOException =>
            throw new IllegalArgumentException(s"Provided url $url unavailable.", e)
        }
    }
  }

  private def open(url: String): java.io.InputStream =
    java.net.URI.create(url).toURL.openStream()

  private def fetchString(url: String): String =
    try {
      val in = open(url)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(s"Provided url $url unavailable.", e)
    }
}
