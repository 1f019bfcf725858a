package graft.geo

/** CRS registry and point transforms for the warp path.
  *
  * The reference reprojects between arbitrary CRS pairs via pyproj
  * (reference: cubes/_filter.py:284-320) and warps rasters through
  * odc-geo/GDAL (cubes/resample.py:39-113). This environment has no proj
  * database, so the registry models the CRS families the published formulas
  * cover directly:
  *
  *  - geographic WGS84 (EPSG:4326, OGC:CRS84)
  *  - spherical web-mercator (EPSG:3857)
  *  - WGS84 Transverse Mercator with ARBITRARY central meridian / scale /
  *    false origin ([[Geo.tmForward]]) — which includes every UTM zone
  *    (EPSG:326xx / 327xx) and, via proj-style parameter strings
  *    (`+proj=tmerc +lon_0=9 +k=1 +x_0=3500000 +y_0=0`), most national TM
  *    grids (Gauss-Krüger and friends).
  *
  * Every transform routes through the lon/lat hub: from → 4326 → to.
  */
object Crs {

  sealed trait CrsDef
  case object LonLat extends CrsDef
  case object WebMercator extends CrsDef
  final case class TransverseMercator(lon0: Double, k0: Double,
      falseEasting: Double, falseNorthing: Double) extends CrsDef

  private val UtmNorth = "EPSG:326(\\d\\d)".r
  private val UtmSouth = "EPSG:327(\\d\\d)".r

  /** Parse an EPSG code or proj-style tmerc string. Unknown codes raise —
    * the same contract as the reference's CRS errors (pyproj CRSError).
    */
  def parse(spec: String): CrsDef = spec.trim.toUpperCase match {
    case "EPSG:4326" | "OGC:CRS84" | "CRS84" | "WGS84" => LonLat
    case "EPSG:3857" => WebMercator
    case UtmNorth(z) =>
      TransverseMercator(Geo.utmCentralMeridian(z.toInt), 0.9996, 500000.0, 0.0)
    case UtmSouth(z) =>
      TransverseMercator(Geo.utmCentralMeridian(z.toInt), 0.9996, 500000.0,
        10000000.0)
    case s if s.startsWith("+PROJ=TMERC") =>
      val kv = s.split("\\s+").iterator
        .filter(_.contains("=")).map(_.split("=", 2))
        .map(a => a(0).stripPrefix("+") -> a(1)).toMap
      TransverseMercator(
        kv.getOrElse("LON_0", "0").toDouble,
        kv.get("K").orElse(kv.get("K_0")).getOrElse("1").toDouble,
        kv.getOrElse("X_0", "0").toDouble,
        kv.getOrElse("Y_0", "0").toDouble)
    case other =>
      throw new IllegalArgumentException(s"CrsNotSupported: $other")
  }

  def toLonLat(crs: CrsDef, x: Double, y: Double): (Double, Double) =
    crs match {
      case LonLat => (x, y)
      case WebMercator =>
        (math.toDegrees(x / 6378137.0),
          math.toDegrees(math.atan(math.exp(y / 6378137.0)) * 2 - math.Pi / 2))
      case TransverseMercator(lon0, k0, fe, fn) =>
        Geo.tmInverse(x, y, lon0, k0, fe, fn)
    }

  def fromLonLat(crs: CrsDef, lon: Double, lat: Double): (Double, Double) =
    crs match {
      case LonLat => (lon, lat)
      case WebMercator =>
        (math.toRadians(lon) * 6378137.0,
          math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)) * 6378137.0)
      case TransverseMercator(lon0, k0, fe, fn) =>
        Geo.tmForward(lon, lat, lon0, k0, fe, fn)
    }

  /** from → 4326 → to; identity short-circuits stay bit-exact. */
  def transform(from: CrsDef, to: CrsDef, x: Double, y: Double): (Double, Double) =
    if (from == to) (x, y)
    else {
      val (lon, lat) = toLonLat(from, x, y)
      fromLonLat(to, lon, lat)
    }
}
