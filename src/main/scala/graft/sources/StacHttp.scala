package graft.sources

/** HTTP STAC API search — the live-API twin of
  * [[StacLoader.loadCatalogItems]]'s static-catalog phase.
  *
  * The reference resolves a collection URL to its parent catalog and
  * forwards the openEO load filters as STAC item-search parameters
  * (`collections`, `bbox`, `datetime`, and the query extension as
  * `query_params["query"]` — cubes/load.py:111-161); this module does the
  * same over an INJECTABLE transport so the construction of the pushed-down
  * search request is testable with recorded fixtures in an offline
  * environment, while [[HttpStacTransport]] (plain JDK `java.net.http`)
  * serves a live deployment. Driver-side metadata work by design: search
  * pages are kilobytes; the PIXELS fan out to executors from the asset
  * table this produces.
  */
object StacHttp {

  /** One GET of a STAC API URL returning the response body. Injectable so
    * tests drive [[searchItems]] from canned request/response pairs.
    */
  trait StacTransport {
    def get(url: String): String
  }

  /** Live transport on the JDK HTTP client (public `java.net.http` API):
    * follows redirects, 30 s timeouts, `Accept: application/geo+json`.
    * Fails loudly on any non-2xx status — a silent empty item list would
    * surface as a confusing NoDataAvailable far from the cause.
    */
  final class HttpStacTransport extends StacTransport {
    private lazy val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .build()

    def get(url: String): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Accept", "application/geo+json")
        .timeout(java.time.Duration.ofSeconds(30))
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode / 100 == 2,
        s"OpenEOException: STAC API returned HTTP ${resp.statusCode} for $url")
      resp.body()
    }
  }

  /** Split a STAC collection URL into (catalog root, collection id) — the
    * reference's `_search_for_parent_catalog` shape: a URL ending in
    * `/collections/<id>` searches `<root>/search` with
    * `collections=<id>`. A URL without that suffix is already a catalog
    * root and selects no collection filter.
    */
  def parentCatalog(url: String): (String, Option[String]) = {
    val u = url.stripSuffix("/")
    val m = "^(.*)/collections/([^/]+)$".r
    u match {
      case m(root, id) => (root, Some(id))
      case _ => (u, None)
    }
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** The STAC query-extension JSON for the openEO `properties` argument —
    * the exact structure the reference forwards as
    * `query_params["query"]` (load.py:153-154): per property, an object of
    * `{op: operand}` with numeric operands left unquoted.
    */
  private[graft] def queryJson(
      properties: Map[String, Seq[(String, String)]]): String =
    properties.toSeq.sortBy(_._1).map { case (prop, preds) =>
      val body = preds.map { case (op, operand) =>
        // strict JSON-number syntax, NOT toDoubleOption: the Java parser
        // also accepts "Infinity", "NaN" and trailing d/f suffixes
        // ("7d"), which emitted unquoted would be invalid JSON the
        // server rejects or silently drops
        val isJsonNumber =
          operand.matches("-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?")
        val v = if (isJsonNumber) operand
        else "\"" + operand.flatMap {
          case '\\' => "\\\\"
          case '"' => "\\\""
          // control chars (a newline/tab in a property operand) must be
          // \u-escaped or the query URL carries invalid JSON the server
          // rejects or misparses
          case c if c < 0x20 => f"\\u${c.toInt}%04x"
          case c => c.toString
        } + "\""
        s""""$op":$v"""
      }.mkString(",")
      s""""$prop":{$body}"""
    }.mkString("{", ",", "}")

  /** Build the item-search GET URL with every filter PUSHED TO THE API —
    * the server-side twin of [[StacLoader.filterAssets]]'s pruning:
    * `collections`, `bbox=w,s,e,n`, `datetime=start/end` (openEO's open
    * bound "" becomes STAC's ".."), the query extension, and the page
    * `limit`. Exposed for the fixture specs, which pin the constructed
    * URL rather than a mocked client's internals.
    */
  def searchUrl(apiRoot: String,
      collections: Seq[String],
      bbox: Option[(Double, Double, Double, Double)],
      timeRange: Option[(String, String)],
      properties: Map[String, Seq[(String, String)]],
      limit: Int): String = {
    val params = Seq.newBuilder[String]
    if (collections.nonEmpty)
      params += s"collections=${enc(collections.mkString(","))}"
    bbox.foreach { case (w, s, e, n) =>
      params += s"bbox=$w,$s,$e,$n"
    }
    timeRange.foreach { case (s0, e0) =>
      val lo = if (s0.isEmpty) ".." else s0
      val hi = if (e0.isEmpty) ".." else e0
      params += s"datetime=${enc(s"$lo/$hi")}"
    }
    if (properties.nonEmpty)
      params += s"query=${enc(queryJson(properties))}"
    params += s"limit=$limit"
    s"${apiRoot.stripSuffix("/")}/search?${params.result().mkString("&")}"
  }

  /** Run the paged item search and parse every returned feature through
    * [[StacLoader.parseItem]] — one asset row per (item, band). Follows
    * `links rel="next"` hrefs up to `maxPages` (a loud gate, not a silent
    * truncation). The API prunes server-side from the pushed parameters;
    * callers still compose [[StacLoader.filterAssets]] on the result as
    * the authoritative client-side cut (band selection is asset-level and
    * never part of the search API).
    */
  def searchItems(transport: StacTransport, url: String,
      bbox: Option[(Double, Double, Double, Double)] = None,
      timeRange: Option[(String, String)] = None,
      properties: Map[String, Seq[(String, String)]] = Map.empty,
      limit: Int = 100, maxPages: Int = 100): Seq[StacLoader.StacAsset] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val (root, collection) = parentCatalog(url)
    var next: Option[String] = Some(searchUrl(root, collection.toSeq, bbox,
      timeRange, properties, limit))
    val out = Seq.newBuilder[StacLoader.StacAsset]
    var pages = 0
    while (next.isDefined) {
      pages += 1
      require(pages <= maxPages,
        s"OpenEOException: STAC search exceeded $maxPages pages for $url — " +
          "narrow the extents or raise maxPages")
      val body = transport.get(next.get)
      val page = JsonMethods.parse(body)
      (page \ "features") match {
        case JArray(items) => items.foreach { it =>
          out ++= StacLoader.parseItem(JsonMethods.compact(it))
        }
        case _ => ()
      }
      // servers may return RELATIVE next hrefs ("/search?page=2") —
      // resolve against the page we just fetched or the live transport's
      // URI builder throws mid-pagination
      val cur = next.get
      next = (page \ "links") match {
        case JArray(ls) => ls.collectFirst {
          case l if (l \ "rel") == JString("next") =>
            // a rel=next object with a missing/non-string href is a
            // protocol violation — fail loudly (the module's convention,
            // like the maxPages gate) rather than silently truncate the
            // pagination
            (l \ "href") match {
              case JString(h) if h.nonEmpty => h
              case other => throw new IllegalArgumentException(
                s"OpenEOException: STAC search page $cur has a rel=next " +
                  s"link without a string href (got $other) — refusing to " +
                  "silently truncate pagination")
            }
        }.map(h => java.net.URI.create(cur).resolve(h).toString)
        case _ => None
      }
    }
    out.result()
  }
}
