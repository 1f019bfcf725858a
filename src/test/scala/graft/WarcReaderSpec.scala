package graft

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.WarcReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC (ISO 28500) crawl ingest: envelope grammar, gzip member chain,
  * HTTP parse leniency, and the Spark fan-out over the driver fixture.
  */
class WarcReaderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rec(rtype: String, uri: String, block: Array[Byte]): Array[Byte] = {
    val head = s"WARC/1.0\r\nWARC-Type: $rtype\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"WARC-Record-ID: <urn:uuid:1>\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n"
    head.getBytes(UTF_8) ++ block ++ "\r\n\r\n".getBytes(UTF_8)
  }

  test("record iterator walks envelopes and parses HTTP responses") {
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" +
      "hello body").getBytes(UTF_8)
    val bytes = rec("warcinfo", "", "software: x\r\n".getBytes(UTF_8)) ++
      rec("response", "<https://a.example/x>", http) ++
      rec("request", "https://a.example/x", "GET / HTTP/1.1\r\n\r\n".getBytes(UTF_8))
    val rs = WarcReader.records("f", new ByteArrayInputStream(bytes)).toList
    assert(rs.map(_.recordType) == List("warcinfo", "response", "request"))
    val r = rs(1)
    // angle-bracketed WARC-Target-URI (early-spec writers) is stripped
    assert(r.url == "https://a.example/x")
    assert(r.httpStatus == 200 && r.httpContentType == "text/plain")
    assert(new String(r.body, UTF_8) == "hello body")
    // non-response records carry the raw block, no HTTP parse
    assert(rs(0).httpStatus == 0 && rs(2).httpStatus == 0)
  }

  test("HTTP parse is lenient: unparsable blocks keep the whole payload") {
    val (s1, c1, b1) = WarcReader.parseHttp("no status line here".getBytes(UTF_8))
    assert(s1 == 0 && c1 == "" && new String(b1, UTF_8) == "no status line here")
    // bare-LF header section (sloppy servers) still parses
    val (s2, c2, b2) = WarcReader.parseHttp(
      "HTTP/1.0 404 Not Found\nContent-Type: text/html\n\nbody".getBytes(UTF_8))
    assert(s2 == 404 && c2 == "text/html" && new String(b2, UTF_8) == "body")
  }

  test("truncated block and missing Content-Length raise typed errors") {
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\n" +
      "short").getBytes(UTF_8)
    val e1 = intercept[java.io.EOFException] {
      WarcReader.records("f", new ByteArrayInputStream(bad)).toList
    }
    assert(e1.getMessage.contains("WarcCorrupt"))
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes(UTF_8)
    val e2 = intercept[IllegalArgumentException] {
      WarcReader.records("f", new ByteArrayInputStream(noLen)).toList
    }
    assert(e2.getMessage.contains("Content-Length"))
  }

  test("fixture gzip member chain loads; responses project with canonical+PSL") {
    val fix = graft.queries.WarcFixture.ensure()
    val all = WarcReader.load(spark, Seq(fix))
    // 1 warcinfo + 2 requests + 6 responses, each its own gzip member
    assert(all.count() == 9)
    assert(all.groupBy("record_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("warcinfo" -> 1L, "request" -> 2L, "response" -> 6L))
    val resp = WarcReader.loadResponses(spark, Seq(fix))
    assert(resp.count() == 6)
    // the tracking-param URL-variant pair collapses on the canonical key
    assert(resp.select("canonical_url").distinct().count() == 5)
    // PSL: gov.uk host registers at three labels
    assert(resp.where(col("url").contains("data.gov.uk"))
      .select("domain").head().getString(0) == "data.gov.uk")
    // lenient UTF-8: the non-ASCII body round-trips
    assert(resp.where(col("http_status") === 404).count() == 1)
    assert(resp.where(col("text").contains("Café Ünïcode ✓")).count() == 1)
  }

  test("ingest feeds the crawl family: extract + line dedup run downstream") {
    val fix = graft.queries.WarcFixture.ensure()
    val resp = WarcReader.loadResponses(spark, Seq(fix))
      .where(col("http_content_type").startsWith("text/html") &&
        col("http_status") === 200)
    val clean = resp.select(col("canonical_url"),
      graft.pipeline.TextAnalysis.htmlExtract(col("text")).as("clean"))
    val rows = clean.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("http://www.example.co.uk/Path/page1?a=1&b=2") ==
      "Page one\nCafé Ünïcode ✓ text.")
  }
}
