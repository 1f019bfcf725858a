package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the LAST 2000 chars of Bench's stdout and
  * json-parses the line it finds there (the r5 truncation lesson). This
  * pins the invariant at the CURRENT registry size and far past it, so
  * adding queries can never silently clip the record again.
  */
class BenchLineSpec extends AnyFunSuite {

  private def line(results: Seq[(String, Double)],
      errors: Map[String, String] = Map.empty): String =
    Bench.stdoutLine(results.map(_._2).sum, 3, 1, "/root/testdata/sf0.1",
      collection.mutable.LinkedHashMap(errors.toSeq: _*),
      "BENCH_DETAIL.json", results)

  private def parsed(s: String): JValue = JsonMethods.parse(s)

  test("the real registry's query names fit the 1900-char stdout budget") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val l = line(names.zipWithIndex.map { case (n, i) => (n, 0.1 + i * 0.01) })
    assert(l.length < 1900, s"stdout line is ${l.length} chars")
    val j = parsed(l)
    assert((j \ "nq") == JInt(names.size))
    // slowest-first packing: the slowest query's min is always present
    assert((j \ "queries" \ names.last) != JNothing)
  }

  test("underscore probes ride the queries map but never count as registry work") {
    // the _canary is a box probe: it must appear in the record (so
    // cross-round normalization can read it) while nq counts only real
    // queries — a phantom extra query is exactly the registry-count
    // drift this line exists to make unmissable
    val l = line(Seq(("_canary", 0.2), ("real_query_a", 1.0),
      ("real_query_b", 2.0)))
    val j = parsed(l)
    assert((j \ "nq") == JInt(2), l)
    assert((j \ "queries" \ "_canary") != JNothing, l)
  }

  test("the budget holds at 400 queries and under mass failure") {
    val big = (0 until 400).map(i => (f"synthetic_query_name_$i%03d", i * 0.01))
    val l = line(big)
    assert(l.length < 1900, s"stdout line is ${l.length} chars")
    val j = parsed(l)
    assert((j \ "nq") == JInt(400))
    // the slowest entry survives truncation; some cheap ones are dropped
    assert((j \ "queries" \ "synthetic_query_name_399") != JNothing)
    assert((j \ "queries" \ "synthetic_query_name_000") == JNothing)
    // mass failure: errors are capped at 8 entries with 40-char messages
    val errs = (0 until 50).map(i =>
      s"failing_query_$i" -> ("SparkException: " + "x" * 200)).toMap
    val l2 = line(big, errs)
    assert(l2.length < 1900, s"error-path line is ${l2.length} chars")
    val j2 = parsed(l2)
    assert((j2 \ "nerr") == JInt(50))
    val JObject(errFields) = (j2 \ "errors"): @unchecked
    assert(errFields.size == 8)
  }
}
