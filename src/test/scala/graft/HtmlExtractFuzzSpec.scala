package graft

import graft.functions.HtmlExtract
import graft.pipeline.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Seeded heavy fuzz of the one-pass [[HtmlExtract]] scanner against an
  * INDEPENDENT java.util.regex re-implementation of the
  * [[TextAnalysis.htmlRules]] chain (the same regex engine Spark's
  * regexp_replace runs) — 20k adversarial tag/entity-soup documents, pure
  * JVM, no Spark session. Complements the Spark-side ScalaCheck law in
  * PipelineLawsCheck, which pins the expression against the actual
  * regexp_replace chain but can only afford a few dozen cases.
  */
class HtmlExtractFuzzSpec extends AnyFunSuite {

  private val patterns = TextAnalysis.htmlRules.map { case (p, r) =>
    (java.util.regex.Pattern.compile(p),
      java.util.regex.Matcher.quoteReplacement(r))
  }

  /** The chain, independently: sequential global replace + trim(" \n"). */
  private def chain(s: String): String = {
    var cur = s
    for ((p, r) <- patterns) cur = p.matcher(cur).replaceAll(r)
    var a = 0
    var b = cur.length
    while (a < b && (cur.charAt(a) == ' ' || cur.charAt(a) == '\n')) a += 1
    while (b > a && (cur.charAt(b - 1) == ' ' || cur.charAt(b - 1) == '\n')) b -= 1
    cur.substring(a, b)
  }

  private val frags = Array(
    "<script>", "</script>", "<script a>", "<SCRIPT>", "</SCRIPT>",
    "<scripty>", "<style>", "</style>", "<StYlE x>", "<!--", "-->",
    "<!---->", "</p>", "</P>", "</div>", "</h3>", "</h6>", "</h7>",
    "</table>", "</tr>", "</ul>", "</ol>", "</li>", "</blockquote>",
    "<br>", "<br/>", "<Br >", "<b>", "</b>", "<", ">", "</p<br>",
    "<a </p> b>", "<!--<script>-->x</script>", "&amp;", "&lt;", "&gt;",
    "&quot;", "&#39;", "&nbsp;", "&amp;lt;", "&", ";", "&amp", "&lt",
    "&#3", "&x;", "text", "a b", "Tail words", " ", "  ", "\n", "\t",
    "\r", "\r\n", "é Ω", "10 < 20", "x>y", "\"q\"", "it's", "--",
    "<!", "!>", "/", "<script </script>x</script>",
    "<style>a<script>b</script>c</style>")

  test("20k adversarial documents: scanner == independent regex chain") {
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 20000) {
      val n = rnd.nextInt(25)
      val sb = new StringBuilder
      var j = 0
      while (j < n) { sb.append(frags(rnd.nextInt(frags.length))); j += 1 }
      val s = sb.toString
      val got = HtmlExtract.extract(s)
      val want = chain(s)
      assert(got == want, s"input=${s.replace("\n", "\\n").replace("\r", "\\r")}")
      i += 1
    }
  }
}
