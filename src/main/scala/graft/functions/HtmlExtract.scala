package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scan-speed HTML → text extraction: the single-expression form of the
  * [[graft.pipeline.TextAnalysis.htmlRules]] regexp_replace chain.
  *
  * The chain is 15 sequential regex passes, each allocating a full copy of
  * the document — ~15× the string traffic of one traversal, all of it NFA
  * work. This expression evaluates the SAME function with a handful of
  * tight linear scans and zero regex machinery (the
  * [[RepetitionStats]]/[[TrigramScore]] precedent). Equivalence is BY
  * CONSTRUCTION, phase for phase — each helper implements its rule's exact
  * regex semantics, including the chain's residue subtleties:
  *
  *  - script/style/comment spans are lazy (`.*?`: first closer wins) and
  *    the open tag's `[^>]*` runs to the FIRST `>`, so `<scripty>` and
  *    `<script </script>x</script>` resolve exactly as the regexes do;
  *  - later phases run on the RESIDUE of earlier ones: `</p<br>` loses its
  *    `<br>` to rule 5 (leaving `</p` + newline) — never to rule 6, and a
  *    rule-6 tag may swallow an earlier phase's `\n` replacement
  *    (`<a </p> b>` → one space), which per-position priority would get
  *    wrong — hence materialized per-phase scans, not one merged automaton;
  *  - entities decode left-to-right in one pass (the six literals are
  *    mutually prefix-free and contain no interior `&`, so the chain's
  *    rule order and a single scan agree — `&amp;lt;` yields literal
  *    `&lt;`);
  *  - whitespace folds per run: a maximal run of space/tab/newline becomes
  *    `\n` if it contains a newline, else one space (exactly what rules
  *    13–15 compose to), with leading/trailing runs dropped (the chain's
  *    final `trim(…, " \n")` — tabs inside those runs have already become
  *    spaces by rule 13). `\r` and unicode spaces are NOT whitespace to
  *    the chain and pass through untouched.
  *
  * A ScalaCheck law pins expression ≡ chain on adversarial tag/entity
  * soup; the driver oracle keeps mirroring the chain verbatim.
  */
case class HtmlExtract(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case a => TypeCheckResult.TypeCheckFailure(
      s"graft_html_extract expects string, got ${a.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(html: Any): Any =
    UTF8String.fromString(
      HtmlExtract.extract(html.asInstanceOf[UTF8String].toString))

  // real codegen (not CodegenFallback): the fallback would interpret the
  // WHOLE child subtree per row — e.g. the page-wrapper concat feeding
  // this expression — where this keeps the stage fused and calls one
  // static scanner
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("htmlExtract", HtmlExtract,
      "graft.functions.HtmlExtract$")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$obj.extract($c.toString()))")
  }

  override protected def withNewChildInternal(c: Expression): HtmlExtract =
    copy(child = c)

  override def prettyName: String = "graft_html_extract"
}

object HtmlExtract {

  /** The full chain as one JVM call: phases 1–6 (tags), entities, then
    * whitespace normalization + trim.
    */
  def extract(html: String): String =
    normalizeWs(entities(genericTags(brTags(blockClosers(
      stripComments(stripSpans(stripSpans(html, "script"), "style")))))))

  private def regionIC(s: String, at: Int, lit: String): Boolean =
    at + lit.length <= s.length &&
      s.regionMatches(true, at, lit, 0, lit.length)

  private def indexOfIC(s: String, lit: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = s.length - lit.length
    while (i <= last) {
      if (s.regionMatches(true, i, lit, 0, lit.length)) return i
      i += 1
    }
    -1
  }

  /** `(?is)<tag[^>]*>.*?</tag>` → " " (global). The open tag is `<tag`
    * followed by anything up to the FIRST `>` (so `<tagx class=…>` opens
    * too, exactly like the regex); the span runs to the first closer. A
    * position where the open can't complete (no `>` or no closer ahead)
    * can never complete later either, so scanning the rest degrades to a
    * straight copy.
    */
  private def stripSpans(s: String, tag: String): String = {
    val open = "<" + tag
    val close = "</" + tag + ">"
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var dead = false
    while (i < n) {
      if (!dead && s.charAt(i) == '<' && regionIC(s, i, open)) {
        val gt = s.indexOf('>', i + open.length)
        val cl = if (gt < 0) -1 else indexOfIC(s, close, gt + 1)
        if (cl < 0) { dead = true; sb.append(s.charAt(i)); i += 1 }
        else { sb.append(' '); i = cl + close.length }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `(?s)<!--.*?-->` → " " (global, case-sensitive). */
  private def stripComments(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var dead = false
    while (i < n) {
      if (!dead && s.charAt(i) == '<' && s.startsWith("<!--", i)) {
        val cl = s.indexOf("-->", i + 4)
        if (cl < 0) { dead = true; sb.append(s.charAt(i)); i += 1 }
        else { sb.append(' '); i = cl + 3 }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private val closers: Array[String] =
    Array("p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6",
      "tr", "table", "ul", "ol", "blockquote").map(t => "</" + t + ">")

  /** `(?i)</(p|div|li|h[1-6]|tr|table|ul|ol|blockquote)>` → "\n". The
    * alternatives are mutually exclusive at any position (each requires
    * its own immediate `>`), so first-match order is immaterial.
    */
  private def blockClosers(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      var matched = -1
      if (s.charAt(i) == '<' && i + 1 < n && s.charAt(i + 1) == '/') {
        var t = 0
        while (matched < 0 && t < closers.length) {
          if (regionIC(s, i, closers(t))) matched = closers(t).length
          t += 1
        }
      }
      if (matched > 0) { sb.append('\n'); i += matched }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `(?i)<br[^>]*>` → "\n". `[^>]*` may span earlier phases' replacement
    * characters — it runs over THIS residue, to the first `>`.
    */
  private def brTags(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var dead = false
    while (i < n) {
      if (!dead && s.charAt(i) == '<' && regionIC(s, i, "<br")) {
        val gt = s.indexOf('>', i + 3)
        if (gt < 0) { dead = true; sb.append(s.charAt(i)); i += 1 }
        else { sb.append('\n'); i = gt + 1 }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `<[^>]*>` → " ". A `<` with no `>` anywhere ahead stays literal. */
  private def genericTags(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var dead = false
    while (i < n) {
      val c = s.charAt(i)
      if (!dead && c == '<') {
        val gt = s.indexOf('>', i + 1)
        if (gt < 0) { dead = true; sb.append(c); i += 1 }
        else { sb.append(' '); i = gt + 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val entityLits: Array[String] =
    Array("&nbsp;", "&lt;", "&gt;", "&quot;", "&#39;", "&amp;")
  private val entityRepl: Array[Char] =
    Array(' ', '<', '>', '"', '\'', '&')

  /** Rules 7–12 in one left-to-right scan: the literals are prefix-free
    * and `&`-interior-free, so all matches are disjoint and replacements
    * never create later-rule matches — sequential global replace and one
    * scan agree on every input.
    */
  private def entities(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var hit = -1
      if (c == '&') {
        var t = 0
        while (hit < 0 && t < entityLits.length) {
          if (s.startsWith(entityLits(t), i)) hit = t
          t += 1
        }
      }
      if (hit >= 0) { sb.append(entityRepl(hit)); i += entityLits(hit).length }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Rules 13–15 + `trim(…, " \n")`: each maximal run of space/tab/newline
    * folds to `\n` if it contains a newline else one space; boundary runs
    * vanish.
    */
  private def normalizeWs(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n') {
        var hasNl = false
        var j = i
        while (j < n && {
          val w = s.charAt(j); w == ' ' || w == '\t' || w == '\n'
        }) { if (s.charAt(j) == '\n') hasNl = true; j += 1 }
        if (sb.length() > 0 && j < n) sb.append(if (hasNl) '\n' else ' ')
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
