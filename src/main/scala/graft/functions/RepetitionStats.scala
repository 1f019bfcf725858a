package graft.functions

import java.util.{HashMap => JHashMap, HashSet => JHashSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Gopher repetition metrics (Rae et al. 2021, public) for a
  * document: `struct(ttr, top2, top3, dup5)`.
  *
  * Semantically identical to the four [[graft.pipeline.Repetition]]
  * higher-order-function columns — same tokenizer
  * (`split(trim(lower(text)), "\\s+")` via the very same `UTF8String`
  * lower/trim/regex-split used by Spark's built-ins), same binary-string
  * tie-break for the top gram (count desc, gram asc under `UTF8String`
  * byte order, i.e. the `array_sort` order the fold relies on), and the
  * same long-then-double arithmetic, so results are bit-identical (a
  * property spec pins this on random strings).
  *
  * Exists because the HOF form is interpreted per array element: three
  * separate sorted-gram folds re-tokenize and re-sort each document, which
  * made `text_repetition` the slowest bench query (14.8 s at sf0.1) despite
  * being a pure scan. One imperative pass with hash-map gram counts is
  * ~50× cheaper per row and keeps the operator at scan speed — the filter
  * rides any corpus read with zero shuffles, which is exactly what a
  * 100-TB quality-filter pass needs.
  *
  * Reference behavior: openeo-processes-dask has no text pipeline; the
  * metric definitions follow the public Gopher paper as documented in
  * `pipeline/Repetition.scala`.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = RepetitionStats.schema

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  // real codegen: one static call, stage stays fused
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("repStats", RepetitionStats,
      "graft.functions.RepetitionStats$")
    defineCodeGen(ctx, ev, c => s"(InternalRow) $obj.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "graft_repetition"
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("ttr", DoubleType, nullable = false),
    StructField("top2", DoubleType, nullable = false),
    StructField("top3", DoubleType, nullable = false),
    StructField("dup5", DoubleType, nullable = false)))

  // precompiled: UTF8String.split(pattern, -1) is defined as
  // toString.split(pattern, -1), which recompiles the regex per call —
  // same semantics, one compile
  private val WS = java.util.regex.Pattern.compile("\\s+")
  private val SP = UTF8String.fromString(" ")

  private[functions] def splitTokens(text: UTF8String): Array[UTF8String] =
    WS.split(text.toLowerCase.trim().toString, -1).map(UTF8String.fromString)

  /** `cnt(top)·len(top)/len(text)` where the top n-gram maximises
    * (count, then byte-order-smallest gram); 0.0 for empty text or when the
    * doc has fewer than n tokens (cnt·len is 0 there).
    */
  private def topFrac(toks: Array[UTF8String], n: Int, textLen: Int): Double = {
    if (textLen == 0) return 0.0
    if (toks.length < n) return 0.0
    val counts = new JHashMap[UTF8String, Long](toks.length * 2)
    var i = 0
    while (i <= toks.length - n) {
      val gram = UTF8String.concatWs(SP, toks.slice(i, i + n): _*)
      counts.merge(gram, 1L, (a, b) => a + b)
      i += 1
    }
    var bestCnt = 0L
    var bestGram: UTF8String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestCnt || (c == bestCnt && e.getKey.compareTo(bestGram) < 0)) {
        bestCnt = c
        bestGram = e.getKey
      }
    }
    (bestCnt * bestGram.numChars()).toDouble / textLen.toDouble
  }

  /** `Σ_{gram: cnt≥2} cnt·len(gram) / len(text)`; 0.0 for empty text. */
  private def dupFrac(toks: Array[UTF8String], n: Int, textLen: Int): Double = {
    if (textLen == 0) return 0.0
    if (toks.length < n) return 0.0
    val counts = new JHashMap[UTF8String, Long](toks.length * 2)
    var i = 0
    while (i <= toks.length - n) {
      val gram = UTF8String.concatWs(SP, toks.slice(i, i + n): _*)
      counts.merge(gram, 1L, (a, b) => a + b)
      i += 1
    }
    var acc = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue >= 2L) acc += e.getValue * e.getKey.numChars()
    }
    acc.toDouble / textLen.toDouble
  }

  def compute(text: UTF8String): InternalRow = {
    val textLen = text.numChars()
    // identical pipeline to split(trim(lower(text)), "\s+"): UTF8String's own
    // lowercase, space-trim and Java-regex split (limit -1 keeps trailing
    // empties, exactly like Spark's two-arg split)
    val toks = splitTokens(text)
    val ttr =
      if (toks.length == 0) 0.0
      else {
        val distinct = new JHashSet[UTF8String](toks.length * 2)
        var i = 0
        while (i < toks.length) { distinct.add(toks(i)); i += 1 }
        distinct.size().toDouble / toks.length.toDouble
      }
    new GenericInternalRow(Array[Any](
      ttr,
      topFrac(toks, 2, textLen),
      topFrac(toks, 3, textLen),
      dupFrac(toks, 5, textLen)))
  }
}
