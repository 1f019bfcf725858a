package graft.functions

import java.util.{LinkedHashSet => JLinkedHashSet}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a document as `array<string>`, in one
  * imperative pass — the scan-side stage of every shingle-based dedup
  * operator (MinHash-LSH, n-gram Jaccard, decontamination containment).
  *
  * Semantics match the HOF form in [[graft.pipeline.Dedup.shingles]]
  * exactly: tokens via the same `UTF8String` lower/trim/regex-split that
  * backs `split(trim(lower(text)), "\\s+")`, grams joined with a single
  * space, `array_distinct` first-occurrence order (LinkedHashSet), empty
  * array when the document has fewer than n tokens. A property spec pins
  * the equivalence on random text.
  *
  * Exists because the HOF pipeline — `transform(sequence(...),
  * i => concat_ws(" ", element_at(toks, i+k)...))` — is interpreted per
  * array element with per-call Catalyst overhead, which made shingling the
  * dominant scan cost of the dedup family. One pass with direct array
  * indexing keeps the dedup operators scan-fast at corpus scale.
  */
case class Shingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[UTF8String], n, distinct)

  // real codegen: one static call, stage stays fused (the fallback would
  // interpret the child subtree per row and box the result)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("shingles", Shingles,
      "graft.functions.Shingles$")
    defineCodeGen(ctx, ev, c => s"$obj.compute($c, $n, $distinct)")
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)

  override def prettyName: String =
    if (distinct) "graft_shingles" else "graft_ngrams"
}

object Shingles {

  private val SP = UTF8String.fromString(" ")

  def compute(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val toks = RepetitionStats.splitTokens(text)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    if (distinct) {
      val seen = new JLinkedHashSet[UTF8String](toks.length * 2)
      var i = 0
      while (i < m) {
        seen.add(UTF8String.concatWs(SP, toks.slice(i, i + n): _*))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    } else {
      val out = new Array[AnyRef](m)
      var i = 0
      while (i < m) {
        out(i) = UTF8String.concatWs(SP, toks.slice(i, i + n): _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
