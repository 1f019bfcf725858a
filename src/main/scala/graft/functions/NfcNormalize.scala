package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd scalar expression — the first
  * step of model-ready text canonicalization (decomposed accents, legacy
  * combining sequences, and compatibility-adjacent mojibake collapse to
  * one canonical form, so downstream hashing/dedup/tokenization see ONE
  * spelling of equal text).
  *
  * Spark ships no Unicode-normalization function, and the UDF route
  * breaks whole-stage codegen around it. This expression stays fused:
  * the ASCII fast path never leaves UTF8String (a byte scan — the
  * overwhelmingly common case in a crawl pays zero String allocation;
  * `numBytes == numChars` ⇒ all code points < 0x80 ⇒ NFC identity), and
  * only genuinely non-ASCII rows round-trip through
  * `java.text.Normalizer` (Form.NFC, the same Unicode algorithm DuckDB's
  * `nfc_normalize` implements — what lets the oracle mirror it).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC-normalize a UTF8String; ASCII inputs return `s` itself. */
  def normalize(s: UTF8String): UTF8String = {
    // all-ASCII ⇔ every code point is one UTF-8 byte ⇔ bytes == chars;
    // ASCII is closed under NFC, so the row passes through untouched
    if (s.numBytes == s.numChars) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }
}
