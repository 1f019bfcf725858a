package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass BPE encoding: text → subword pieces (`array<string>`,
  * `</w>`-marked) under a ranked merge table supplied as a foldable
  * literal (`array<array<string>>` of [left, right] pairs, rank order).
  *
  * Applies merges in learned rank order per word — exactly the transform
  * [[graft.pipeline.Bpe.trainLocal]] performed during training, so
  * encoding a training word reproduces its final training segmentation.
  * Tokenization is the engine-wide whitespace split; empty tokens are
  * skipped (they carry no characters).
  *
  * Like the other imperative expressions ([[RepetitionStats]],
  * [[Shingles]]), this keeps the operator scan-speed: the merge table
  * rides in the plan, encoding shuffles nothing, and the same expression
  * serves batch and streaming ingest.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(ArrayType(StringType, _), _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_bpe merge table must be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe expects (string, array<array<string>>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val merges: Array[(String, String)] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val p = arr.getArray(i)
      require(p.numElements() == 2, s"merge $i is not a [left, right] pair")
      (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
    }.toArray
  }

  override def nullSafeEval(textAny: Any, _mergesAny: Any): Any =
    encode(textAny.asInstanceOf[UTF8String])

  // real codegen: the merge table is folded driver-side (literal by
  // contract) and rides with the expression instance as a reference
  // object; only the text child evaluates in generated code
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("bpeEnc", this, "graft.functions.BpeEncode")
    val textGen = left.genCode(ctx)
    val code =
      code"""
        |${textGen.code}
        |boolean ${ev.isNull} = ${textGen.isNull};
        |ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = (ArrayData) $self.encode(${textGen.value});
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  /** The per-document encode loop both eval paths call. */
  def encode(text: UTF8String): GenericArrayData = {
    val toks = RepetitionStats.splitTokens(text)
    val out = Array.newBuilder[AnyRef]
    toks.foreach { t =>
      val w = t.toString
      if (w.nonEmpty) {
        var syms: Array[String] = w.map(_.toString).toArray :+ "</w>"
        var mi = 0
        while (mi < merges.length && syms.length > 1) {
          val (a, b) = merges(mi)
          // left-to-right non-overlapping replace, same as training
          var found = false
          var i = 0
          while (!found && i < syms.length - 1) {
            found = syms(i) == a && syms(i + 1) == b
            i += 1
          }
          if (found) {
            val nb = Array.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                nb += (a + b); j += 2
              } else { nb += syms(j); j += 1 }
            }
            syms = nb.result()
          }
          mi += 1
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
    }
    new GenericArrayData(out.result())
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bpe"
}

