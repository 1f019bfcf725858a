package graft.functions

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass char-trigram LM scoring: `struct(n_tri, lp_sum)` of a document
  * under a per-trigram log-prob model supplied as a foldable
  * `map<string,bigint>` literal (integer micro-units) with an `unseen`
  * fallback literal for out-of-model trigrams.
  *
  * Semantically identical to the relational form in
  * [[graft.pipeline.LanguageModel.charTrigramScore]]'s join path — same
  * normalization (`UTF8String.toLowerCase.trim`, the methods Spark's own
  * `lower`/`trim` call), same char-based `substringSQL` windows, and the
  * same integer micro-unit sum (order-free by construction), so results
  * are bit-identical; a spec pins the two paths against each other.
  *
  * Exists because the relational scoring pass explodes every document
  * into trigram rows and joins the model back — at 500k docs that is a
  * 150M-row Generate plus a join and a re-aggregation, for what is
  * per-row arithmetic. This expression keeps scoring at scan speed: the
  * model rides in the plan, nothing shuffles, and the same expression
  * serves batch and streaming ingest like the other one-pass expressions
  * ([[RepetitionStats]], [[BpeEncode]]).
  */
case class TrigramScore(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, MapType(StringType, LongType, _), LongType) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_trigram_score model and unseen units must be literals")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_trigram_score expects (string, map<string,bigint>, bigint), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = TrigramScore.schema
  override def nullable: Boolean = first.nullable

  @transient private lazy val model: JHashMap[UTF8String, java.lang.Long] = {
    val m = second.eval(null).asInstanceOf[MapData]
    val keys = m.keyArray()
    val vals = m.valueArray()
    val h = new JHashMap[UTF8String, java.lang.Long](m.numElements() * 2)
    var i = 0
    while (i < m.numElements()) {
      h.put(keys.getUTF8String(i).clone(), vals.getLong(i))
      i += 1
    }
    h
  }

  @transient private lazy val unseen: Long =
    third.eval(null).asInstanceOf[Long]

  override def nullSafeEval(textAny: Any, m: Any, u: Any): Any =
    TrigramScore.score(textAny, model, unseen)

  // real codegen: the model map and unseen constant are FOLDED driver-side
  // (they are literal children by contract) and ride as reference objects;
  // only the text child evaluates in the generated code, so the scoring
  // stage stays fused instead of interpreting the subtree per row
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("triModel", model, "java.util.HashMap")
    val sRef = ctx.addReferenceObj("triScore", TrigramScore,
      "graft.functions.TrigramScore$")
    val textGen = first.genCode(ctx)
    val code =
      code"""
        |${textGen.code}
        |boolean ${ev.isNull} = ${textGen.isNull};
        |InternalRow ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = (InternalRow) $sRef.score(${textGen.value}, $mRef, ${unseen}L);
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TrigramScore =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_trigram_score"
}

object TrigramScore {
  val schema: StructType = StructType(Seq(
    StructField("n_tri", LongType, nullable = false),
    StructField("lp_sum", LongType, nullable = false)))

  /** The shared one-pass scorer both expression forms call.
    *
    * Identical pipeline to trim(lower(text)): UTF8String's own lowercase
    * and space-trim, then char-based windows. The windows slice through a
    * code-point offset table computed ONCE — substringSQL walks from the
    * string start per call, which would make the loop O(chars²) per doc.
    */
  private[functions] def score(textAny: Any,
      model: JHashMap[UTF8String, java.lang.Long], unseen: Long): Any = {
    val s = textAny.asInstanceOf[UTF8String].toLowerCase.trim()
    val n = s.numChars()
    if (n < 3) return new GenericInternalRow(Array[Any](0L, 0L))
    val bytes = s.getBytes
    val offs = new Array[Int](n + 1)
    var c = 0
    var b = 0
    while (c < n) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(n) = bytes.length
    val nTri = n - 2
    var sum = 0L
    var i = 0
    while (i < nTri) {
      val tri = UTF8String.fromBytes(bytes, offs(i), offs(i + 3) - offs(i))
      val v = model.get(tri)
      sum += (if (v == null) unseen else v.longValue())
      i += 1
    }
    new GenericInternalRow(Array[Any](nTri.toLong, sum))
  }

  /** Build a JHashMap keyed by UTF8String from a driver-folded model. */
  private[graft] def toUtf8Map(
      m: Map[String, Long]): JHashMap[UTF8String, java.lang.Long] = {
    val h = new JHashMap[UTF8String, java.lang.Long](m.size * 2)
    m.foreach { case (k, v) => h.put(UTF8String.fromString(k), v) }
    h
  }
}

/** Broadcast-variable-backed twin of [[TrigramScore]]: same scorer, but the
  * model rides to executors as a Spark broadcast instead of a plan literal.
  *
  * Exists for LARGE models: a `typedLit` map is serialized into the task
  * binary of every stage that references the expression — multi-MB at the
  * model-gate ceiling — while a broadcast ships once per executor and the
  * plan carries only the handle. Bit-identical to the literal form by
  * construction (one shared [[TrigramScore.score]]); spec-pinned.
  */
case class TrigramScoreBcast(child: Expression,
    model: org.apache.spark.broadcast.Broadcast[JHashMap[UTF8String, java.lang.Long]],
    unseen: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case a => TypeCheckResult.TypeCheckFailure(
      s"graft_trigram_score_bcast expects string, got ${a.simpleString}")
  }

  override def dataType: DataType = TrigramScore.schema
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(textAny: Any): Any =
    TrigramScore.score(textAny, model.value, unseen)

  // real codegen: the broadcast handle rides as a reference object and is
  // dereferenced ONCE per generated-class instance (executor-side, in the
  // mutable-state initializer), not per row
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("triBcast", model,
      "org.apache.spark.broadcast.Broadcast")
    val mapVar = ctx.addMutableState("java.util.HashMap", "triBcastMap",
      v => s"$v = (java.util.HashMap) $bcRef.value();")
    val sRef = ctx.addReferenceObj("triScore", TrigramScore,
      "graft.functions.TrigramScore$")
    defineCodeGen(ctx, ev, c =>
      s"(InternalRow) $sRef.score($c, $mapVar, ${unseen}L)")
  }

  override protected def withNewChildInternal(c: Expression): TrigramScoreBcast =
    copy(child = c)

  override def prettyName: String = "graft_trigram_score_bcast"
}
