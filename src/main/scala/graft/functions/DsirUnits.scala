package graft.functions

import java.security.MessageDigest
import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass DSIR importance score (integer micro-units) of a document
  * under a per-bucket log-ratio model supplied as a foldable
  * `map<bigint,bigint>` literal — the scan-speed scoring stage of
  * [[graft.pipeline.Importance]] (Xie et al. 2023, public).
  *
  * Semantically identical to the reference HOF form
  * (`aggregate(featureGrams(text), 0L, acc + lr[bucket(gram)])`): the same
  * unigram+bigram feature stream in order (tokens via the `UTF8String`
  * lower/trim/regex-split backing `split(trim(lower(text)), "\\s+")`,
  * bigrams joined with one space), the same md5 bucket hash (first 7 hex
  * nibbles of md5(gram) as an integer, mod `buckets` — the minhash
  * base-hash idiom), and the same null algebra: null text → null, and a
  * gram whose bucket is MISSING from the model poisons the whole document
  * to null (`acc + null` propagation in the HOF), which callers coalesce
  * to 0. A missing bucket is unreachable when the model was folded from a
  * census of the same corpus — the census saw every gram by construction.
  *
  * Exists because the HOF form interprets its lambda per gram (md5 through
  * reflective expression eval), and the relational form explodes every
  * document into gram rows, shuffles them through a groupBy and joins the
  * scores back — at corpus scale that is a second full Generate + exchange
  * for what is per-row arithmetic. This expression keeps DSIR scoring
  * fused in the scan like its siblings [[TrigramScore]] /
  * [[RepetitionStats]]: the ~`buckets`-entry model rides in the plan,
  * nothing shuffles.
  */
case class DsirUnits(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, MapType(LongType, LongType, _), IntegerType) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_dsir_units model and bucket count must be literals")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_dsir_units expects (string, map<bigint,bigint>, int), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = LongType

  // null text OR a model miss (acc + null) returns null, like the HOF form
  override def nullable: Boolean = true

  @transient private lazy val model: JHashMap[java.lang.Long, java.lang.Long] = {
    val m = second.eval(null).asInstanceOf[MapData]
    val keys = m.keyArray()
    val vals = m.valueArray()
    val h = new JHashMap[java.lang.Long, java.lang.Long](m.numElements() * 2)
    var i = 0
    while (i < m.numElements()) {
      h.put(keys.getLong(i), vals.getLong(i))
      i += 1
    }
    h
  }

  @transient private lazy val buckets: Int =
    third.eval(null).asInstanceOf[Int]

  override def nullSafeEval(textAny: Any, m: Any, b: Any): Any =
    DsirUnits.score(textAny, model, buckets)

  // real codegen: the model map folds driver-side (literal child by
  // contract) and rides as a reference object; only the text child
  // evaluates in generated code, so scoring stays fused in the scan
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("dsirModel", model, "java.util.HashMap")
    val sRef = ctx.addReferenceObj("dsirScore", DsirUnits,
      "graft.functions.DsirUnits$")
    val textGen = first.genCode(ctx)
    val boxed = ctx.freshName("dsirBoxed")
    val code =
      code"""
        |${textGen.code}
        |boolean ${ev.isNull} = ${textGen.isNull};
        |long ${ev.value} = 0L;
        |if (!${ev.isNull}) {
        |  Object $boxed = $sRef.score(${textGen.value}, $mRef, ${buckets});
        |  if ($boxed == null) { ${ev.isNull} = true; }
        |  else { ${ev.value} = ((java.lang.Long) $boxed).longValue(); }
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): DsirUnits =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_dsir_units"
}

object DsirUnits {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val SpaceByte = Array[Byte](' ')

  /** Bucket of one digest: the first 7 hex nibbles of the md5 as an
    * integer (== `conv(substring(md5(g), 1, 7), 16, 10)`), mod buckets.
    * The 7-nibble value is the top 28 bits of the first 4 digest bytes.
    */
  private def bucketOf(d: Array[Byte], buckets: Int): Long = {
    val v = (((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
      ((d(2) & 0xff) << 8) | (d(3) & 0xff)) >>> 4
    (v.toLong) % buckets
  }

  /** The shared one-pass scorer both eval paths call. Returns a boxed Long
    * sum of per-gram model units, or null when any gram's bucket is absent
    * from the model (the HOF form's `acc + null` algebra).
    */
  private[functions] def score(textAny: Any,
      model: JHashMap[java.lang.Long, java.lang.Long],
      buckets: Int): java.lang.Long = {
    val toks = RepetitionStats.splitTokens(textAny.asInstanceOf[UTF8String])
    val md = md5Local.get()
    var acc = 0L
    var i = 0
    // unigrams then bigrams — same stream order as ngrams(1) ++ ngrams(2)
    // (order is irrelevant to the integer sum but kept for clarity)
    while (i < toks.length) {
      md.reset()
      val v = model.get(bucketOf(md.digest(toks(i).getBytes), buckets))
      if (v == null) return null
      acc += v.longValue()
      i += 1
    }
    i = 0
    while (i < toks.length - 1) {
      md.reset()
      md.update(toks(i).getBytes)
      md.update(SpaceByte)
      md.update(toks(i + 1).getBytes)
      val v = model.get(bucketOf(md.digest(), buckets))
      if (v == null) return null
      acc += v.longValue()
      i += 1
    }
    acc
  }
}
