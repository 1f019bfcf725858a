package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The 64 signed SimHash bits of a token — `array<int>` of ±1 — in one
  * md5 digest, replacing the interpreted 64-element HOF
  * (`transform(sequence(0,63), j -> instr/pow nibble arithmetic)`) that
  * derived them from the md5 HEX STRING.
  *
  * Bit-identical by construction: bit j of the hex-nibble formula
  * (`nibble(j/4) >> (3 − j%4) & 1`, hex chars MSB-first) IS bit
  * `7 − j%8` of digest byte `j/8` — the same 64 leading bits of the
  * digest, read MSB-first. A spec pins the equivalence against the
  * original column formula on random tokens, which is what keeps the
  * DuckDB oracle's identical nibble arithmetic in agreement.
  */
case class SimhashBits(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_bits expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SimhashBits.compute(input.asInstanceOf[UTF8String])

  // real codegen: one static call, stage stays fused
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("simhash", SimhashBits,
      "graft.functions.SimhashBits$")
    defineCodeGen(ctx, ev, c => s"$obj.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash_bits"
}

object SimhashBits {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def compute(tok: UTF8String): GenericArrayData = {
    val d = md.get()
    d.reset()
    val digest = d.digest(tok.getBytes)
    val bits = new Array[Any](64)
    var j = 0
    while (j < 64) {
      bits(j) = (((digest(j >> 3) >> (7 - (j & 7))) & 1) << 1) - 1
      j += 1
    }
    new GenericArrayData(bits)
  }
}
