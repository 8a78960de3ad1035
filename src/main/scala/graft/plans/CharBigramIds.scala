package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-bigram IDS of a string, natively: `array<long>` where
  * element i is `cp(i) * 0x110000 + cp(i+1)` over code points — an
  * INJECTIVE pairing (0x110000 exceeds the Unicode code-point range),
  * so equality on ids IS equality on bigrams with no collision caveat.
  * One id per position (not distinct — consumers count occurrences).
  *
  * Contract shared with the oracle SQL
  * (`ascii(text[i]) * 1114112 + ascii(text[i+1])` over
  * `range(1, greatest(len-1, 1) + 1)`): a single-char doc yields
  * `[cp * 1114112]` (second char reads as 0), an empty doc `[0]`.
  *
  * Why native (the ShingleHashes argument over characters): the SQL
  * form pays two per-position `substring` string allocations feeding
  * `ascii` — measured at the 100× corpus the whole q94 ran 500 s with
  * string bigrams and was still explode-bound with substring+ascii
  * pairs; this kernel walks the code points of each document once with
  * zero allocation beyond the output array. */
case class CharBigramIds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_bigram_ids expects a string arg, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_bigram_ids"

  override def nullSafeEval(v: Any): Any =
    CharBigramIds.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharBigramIds.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharBigramIds =
    copy(child = newChild)
}

object CharBigramIds {
  private val Base = 1114112L // 0x110000, > any code point

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    if (len == 0) return new GenericArrayData(Array(0L))
    // collect code points once (surrogate-pair aware)
    var n = 0
    var i = 0
    while (i < len) { n += 1; i += Character.charCount(str.codePointAt(i)) }
    val cps = new Array[Int](n)
    i = 0; var k = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    if (n == 1) return new GenericArrayData(Array(cps(0) * Base))
    val out = new Array[Long](n - 1)
    var j = 0
    while (j < n - 1) { out(j) = cps(j) * Base + cps(j + 1); j += 1 }
    new GenericArrayData(out)
  }

  def charBigramIds(c: Column): Column =
    SqlBridge.column(CharBigramIds(SqlBridge.expression(c)))
}
