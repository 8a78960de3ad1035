package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE segmentation: word string -> array of subword tokens by
  * rank-order application of a fixed merge table
  * ([[graft.operators.Bpe.encode]] semantics, shared helper).
  *
  * The merge table rides along as a bound reference object — generated
  * code calls back into [[doEncode]] on this instance (the same pattern
  * Spark's regexp expressions use for their compiled patterns), so the
  * expression stays inside WholeStageCodegen without re-materializing
  * the table per row. A HOF formulation would need an unbounded
  * while-loop, which the HOF algebra cannot express.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string arg, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(v: Any): Any = doEncode(v.asInstanceOf[UTF8String])

  def doEncode(s: UTF8String): ArrayData = {
    val toks = graft.operators.Bpe.encode(s.toString, mergeArr)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.doEncode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def bpe(c: Column, merges: Seq[(String, String)]): Column =
    SqlBridge.column(BpeEncode(SqlBridge.expression(c), merges))
}
