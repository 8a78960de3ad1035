package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** Per-document word-bigram repetition statistics in one native pass:
  * `struct(n_bigrams, n_distinct, top_cnt)` over a token array, where
  * `top_cnt` is the multiplicity of the most frequent bigram and
  * `n_distinct` the number of distinct bigrams.
  *
  * Why a custom expression (the [[CosineSim]] precedent): the signal is
  * pure per-row work, but the composable form needs a chain of
  * higher-order functions (`zip_with` → `array_sort` → index `filter` →
  * `zip_with`), and Spark evaluates HOF lambdas interpreted, outside
  * whole-stage codegen — measured ~4-5 s PER HOF PASS over 500k docs
  * (~30M bigrams), ~40 s for the chain; the explode + groupBy(doc,
  * bigram) form shuffles 30M string rows, 50.8 s. This expression hashes
  * adjacent word pairs to longs (no bigram string is ever built), sorts
  * the primitive array, and reads run lengths in one sweep — the whole
  * document costs one allocation of a long[] scratch. Equality of
  * bigrams is all the statistics need, so a 64-bit hash stands in for
  * the pair (within-doc collision odds ~1e-16 at corpus document
  * lengths); the DuckDB oracle counts real bigram strings and the
  * results hash-match, which exercises exactly that equivalence. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"repetition_stats expects array<string>, got ${t.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  /** Shared by interpreted eval and generated code. One long[] of pair
    * hashes, primitive sort, one run sweep. Word hashes are xxhash64
    * (Spark's own kernel) and pairs chain the second word's hash with
    * the first as seed — the same composition `xxhash64(a, b)` uses. */
  def compute(words: ArrayData): InternalRow = {
    val n = words.numElements()
    val m = math.max(n - 1, 0)
    val out = new Array[Any](3)
    out(0) = m.toLong
    if (m == 0) { out(1) = 0L; out(2) = 0L; return new GenericInternalRow(out) }
    val hs = new Array[Long](m)
    var prev = XxHash64Function.hash(words.getUTF8String(0), StringType, 42L)
    var i = 0
    while (i < m) {
      val w = words.getUTF8String(i + 1)
      val h = XxHash64Function.hash(w, StringType, 42L)
      hs(i) = XxHash64Function.hash(w, StringType, prev)
      prev = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    var distinct = 1L
    var top = 1L
    var run = 1L
    i = 1
    while (i < m) {
      if (hs(i) == hs(i - 1)) {
        run += 1
        if (run > top) top = run
      } else {
        distinct += 1
        run = 1
      }
      i += 1
    }
    out(1) = distinct
    out(2) = top
    new GenericInternalRow(out)
  }

  def repetitionStats(c: Column): Column =
    SqlBridge.column(RepetitionStats(SqlBridge.expression(c)))
}
