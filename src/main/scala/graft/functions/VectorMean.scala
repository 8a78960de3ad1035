package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Partial state for the distributed vector mean: running elementwise sum
  * and vector count. Starts empty and adopts the dimensionality of the
  * first vector seen, so dimension is carried by the data — eliminating the
  * reference's compile-time dim-10-test vs dim-100-prod mismatch
  * (reference `Test.scala:124-126`; SURVEY.md §7 hard part (c)). */
case class VecMeanBuf(sum: Array[Double], n: Long)

/** Grouped elementwise vector average as a typed `Aggregator` — the one
  * genuine custom aggregate in this engine (SURVEY.md §2.3 R12). The
  * reference hand-writes this in its reducer: accumulate Σ vector[i],
  * count vectors, divide (reference `MapRedWord2Vec.scala:193-238`).
  *
  * Spark's `Aggregator` gives the same partial/final split the Hadoop
  * combiner/reducer pair provides, but with Tungsten-encoded buffers and
  * automatic map-side partial aggregation — each executor reduces its
  * partition to one (sum, n) buffer per key before the shuffle, so shuffle
  * bytes are O(groups × dim), independent of row count. That is the 100 TB
  * story: the only full-data pass is the scan.
  *
  * Why NOT a `DeclarativeAggregate` (considered, rejected): HashAggregateExec
  * requires mutable fixed-width buffer fields, so an array&lt;double&gt;-buffered
  * declarative aggregate falls back to SortAggregateExec — an extra sort on
  * the grouping key per partition. The Aggregator/udaf form plans as
  * ObjectHashAggregateExec (asserted shape: partial ObjectHashAggregate →
  * exchange → final), which hashes instead of sorting. Nor would declarative
  * merge expressions fix FP merge-order sensitivity — merge ORDER is task
  * scheduling, not aggregate API. The oracle problem is instead solved
  * contractually: q50's declared output rounds the mean's norm to 4
  * decimals, far above reassociation noise (~1e-15 relative), which is why
  * it carries a DuckDB oracle despite the custom UDAF.
  */
object VectorMean extends Aggregator[Array[Double], VecMeanBuf, Array[Double]] {
  override def zero: VecMeanBuf = VecMeanBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecMeanBuf, v: Array[Double]): VecMeanBuf = {
    if (v == null) return b
    if (b.n == 0L) VecMeanBuf(v.clone(), 1L)
    else {
      val s = b.sum
      var i = 0
      while (i < s.length && i < v.length) { s(i) += v(i); i += 1 }
      VecMeanBuf(s, b.n + 1)
    }
  }

  override def merge(a: VecMeanBuf, b: VecMeanBuf): VecMeanBuf = {
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      val s = a.sum
      var i = 0
      while (i < s.length && i < b.sum.length) { s(i) += b.sum(i); i += 1 }
      VecMeanBuf(s, a.n + b.n)
    }
  }

  override def finish(r: VecMeanBuf): Array[Double] =
    if (r.n == 0L) null else r.sum.map(_ / r.n)

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
