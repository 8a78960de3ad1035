package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.SqlBridge

/** Column wrappers over Spark's OWN bloom-filter expressions — the pair
  * Catalyst's runtime-filter injection (`InjectRuntimeFilter`) plants
  * inside joins, surfaced here so an operator can stage the same
  * sketch-prefilter-then-exact-confirm pattern EXPLICITLY in its plan
  * (q118): build one bloom over the small side, prefilter the big side
  * per-row with zero shuffle, and let the exact join see only the
  * survivors. Both expressions are codegen'd natives; the aggregate's
  * bits are order-independent ORs, so the sketch is deterministic for a
  * given item set regardless of partitioning. */
object Blooms {

  /** Aggregate a LONG column (hash your keys first — xxhash64) into one
    * serialized bloom filter of `numBits` bits sized for `items` keys. */
  def bloomAgg(c: Column, items: Long, numBits: Long): Column =
    SqlBridge.column(new BloomFilterAggregate(
      SqlBridge.expression(c), Literal(items), Literal(numBits))
      .toAggregateExpression())

  /** Per-row membership probe of a serialized bloom (no false
    * negatives; false positives at the sketch's fpp). `bloom` must be
    * foldable — a `lit(bytes)` broadcastable literal. */
  def mightContain(bloom: Column, value: Column): Column =
    SqlBridge.column(BloomFilterMightContain(
      SqlBridge.expression(bloom), SqlBridge.expression(value)))
}
