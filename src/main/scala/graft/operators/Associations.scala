package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Association-rule mining over the order basket: which item groups
  * co-occur more often than chance. The analytics cousin of the n-gram
  * co-occurrence edges the text side builds (TextRank, triangles) —
  * here the "sentence" is an order and the "words" are the brands in
  * it. */
object Associations {

  /** q124: brand-level market-basket pairs with support and lift.
    *
    * Baskets are (order, brand) DISTINCT pairs (a brand bought twice in
    * one order is one basket membership). Pairs come from the basket
    * self-joined on the order key with `b1 < b2` — an equi-join both
    * sides of which are the SAME shuffle output, so the planner reuses
    * one exchange; per-order fanout is C(brands-in-order, 2), bounded
    * by order size. Support = pair orders / total orders; lift =
    * P(a,b) / (P(a)·P(b)) — the >1 region is where a recommender finds
    * signal.
    *
    * Scale shape: the pair groupBy's OUTPUT is O(|brands|²) = bounded
    * (300 rows at 25 brands, any SF), so partial aggregation collapses
    * the pair stream map-side and the exchange carries counters, not
    * pairs. The per-item counts and the scalar order total are bounded
    * broadcasts (the q109 shortlist contract). At the raw part-key
    * level the same plan holds but the output is no longer bounded —
    * that variant wants a min-support pre-prune on frequent ITEMS
    * first (the A-priori property: a pair can't beat support s if
    * either item doesn't), which this brand rollup gets for free. */
  def q124MarketBasket(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    val nOrders = baskets.select(countDistinct("okey").as("n_orders"))
    val items = baskets.groupBy(col("brand")).agg(count(lit(1)).as("cnt"))
    val pairs = baskets.select(col("okey"), col("brand").as("b1"))
      .join(baskets.select(col("okey"), col("brand").as("b2")), "okey")
      .filter(col("b1") < col("b2"))
      .groupBy("b1", "b2")
      .agg(count(lit(1)).as("n_pair"))
    pairs
      .join(broadcast(items.select(col("brand").as("b1"), col("cnt").as("cnt1"))), "b1")
      .join(broadcast(items.select(col("brand").as("b2"), col("cnt").as("cnt2"))), "b2")
      .crossJoin(broadcast(nOrders))
      .select(col("b1"), col("b2"), col("n_pair"),
        round(col("n_pair").cast("double") / col("n_orders"), 6).as("support"),
        round(col("n_pair").cast("double") * col("n_orders") /
          (col("cnt1") * col("cnt2")), 6).as("lift"))
      .orderBy("b1", "b2")
  }
}
