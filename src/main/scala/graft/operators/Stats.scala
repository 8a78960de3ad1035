package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Statistical analysis operators — the hypothesis-testing /
  * association layer over the same collapsed aggregates the monitoring
  * queries (q80/q113/q125/q126) build on. Everything reduces the corpus
  * to a bounded summary FIRST (contingency cells, co-moments, daily
  * series), so the statistics run on O(categories²) / O(columns²) /
  * O(types × days) rows regardless of corpus size. */
object Stats {

  /** q134: χ² test of independence between two categorical columns
    * (lang × source over documents) — "is the language mix the same
    * across sources?", the first question a mix planner asks before
    * trusting per-source language quotas. One partial-aggregated
    * count per (lang, source) cell; expected counts come from the
    * row/column marginals of the SAME cell table (two tiny re-groups +
    * broadcast joins), so the corpus is scanned exactly once. The
    * statistic sums over O(|langs|·|sources|) cells. */
  def q134ChiSquare(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).cast("double").as("n"))
    val total = cells.agg(sum("n").as("t"))
    val rowM = cells.groupBy("lang").agg(sum("n").as("rn"))
    val colM = cells.groupBy("source").agg(sum("n").as("sn"))
    cells
      .join(broadcast(rowM), "lang")
      .join(broadcast(colM), "source")
      .crossJoin(broadcast(total))
      .select(((col("n") - col("rn") * col("sn") / col("t")) *
        (col("n") - col("rn") * col("sn") / col("t")) /
        (col("rn") * col("sn") / col("t"))).as("term"))
      .agg(round(sum("term"), 6).as("chi2"),
        count(lit(1)).as("n_cells"))
  }

  /** q135: Pearson correlation matrix over lineitem's measure columns —
    * the feature-redundancy screen run before any modeling step. ONE
    * Aggregate computes all pairwise `corr` co-moments in a single
    * scan (each is O(1) state), then `stack` unpivots the 1-row result
    * to the (c1, c2, r) triangle. Rounded to 4 dp — the q52
    * moment-aggregate contract (co-moment summation order differs
    * across engines at the last ulp; 6 dp would race it). */
  def q135CorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for (i <- cols.indices; j <- i + 1 until cols.length)
      yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 4).as(s"__c_${a}_$b")
    }
    val one = Tables.lineitem(spark, dir).agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.map { case (a, b) => s"'$a', '$b', `__c_${a}_$b`" }
      .mkString(", ")
    one.select(expr(s"stack(${pairs.size}, $stackArgs) AS (c1, c2, r)"))
      .orderBy("c1", "c2")
  }

  /** q136: median/MAD robust outlier detection on the daily per-type
    * value series — the heavy-tail-safe companion to q80's z-score (a
    * single spike inflates a mean and sigma; it barely moves a median
    * and MAD). Exact percentiles (the q51 contract) over the collapsed
    * O(types × days) series: one pass for the per-type median, one for
    * the MAD, broadcast back; a day flags when |x − med| > 3 · MAD
    * (and MAD > 0 — a constant series has no scale to exceed). Daily
    * sums and both statistics round at 6 dp before comparison (the
    * q113 convention). */
  def q136MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(round(sum("value"), 6).as("x"))
    val med = daily.groupBy("event_type")
      .agg(round(expr("percentile(x, 0.5)"), 6).as("med"))
    val mad = daily.join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(round(expr("percentile(abs(x - med), 0.5)"), 6).as("mad"))
    daily
      .join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .select(col("event_type"), col("day"), col("x"), col("med"), col("mad"),
        round(abs(col("x") - col("med")), 6).as("dev"),
        ((col("mad") > 0) &&
          (round(abs(col("x") - col("med")), 6) > lit(3.0) * col("mad")))
          .cast("long").as("is_outlier"))
      .orderBy("event_type", "day")
  }
}
