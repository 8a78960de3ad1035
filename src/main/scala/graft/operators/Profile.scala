package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality profiling: the per-column summary a pipeline computes
  * before trusting a new table drop — row count, null count, exact
  * distinct count per column — schema-driven, so it works on any
  * DataFrame without per-table code. */
object Profile {

  /** One row per profiled column: (column, n_rows, n_null, n_distinct).
    *
    * Single pass: ONE Aggregate node computes the global count plus a
    * (count, count distinct) pair per column; Spark plans the N exact
    * count-distincts as an Expand (each input row fans out N+1 ways,
    * one slice per distinct aggregate) feeding a partial-aggregated
    * hash agg — per-column distinct state, one scan. The 1-row × 2N+1
    * result then unpivots to N rows via `stack`. At a scale where an
    * N-way Expand of the fact table is too hot, swap the exact
    * count-distincts for approx_count_distinct — the q44 HLL path —
    * per profiled column (the trade the scaladoc of q44 documents). */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"), countDistinct(col(c)).as(s"__nd_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = columns
      .map(c => s"'$c', __n - `__nn_$c`, `__nd_$c`")
      .mkString(", ")
    one.select(col("__n"), expr(
        s"stack(${columns.size}, $stackArgs) AS (column_name, n_null, n_distinct)"))
      .select(col("column_name"), col("__n").as("n_rows"),
        col("n_null"), col("n_distinct"))
      .orderBy("column_name")
  }

  /** q130: profile every lineitem column — the widest table in the
    * star schema, 11 columns of four types in one pass. */
  def q130ProfileLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    profile(li, li.columns.toSeq)
  }
}
