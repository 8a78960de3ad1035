package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** q72: the end-to-end training-data FUNNEL — the composition story.
  * Every stage is one of the engine's declared operators applied with
  * true pipeline semantics (each stage acts on the SURVIVORS of the
  * previous one, not independently):
  *
  *   raw → quality (q37 score ≥ 0.6) → repetition (q65 keep)
  *       → exact dedup (q30's md5, canonical = first survivor)
  *       → stratified sample (q66 rates) → source cap (q67, ≤ 15)
  *
  * Output is the funnel report: docs and whitespace tokens surviving
  * each stage — the table every dataset card publishes.
  *
  * Composition is flag algebra over ONE scan: each stage is a boolean
  * column defined from the previous, so the plan is one pass of
  * per-row signals plus two rank windows (dedup group, source cap) and
  * one final tiny aggregate. The rank windows order by
  * (previous-stage-pass DESC, tiebreak) — "rank among SURVIVORS". For
  * the md5 window this is vacuous-by-construction (identical text ⇒
  * identical flags; kept for form), but for the SOURCE CAP it is the
  * semantics: a source's 15 slots go to surviving docs, not to
  * already-filtered ones — ranking the raw source and intersecting
  * with the filters would waste cap slots on dropped docs and
  * under-fill the source (asserted in QueriesSpec). */
object Funnel {

  def q72Funnel(spark: SparkSession, dir: String): DataFrame = {
    val words = Portable.tokenize(col("text"))
    val nAlpha = size(words).cast("long")
    val denom = greatest(size(words), lit(1)).cast("double")
    val quality =
      least(size(array_distinct(words)).cast("double") / denom * 2.0, lit(1.0)) * 0.5 +
        when(nAlpha.between(20, 400), 0.3).otherwise(0.0) +
        least(size(filter(words, w => w.isin(TextAnalysis.stopwords: _*)))
          .cast("double") / denom * 3.0, lit(0.2))
    val rate = TextAnalysis.sampleRatePerMille.foldLeft(lit(0L)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }

    val sig = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_ws"),
        round(quality, 6).as("quality"),
        graft.plans.RepetitionStats.repetitionStats(split(col("text"), " ")).as("st"),
        md5(col("text")).as("content_md5"),
        (Portable.tokenId(col("text")) % 1000L).as("bucket"),
        Portable.tokenId(col("text")).as("prio"))
      .withColumn("s1", col("quality") >= 0.6)
      .withColumn("rep_keep",
        col("st.n_bigrams") > 0L &&
          col("st.top_cnt").cast("double") / col("st.n_bigrams") <= 0.1 &&
          lit(1.0) - col("st.n_distinct").cast("double") / col("st.n_bigrams") <= 0.1)
      .withColumn("s2", col("s1") && col("rep_keep"))

    val dedupRank = row_number().over(Window.partitionBy("content_md5")
      .orderBy(col("s2").cast("int").desc, col("doc_id")))
    val withS3 = sig.withColumn("s3", col("s2") && dedupRank === 1)
      .withColumn("s4", col("s3") && col("bucket") < rate)
    val capRank = row_number().over(Window.partitionBy("source")
      .orderBy(col("s4").cast("int").desc, col("prio"), col("doc_id")))
    val flagged = withS3.withColumn("s5", col("s4") && capRank <= 15)

    val names = Seq("raw", "quality", "repetition", "dedup", "sample", "source_cap")
    flagged
      .select(col("n_ws"), posexplode(array(
        lit(true), col("s1"), col("s2"), col("s3"), col("s4"), col("s5"))))
      .groupBy(col("pos").cast("long").as("stage"))
      .agg(
        sum(when(col("col"), 1L).otherwise(0L)).as("n_docs"),
        sum(when(col("col"), col("n_ws")).otherwise(0L)).as("n_tokens"))
      .withColumn("stage_name",
        element_at(array(names.map(lit): _*), (col("stage") + 1).cast("int")))
      .select("stage", "stage_name", "n_docs", "n_tokens")
      .orderBy("stage")
  }
}
