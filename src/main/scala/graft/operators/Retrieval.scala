package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.CosineSim

/** Text retrieval over the documents/embeddings tables: exact BM25
  * lexical scoring and lexical+dense hybrid fusion — the query-side
  * complement of the corpus-side dedup/similarity family. A training-data
  * pipeline needs these for eval-set mining, targeted corpus probes
  * ("find everything about X") and RAG-style data curation.
  *
  * Scale design: BM25 here is the SEARCH shape, not the index-build
  * shape — per-document term frequencies come from a single projection
  * over the corpus scan (`filter` HOF per query term, no explode, no
  * shuffle of the corpus), and the only exchanges are a one-row global
  * statistics aggregate (N, avgdl, per-term df) broadcast back and the
  * final top-k TakeOrderedAndProject. At 100 TB the scan dominates and
  * nothing else grows: no O(corpus) shuffle, no state. Hybrid fusion
  * ranks a broadcast query block against the corpus (the q34 contract)
  * and fuses the two rankings positionally, so its cost is the two
  * scoring passes plus two per-query windows over candidate rows.
  */
object Retrieval {

  /** Okapi BM25 with the Lucene idf variant: ln(1 + (N-df+0.5)/(df+0.5)).
    * Non-negative for any df, so a term in every document contributes 0
    * rather than a negative score.
    *
    * The constants appear as the literals 2.2 (= k1+1), 1.2, 0.25
    * (= 1-b) and 0.75 in BOTH engines rather than as computed
    * expressions: `1.2 + 1.0` in one engine vs the literal `2.2` in the
    * other can differ by one ulp (the exact sum ties between two
    * doubles), and a one-ulp difference upstream of `round(..., 6)` can
    * flip a digit. Literal decimal → nearest-double is identical
    * everywhere. */

  /** Whitespace tokens — the corpus' native token grammar (q01's split). */
  private def toks(c: Column): Column =
    filter(split(coalesce(c, lit("")), " "), w => w =!= "")

  /** q95: exact BM25 top-20 for a fixed conjunctive-OR query. One corpus
    * scan computes per-doc length and per-term tf (array-HOF counts —
    * no generator, so the doc-level projections are safe); a one-row
    * global stats aggregate (N, avgdl, df per term) is cross-joined back
    * broadcast; the ranked result is a TakeOrderedAndProject. Scores are
    * rounded to 6 before ranking so ties break identically in the oracle. */
  def q95Bm25(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.documents(spark, dir), Seq("spark", "join", "stream"), 20)

  /** Library API: BM25 top-k of `terms` over a (doc_id, text) table. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks(col("text")), w => w === t)).cast("double").as(s"tf_$i")
    }
    val perDoc = docs.select(
      (col("doc_id") +: size(toks(col("text"))).cast("double").as("dl") +: tfCols): _*)
    // one row: corpus size, average doc length, document frequency per term
    val statAggs = count(lit(1)).cast("double").as("n_docs") +:
      avg(col("dl")).as("avgdl") +:
      terms.indices.map(i => sum(when(col(s"tf_$i") > 0, 1.0).otherwise(0.0)).as(s"df_$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val score = terms.indices.map { i =>
      val idf = log(lit(1.0) + (col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
      val tf = col(s"tf_$i")
      idf * (tf * 2.2) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("bm25"))
      .filter(col("bm25") > 0)
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(k)
  }

  /** q96: hybrid retrieval — for each query doc (doc_id < 10, must have
    * an embedding), rank every other doc that has both text and an
    * embedding by (a) dense cosine between embeddings and (b) lexical
    * token-set Jaccard between texts, then fuse with reciprocal-rank
    * fusion: rrf = 1/(60+r_dense) + 1/(60+r_lex). Top-10 fused per query.
    *
    * Both component scores are rounded to 6 before their rank windows and
    * rank ties break on doc_id, so the fused ordering is engine-portable.
    * The query block is 10 rows broadcast twice (once per modality);
    * the corpus is scanned once per modality and never shuffled — the
    * windows partition by q_id over candidate rows only. */
  def q96HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val rrfK = 60.0
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(toks(col("text"))).as("tset"))
    val embs = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("embedding").cast("array<double>").as("v"))
    val corpus = docs.join(embs, "doc_id")
    val qblock = broadcast(corpus.filter(col("doc_id") < 10)
      .select(col("doc_id").as("q_id"), col("tset").as("q_tset"), col("v").as("qv")))
    val scored = corpus.crossJoin(qblock)
      .filter(col("doc_id") =!= col("q_id"))
      .select(col("q_id"), col("doc_id"),
        round(CosineSim.cosine(col("qv"), col("v")), 6).as("cos_sim"),
        round(size(array_intersect(col("tset"), col("q_tset"))).cast("double") /
          greatest(size(array_union(col("tset"), col("q_tset"))), lit(1)), 6).as("jaccard"))
    val dw = Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("doc_id"))
    val lw = Window.partitionBy("q_id").orderBy(desc("jaccard"), asc("doc_id"))
    val fused = scored
      .withColumn("r_dense", row_number().over(dw).cast("long"))
      .withColumn("r_lex", row_number().over(lw).cast("long"))
      .withColumn("rrf",
        round(lit(1.0) / (lit(rrfK) + col("r_dense")) + lit(1.0) / (lit(rrfK) + col("r_lex")), 6))
    val fw = Window.partitionBy("q_id").orderBy(desc("rrf"), asc("doc_id"))
    fused.withColumn("rank", row_number().over(fw).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "rank", "doc_id", "rrf", "r_dense", "r_lex")
      .orderBy("q_id", "rank")
  }
}
