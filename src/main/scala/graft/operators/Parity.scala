package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable
import graft.plans.CosineSim

/** Reference-parity relational surface: the word-count half of the
  * reference job (R4, R5, R10, R11 — `MapRedWord2Vec.scala:99-118,193-238`),
  * the token-id encode (R6), the CSV output shaping (R7/R9), and the
  * grouped elementwise vector mean (R12) in its oracle-checkable
  * posexplode form.
  *
  * Scale notes: word count is scan → explode → partial hash agg → final
  * hash agg; Catalyst's partial aggregation collapses each task's words to
  * (word, count) before the shuffle — the role the reference's hand-rolled
  * in-mapper combiner plays (`MapRedWord2Vec.scala:89,107-112`) — so
  * shuffle volume is O(vocab), not O(tokens). At 100 TB, vocab ≪ corpus and
  * this plan is scan-bound, which is the right bound.
  */
object Parity {

  /** (word, cnt) over a text column, reference tokenizer semantics. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs
      .select(explode(Portable.tokenize(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** q01: full word count over documents, deterministically ordered. */
  def q01WordCount(spark: SparkSession, dir: String): DataFrame =
    wordCounts(Tables.documents(spark, dir).select("text"))
      .orderBy(desc("cnt"), asc("word"))

  /** q02: top-k words — Spark plans TakeOrderedAndProject, which takes the
    * per-partition top-k before the single-partition merge: no full sort,
    * no full shuffle, safe at any scale. */
  def q02WordCountTopK(spark: SparkSession, dir: String): DataFrame =
    wordCounts(Tables.documents(spark, dir).select("text"))
      .orderBy(desc("cnt"), asc("word"))
      .limit(25)

  /** q03: deterministic word -> token-id encode (R6 replacement). */
  def q03TokenEncode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(Portable.tokenize(col("text"))).as("word"))
      .distinct()
      .select(col("word"), Portable.tokenId(col("word")).as("token"))
      .orderBy("word")

  /** q04: the reference's flagship CSV line shape "word,token,count"
    * (R7 composite key + R9 value format, minus the run-dependent vector —
    * SURVEY.md §4.2 forbids golden-comparing vector values). Formatting is
    * a sink concern: data stays as typed columns until the final select. */
  def q04FlagshipFormat(spark: SparkSession, dir: String): DataFrame =
    wordCounts(Tables.documents(spark, dir).select("text"))
      .select(
        col("word"),
        Portable.tokenId(col("word")).as("token"),
        col("cnt"),
        concat_ws(",", col("word"), Portable.tokenId(col("word")), col("cnt")).as("line"))
      .orderBy("word")

  /** q05: grouped elementwise vector mean over embeddings, flattened to
    * (label, pos, avg_val) so the DuckDB oracle can hash-compare it (the
    * array-typed `Aggregator` twin is unit-tested — SURVEY.md §5.1).
    * posexplode → partial avg per (label, pos): shuffle is
    * O(labels × dim). */
  def q05VectorMean(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("p", "val")))
      .select(col("label"), col("p").cast("long").as("pos"), col("val"))
      .groupBy("label", "pos")
      .agg(round(avg("val"), 6).as("avg_val"))
      .orderBy("label", "pos")

  /** q50 (rows-only): the R12 vector mean through the genuine typed
    * Aggregator (partial/final split with Tungsten-encoded buffers —
    * the reference reducer's exact role). Output reports per-group
    * invariants (dim, rounded norm) because cross-partition merge order
    * makes raw mean bits run-dependent. */
  def q50VectorMeanAgg(spark: SparkSession, dir: String): DataFrame = {
    val mean = udaf(graft.functions.VectorMean)
    Tables.embeddings(spark, dir)
      .groupBy(col("label").cast("long").as("label"))
      .agg(mean(col("embedding").cast("array<double>")).as("mean_vec"),
        count(lit(1)).as("n_vectors"))
      .select(col("label"), col("n_vectors"),
        size(col("mean_vec")).cast("long").as("dim"),
        round(graft.functions.VectorOps.l2Norm(col("mean_vec")), 4).as("mean_norm"))
      .orderBy("label")
  }

  /** q06: cosine similarity between consecutive embeddings — the scalar
    * capability the reference lost a point for (X4, `feedback.md:5`).
    * Self-join on vec_id+1 is a broadcast-able equi-join on a key the scan
    * already sorted by. */
  def q06CosinePairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.as("a")
    val b = e.as("b")
    a.join(b, col("a.vec_id") + 1 === col("b.vec_id"))
      .select(
        col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        round(CosineSim.cosine(col("a.v"), col("b.v")), 6).as("cos_sim"))
      .orderBy("id_a")
  }
}
