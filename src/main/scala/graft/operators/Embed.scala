package graft.operators

import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Portable, VectorOps}
import graft.plans.CosineSim

/** The reference's ML macro-operator rebuilt Spark-first: one GLOBAL
  * distributed `ml.feature.Word2Vec` model instead of one DL4J model per
  * mapper (the reference's per-mapper models live in unaligned embedding
  * spaces, so averaging them is geometrically meaningless — SURVEY.md §4
  * quirk 1; reference `MapRedWord2Vec.scala:132-174`).
  *
  * Hyperparameters mirror the reference config
  * (`application.conf:3-7`): vectorSize=100, windowSize=5, maxIter=1,
  * minCount=1, seed=42.
  *
  * Outputs are never golden-compared on vector VALUES (multithreaded
  * training is run-dependent — SURVEY.md §4 quirk 2); flagship queries
  * expose invariants (dims, norms, vocab, counts) and the relational
  * join shape instead.
  */
object Embed {

  def tokensDF(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Portable.tokenize(col("text")).as("words"))

  /** Fitted vector tables memoized per (corpus dir, hyperparams):
    * several queries (flagship, q40, q41) share one training run per
    * process, the same way a production pipeline trains once and serves
    * many lookups. Hyperparameters come from [[graft.GraftConfig]] (the
    * reference's application.conf values by default, R3). */
  private val fitted =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]]())

  def fitWordVectors(spark: SparkSession, dir: String): DataFrame = {
    val cfg = graft.GraftConfig.from(spark)
    // weak-keyed by session: cached DataFrames are bound to the session
    // that built them, must not outlive it, and must not pin it
    val perSession = fitted.synchronized {
      Option(fitted.get(spark)).getOrElse {
        val m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        fitted.put(spark, m)
        m
      }
    }
    perSession.getOrElseUpdate(s"$dir|$cfg",
      fitWordVectorsFromTokens(spark, tokensDF(spark, dir)))
  }

  /** Train on any token-array DataFrame (column `words`). */
  def fitWordVectorsFromTokens(spark: SparkSession, tokensIn: DataFrame): DataFrame = {
    val cfg = graft.GraftConfig.from(spark)
    // Word2Vec makes several passes (vocab build + per-iteration
    // training); cache the tokenized corpus so the regexp tokenize
    // runs once, then release it after fit.
    val tokens = tokensIn.persist()
    val w2v = new Word2Vec()
      .setInputCol("words").setOutputCol("vec")
      .setVectorSize(cfg.layerSize).setWindowSize(cfg.windowSize)
      .setMaxIter(cfg.iterations).setMinCount(cfg.minWordFrequency)
      .setSeed(cfg.seed).setNumPartitions(cfg.numPartitions)
    val model = w2v.fit(tokens)
    val vectors = model.getVectors // (word: String, vector: ml.linalg.Vector)
      .select(col("word"), vector_to_array(col("vector")).as("vector"))
      .cache()
    vectors.count() // materialize before releasing the token cache
    tokens.unpersist()
    vectors
  }

  /** The full reference pipeline over an arbitrary text corpus (column
    * `text`): word counts ⋈ one global model → (word, token, count,
    * vector). The corpus-general core behind [[flagship]] and the
    * [[graft.Word2VecDriver]] CLI. */
  def flagshipFromText(spark: SparkSession, texts: DataFrame): DataFrame = {
    val counts = Parity.wordCounts(texts.select("text"))
    val vectors = fitWordVectorsFromTokens(spark,
      texts.select(Portable.tokenize(col("text")).as("words")))
    counts.join(vectors, "word")
      .select(
        col("word"),
        Portable.tokenId(col("word")).as("token"),
        col("cnt").as("count"),
        col("vector"))
      .orderBy("word")
  }

  /** The flagship parity pipeline (reference output shape
    * `word,token,count,[v1..v100]` — `README.md:22-23`): global word
    * counts ⋈ model vectors (inner join = the reference's null-vector
    * drop, R8), plus the token id. */
  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val counts = Parity.wordCounts(Tables.documents(spark, dir).select("text"))
    val vectors = fitWordVectors(spark, dir)
    counts.join(vectors, "word")
      .select(
        col("word"),
        Portable.tokenId(col("word")).as("token"),
        col("cnt").as("count"),
        col("vector"))
      .orderBy("word")
  }

  /** q40 (rows-only): flagship invariants — vector dim must equal the
    * configured layer size and norms must be positive finite. */
  def q40Word2VecVocab(spark: SparkSession, dir: String): DataFrame =
    flagship(spark, dir)
      .select(
        col("word"), col("token"), col("count"),
        size(col("vector")).cast("long").as("dim"),
        round(VectorOps.l2Norm(col("vector")), 4).as("norm"))
      .orderBy("word")

  /** Diagnostic for the flagship join's silent drop: the reference LOGS
    * words that got no vector before discarding them
    * (`MapRedWord2Vec.scala:160-164`); the engine's inner join drops
    * them silently. This left-anti twin restores the observability —
    * run it next to [[flagship]] to see exactly what the join lost.
    * @param counts (word, …) corpus word counts
    * @param vocab  (word, …) the vocabulary that DID get vectors */
  def droppedVocabulary(counts: DataFrame, vocab: DataFrame): DataFrame =
    counts.join(vocab.select("word"), Seq("word"), "left_anti")

  /** q58: dropped-vocabulary report under a frequency-thresholded
    * trainer — words whose count falls below 5% of the modal word count
    * (the deterministic vocab rule: Word2Vec's vocabulary is exactly
    * {word : cnt >= minCount}, so the anti-join is SQL-expressible even
    * though vector values are not). At the reference config
    * (minCount=1) the flagship drop set is empty — that invariant is
    * asserted in EmbedSpec; this declared query uses the relative
    * threshold so the report is non-trivial at every scale factor. */
  def q58DroppedVocab(spark: SparkSession, dir: String): DataFrame = {
    val counts = Parity.wordCounts(Tables.documents(spark, dir).select("text"))
    val maxCnt = counts.agg(max(col("cnt")).as("max_cnt"))
    val vocab = counts.crossJoin(broadcast(maxCnt))
      .filter(col("cnt") >= col("max_cnt") * 0.05)
      .select("word")
    droppedVocabulary(counts, vocab).orderBy("word")
  }

  /** Top-k cosine-similarity neighbors of `word` over any (word,
    * vector) table — the q41 plan parameterized, and what the CLI's
    * `--synonyms` flag prints: broadcast the query word's vector, scan
    * the vocab, TakeOrderedAndProject k. */
  def synonyms(vectors: DataFrame, word: String, k: Int): DataFrame = {
    val target = broadcast(vectors.filter(col("word") === word)
      .select(col("vector").as("target_vec")))
    vectors.crossJoin(target)
      .filter(col("word") =!= word)
      .select(col("word"),
        round(CosineSim.cosine(col("vector"), col("target_vec")), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("word"))
      .limit(k)
  }

  /** q41 (rows-only): cosine-similarity synonyms via the trained model —
    * the capability the reference was graded down for (X4,
    * `feedback.md:5`). Computed with the engine's own cosine expression
    * over the vector table (not model.findSynonyms) so the query is a
    * relational plan ([[synonyms]]). */
  def q41Synonyms(spark: SparkSession, dir: String): DataFrame =
    synonyms(fitWordVectors(spark, dir), "data", 10)
}
