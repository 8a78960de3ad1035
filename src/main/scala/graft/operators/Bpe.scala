package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Corpus-trained byte-pair encoding — the Spark-native closure of the
  * R6 divergence (the reference encodes with a FROZEN pretrained BPE,
  * cl100k_base via JTokkit — `MapRedWord2Vec.scala:69-70,170`; that jar
  * is unavailable offline, so round 1 substituted a polynomial hash).
  * This module supplies the missing piece with public-knowledge
  * algorithmics (Sennrich et al., "Neural Machine Translation of Rare
  * Words with Subword Units", ACL 2016):
  *
  *  - [[train]]: learn merge rules FROM the corpus. The corpus-scale
  *    work — tokenize + word-frequency aggregation — is a distributed
  *    group-by; rule learning then operates on the bounded top-`maxVocab`
  *    frequency summary, the same split every production BPE trainer
  *    uses (the histogram, not the corpus, drives the merge loop).
  *  - [[encode]]: greedy subword segmentation by applying merges in
  *    rank order. Because a merge's two sides always have strictly
  *    lower ranks than the merge itself, sequential rank-order
  *    application with left-to-right non-overlapping replacement is
  *    equivalent to the lowest-rank-first greedy loop — and, unlike the
  *    greedy loop, it is reproducible in DuckDB as a chain of string
  *    `replace` calls over delimiter-wrapped tokens (the q56 oracle).
  *  - [[pretrainedMerges]]: a frozen merge table trained by [[train]]
  *    on the sf0.1 documents corpus — the engine's analogue of shipping
  *    cl100k_base as a versioned artifact. The declared encode query
  *    uses the frozen table so its semantics are scale-invariant;
  *    [[q57BpeTrain]] exercises live training on whatever corpus it is
  *    pointed at.
  */
object Bpe {

  // ------------------------------------------------------------------
  // training
  // ------------------------------------------------------------------

  /** Learn `numMerges` merge rules from a word-frequency histogram.
    * Deterministic: ties in pair frequency break on the lexicographic
    * (left, right) pair. Pure function — unit-testable without Spark. */
  def trainFromCounts(counts: Seq[(String, Long)], numMerges: Int): List[(String, String)] = {
    // segmentations as token vectors, weights merged for duplicate words
    var segs: Map[Vector[String], Long] = counts
      .groupMapReduce(_._1)(_._2)(_ + _)
      .map { case (w, c) => w.map(_.toString).toVector -> c }
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((seg, c) <- segs; i <- 0 until seg.length - 1) {
        val p = (seg(i), seg(i + 1))
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        segs = segs.toSeq
          .map { case (seg, c) => mergeOnce(seg, best._1, best._2) -> c }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    merges.toList
  }

  /** One left-to-right non-overlapping replacement pass of (l, r) -> lr. */
  private[operators] def mergeOnce(seg: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < seg.length) {
      if (i + 1 < seg.length && seg(i) == l && seg(i + 1) == r) {
        out += (l + r); i += 2
      } else {
        out += seg(i); i += 1
      }
    }
    out.result()
  }

  /** Spark-native training entry: distributed tokenize + word count,
    * bounded top-`maxVocab` histogram (deterministic order: count desc,
    * word asc), then [[trainFromCounts]]. The collect is the bounded
    * vocabulary summary — index metadata, not corpus data. */
  def train(docs: DataFrame, textCol: String, numMerges: Int, maxVocab: Int = 65536): List[(String, String)] = {
    val counts = docs
      .select(explode(Portable.tokenize(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("word"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainFromCounts(counts, numMerges)
  }

  // ------------------------------------------------------------------
  // encoding
  // ------------------------------------------------------------------

  /** Greedy BPE segmentation: apply each merge in rank order with one
    * left-to-right non-overlapping pass (see object scaladoc for why
    * this equals lowest-rank-first greedy; the equivalence is
    * property-tested against a priority-greedy reference in BpeSpec). */
  def encode(word: String, merges: Array[(String, String)]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var seg: Vector[String] = word.map(_.toString).toVector
    var m = 0
    while (m < merges.length && seg.length > 1) {
      seg = mergeOnce(seg, merges(m)._1, merges(m)._2)
      m += 1
    }
    seg.toArray
  }

  // ------------------------------------------------------------------
  // frozen artifact + declared queries
  // ------------------------------------------------------------------

  /** Frozen merge table: `train(documents @ sf0.1, numMerges = 24)`.
    * Inlined as constants (like [[Dedup.minhashBands]] /
    * [[Dedup.simhashPlanes]]) so the declared encode query and its
    * DuckDB oracle share it verbatim and the query's semantics do not
    * drift with the input scale. Regenerate with [[train]] if the
    * corpus distribution materially changes. */
  val pretrainedMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "r"), ("s", "t"), ("o", "w"), ("t", "a"),
    ("l", "u"), ("m", "er"), ("a", "r"), ("p", "ar"), ("u", "p"), ("par", "k"),
    ("s", "park"), ("d", "ow"), ("in", "dow"), ("w", "indow"), ("g", "e"),
    ("mer", "ge"), ("b", "l"), ("bl", "e"), ("ta", "ble"), ("c", "o"),
    ("co", "lu"), ("colu", "m"))

  /** q56: encode every distinct corpus word with the frozen merge
    * table — (word, subword tokens, token count). Multi-token outputs
    * by construction (the merge budget is far below full-word
    * saturation). */
  def q56BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.BpeEncode
    Tables.documents(spark, dir)
      .select(explode(Portable.tokenize(col("text"))).as("word"))
      .distinct()
      .select(col("word"), BpeEncode.bpe(col("word"), pretrainedMerges).as("toks"))
      .select(col("word"),
        array_join(col("toks"), " ").as("tokens"),
        size(col("toks")).cast("long").as("n_tokens"))
      .orderBy("word")
  }

  /** q57 (rows-only): live Spark-native training on the given corpus —
    * the learned merge table as (rank, left, right, merged). The result
    * is a bounded training summary (numMerges rows), exactly the class
    * of driver-resident metadata the IVF centroid table is. No SQL
    * oracle: iterative argmax training is not expressible as a single
    * DuckDB query; correctness is covered by BpeSpec's hand-computed
    * fixtures and the frozen-table provenance test. */
  def q57BpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val merges = train(Tables.documents(spark, dir), "text", numMerges = 24)
    merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r, l + r) }
      .toDF("rank", "left", "right", "merged")
  }

  /** q87: tokenizer fertility by language — subword tokens per word and
    * bytes per subword token, the standard multilingual tokenizer-
    * efficiency report (a language whose fertility is 2× pays 2× the
    * sequence length for the same text, which is a data-mix and cost
    * input, not a curiosity).
    *
    * Scale shape: the corpus is never BPE-encoded row by row — the
    * frozen tokenizer runs once per DISTINCT word (the q56 rationale:
    * vocabulary ≪ occurrences) and occurrences probe the encoded
    * vocabulary through a size-guarded broadcast join
    * ([[Guard.modelBroadcast]] — vocabulary is corpus-derived, so at
    * web scale the hint must be allowed to degrade to a shuffle join).
    * One explode scan + one vocab aggregate + one O(sources) rollup. */
  def q87TokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.BpeEncode
    val words = Tables.documents(spark, dir)
      .select(col("lang"), explode(Portable.tokenize(col("text"))).as("word"))
    // Materialize the encoded vocabulary ONCE: without the checkpoint,
    // the guard's row count and the broadcast build each re-run the
    // explode + distinct + encode subtree (3 executions — measured 36 s
    // at the 100× corpus; ~14 s with it). Model-sized blocks, the
    // memoized-LM-fit precedent.
    val enc = words.select("word").distinct()
      .select(col("word"),
        size(BpeEncode.bpe(col("word"), pretrainedMerges)).cast("long").as("n_sub"),
        length(col("word")).cast("long").as("n_chars"))
      .localCheckpoint(true)
    words.join(Guard.modelBroadcast(enc, knownCount = Some(enc.count())), "word")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_words"),
        sum("n_sub").as("n_subtokens"),
        round(sum("n_sub") * lit(1.0) / count(lit(1)), 6).as("fertility"),
        round(sum("n_chars") * lit(1.0) / sum("n_sub"), 6).as("bytes_per_token"))
      .orderBy("lang")
  }
}
