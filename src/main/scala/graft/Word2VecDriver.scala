package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Embed
import graft.sources.TextCorpus

/** The reference's CLI, re-expressed: `sbt "runMain graft.Word2VecDriver
  * <inputDir> <outputDir>"` scans a directory of text files, runs the
  * full pipeline (tokenize → count → train one global Word2Vec → join →
  * encode), and writes the reference's exact output line format
  * `word,token,count,[v1,...,vN]` plus a `_SUCCESS` marker (reference
  * `Word2VecDriver.main`, `MapRedWord2Vec.scala:246-282`; line format
  * `README.md:22-23`). Hyperparameters tune via `--conf graft.w2v.*`
  * (see [[GraftConfig]]). */
object Word2VecDriver {
  /** The `--synonyms` report over a just-trained (word, vector) table:
    * top-k nearest words by cosine ([[Embed.synonyms]], the q41 plan),
    * one `word,cos_sim` line each — the cosine capability the reference
    * lost a point for (feedback.md:5), surfaced at its own entry point.
    * Locale-pinned fixed-point so the line grammar never varies. */
  def synonymLines(vocab: org.apache.spark.sql.DataFrame,
                   word: String, k: Int): Seq[String] =
    Embed.synonyms(vocab.select("word", "vector"), word, k)
      .collect()
      .map(r => String.format(java.util.Locale.ROOT, "%s,%.4f",
        r.getString(0), r.getDouble(1): java.lang.Double))
      .toSeq

  /** The driver's whole pipeline, session-agnostic (so the e2e test can
    * run it on the shared test session without the CLI's stop()):
    * text dir in → reference-format text sink out, plus the optional
    * synonyms report over the same fitted model (no refit). Returns the
    * vocabulary row count. */
  def run(spark: SparkSession, in: String, out: String,
          synonyms: Option[(String, Int)] = None): Long = {
    val corpus = TextCorpus.read(spark, in).select(col("value").as("text"))
    val result = Embed.flagshipFromText(spark, corpus).cache()
    try {
      result
        .select(concat(
          col("word"), lit(","), col("token"), lit(","), col("count"),
          lit(",["), array_join(col("vector"), ","), lit("]")).as("value"))
        .write.mode("overwrite").text(out)
      synonyms.foreach { case (word, k) =>
        synonymLines(result, word, k).foreach(l => println(s"[synonyms] $l"))
      }
      result.count()
    } finally result.unpersist()
  }

  /** CLI grammar, separated from `main` so the parse → forward path is
    * testable without building a session: two positionals plus an
    * optional `--synonyms word,k` anywhere in the arg list. */
  def parseArgs(args: Array[String]): (String, String, Option[(String, Int)]) = {
    var synonyms: Option[(String, Int)] = None
    val positional = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      if (args(i) == "--synonyms") {
        require(i + 1 < args.length, "--synonyms expects a word,k value")
        val parts = args(i + 1).split(",")
        val k = if (parts.length == 2) parts(1).toIntOption else None
        require(parts.length == 2 && k.exists(_ > 0),
          s"--synonyms expects word,k with k a positive int, got '${args(i + 1)}'")
        synonyms = Some((parts(0), k.get))
        i += 2
      } else { positional += args(i); i += 1 }
    }
    require(positional.length == 2,
      "usage: Word2VecDriver <inputDir> <outputDir> [--synonyms word,k]")
    (positional(0), positional(1), synonyms)
  }

  /** Everything `main` does after session construction: parse the raw
    * args and forward them — including the synonyms option — to [[run]].
    * The e2e test drives this entry so a parsed-but-dropped flag can't
    * pass the suite while being dead at the real command line. */
  def execute(spark: SparkSession, args: Array[String]): Long = {
    val (in, out, synonyms) = parseArgs(args)
    val n = run(spark, in, out, synonyms)
    println(s"[word2vec-driver] wrote $n vocabulary rows to $out")
    n
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-word2vec")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    execute(spark, args)
    spark.stop()
  }
}
