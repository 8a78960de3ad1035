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
  /** The driver's whole pipeline, session-agnostic (so the e2e test can
    * run it on the shared test session without the CLI's stop()):
    * text dir in → reference-format text sink out. Returns the
    * vocabulary row count. */
  def run(spark: SparkSession, in: String, out: String): Long = {
    val corpus = TextCorpus.read(spark, in).select(col("value").as("text"))
    val result = Embed.flagshipFromText(spark, corpus).cache()
    try {
      result
        .select(concat(
          col("word"), lit(","), col("token"), lit(","), col("count"),
          lit(",["), array_join(col("vector"), ","), lit("]")).as("value"))
        .write.mode("overwrite").text(out)
      result.count()
    } finally result.unpersist()
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: Word2VecDriver <inputDir> <outputDir>")
    val Array(in, out) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-word2vec")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = run(spark, in, out)
    println(s"[word2vec-driver] wrote $n vocabulary rows to $out")
    spark.stop()
  }
}
