package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("bm25: exact score on a hand-computed fixture") {
    // corpus: 3 docs, query term "spark". N=3, df=2, avgdl=(3+4+2)/3=3.
    // idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    // doc 0: tf=1, dl=3 -> ln(1.6)*2.2/(1 + 1.2*(0.25+0.75*3/3)) = ln(1.6)*2.2/2.2
    val docs = docsDf(Seq(
      (0L, "spark runs fast"),
      (1L, "spark spark all day"),
      (2L, "nothing here")))
    val got = Retrieval.bm25TopK(docs, Seq("spark"), 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val idf = math.log(1.6)
    val d0 = idf * (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * 3.0 / 3.0))
    val d1 = idf * (2.0 * 2.2) / (2.0 + 1.2 * (0.25 + 0.75 * 4.0 / 3.0))
    assert(got.keySet == Set(0L, 1L), "zero-score docs must be filtered out")
    assert(got(0L) == math.rint(d0 * 1e6) / 1e6 || math.abs(got(0L) - d0) < 1e-6)
    assert(got(1L) == math.rint(d1 * 1e6) / 1e6 || math.abs(got(1L) - d1) < 1e-6)
    assert(got(1L) > got(0L), "higher tf at comparable length must score higher")
  }

  test("bm25: length normalization demotes padded copies of the same tf") {
    val pad = Array.fill(60)("filler").mkString(" ")
    val docs = docsDf(Seq(
      (0L, "spark is neat"),
      (1L, s"spark is neat $pad")))
    val got = Retrieval.bm25TopK(docs, Seq("spark"), 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) > got(1L), "same tf in a longer doc must score lower")
  }

  test("bm25: multi-term scores sum and rare terms outweigh common ones") {
    val docs = docsDf(Seq(
      (0L, "common common common rare"),
      (1L, "common common common common"),
      (2L, "common other words here"),
      (3L, "unrelated text entirely")))
    val got = Retrieval.bm25TopK(docs, Seq("common", "rare"), 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) > got(1L), "the doc holding the rare term must rank first")
    assert(!got.contains(3L))
  }

  test("q95 plan: corpus never shuffles — stats join is broadcast, top-k is TakeOrdered") {
    val plan = SparkEntry.queries("q95_bm25")(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"one-row stats must reach the corpus by broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the corpus must not shuffle or self-pair:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be TakeOrderedAndProject, not a full sort:\n$plan")
  }

  test("q96 hybrid RRF: an identical text+embedding twin fuses to rank 1") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rrf").toString
    val texts = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // query doc
      (1L, "alpha beta gamma delta epsilon zeta"), // twin: same tokens
      (2L, "alpha beta unrelated words in here"),
      (3L, "completely different vocabulary set"),
      (4L, "another far away document text"))
    texts.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    // embeddings: doc 1 = exact copy of doc 0's vector; others rotated away
    def vec(seed: Int) = Array.tabulate(64)(j =>
      math.sin(seed * 7.3 + j * 0.91).toFloat)
    Seq((0L, vec(0)), (1L, vec(0)), (2L, vec(5)), (3L, vec(9)), (4L, vec(13)))
      .toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q96_hybrid_rrf")(spark, dir).collect()
    val q0 = out.filter(_.getLong(0) == 0L)
    assert(q0.nonEmpty)
    val top = q0.minBy(_.getLong(1))
    assert(top.getLong(2) == 1L, s"the twin must fuse to rank 1: ${q0.mkString("; ")}")
    assert(top.getLong(4) == 1L && top.getLong(5) == 1L,
      "the twin must lead both the dense and the lexical ranking")
  }

  test("q96 plan: query block broadcasts; corpus never shuffles into the pairing") {
    val plan = SparkEntry.queries("q96_hybrid_rrf")(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query block must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"corpus must never pair with itself unbounded:\n$plan")
  }
}
