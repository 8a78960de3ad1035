package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Usage examples for the library APIs that are not part of the declared
  * query surface — near-dup detection and ad-hoc vector search. Run with
  * `sbt "runMain graft.Examples"`. */
object Examples {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // near-duplicate detection over a corpus with planted dups
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tomorrow"),
      (3L, "catalyst plans exchanges and whole stage codegen spans"),
    ).toDF("id", "text")
    println("near-dup pairs (jaccard distance <= 0.4):")
    Dedup.approxNearDupPairs(docs, maxDistance = 0.4).orderBy("id_a", "id_b").show()

    // ad-hoc top-k cosine search against the embeddings table
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    println("top-5 cosine neighbors of vec 0:")
    Similarity.topKCosine(emb, query, 5).show()

    spark.stop()
  }
}
