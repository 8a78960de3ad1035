package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/** Streaming surface over the documents corpus — the ingest-time twins
  * of the batch text-pipeline operators, for pipelines where the corpus
  * arrives incrementally (a crawl) instead of as a static table.
  */
object DocStream {

  /** The documents schema, declared (streaming sources cannot infer). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Open a documents parquet directory as a file stream. */
  def readStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(path)

  /** Streaming twin of the batch q59 line dedup: segment every arriving
    * document into 10-word pseudo-sentences (the SAME segmentation, via
    * [[TextAnalysis.segments]]) and keep each segment text only the
    * FIRST time it is seen across the whole stream. Emits the surviving
    * (doc_id, seg_idx, seg) rows; a downstream `groupBy(doc_id)` can
    * rebuild cleaned text exactly as the batch form does.
    *
    * Semantics vs batch: the batch winner is min(occ_key); the stream
    * keeps the ARRIVAL-first occurrence. When docs arrive in doc_id
    * order the two coincide (asserted in StreamingSpec). Within one
    * micro-batch `dropDuplicates` picks an arbitrary occurrence, so
    * exact batch parity needs id-ordered delivery — the contract a
    * crawl-ingest pipeline already satisfies with monotone doc ids.
    *
    * State contract, explicit: corpus-wide first-occurrence dedup is
    * inherently unbounded state (one record per distinct segment EVER —
    * same contract as the batch form's full-corpus window; at 100 TB,
    * state lives in RocksDB keyed by the segment, and the key should be
    * md5(seg) the way q30 hashes whole docs). A
    * `dropDuplicatesWithinWatermark` variant bounds state when the
    * pipeline only needs near-time dedup. */
  def lineDedup(docs: DataFrame): DataFrame =
    TextAnalysis.segments(docs)
      .select("doc_id", "seg_idx", "seg")
      .dropDuplicates("seg")
}
