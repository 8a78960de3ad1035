package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Quantize

/** Streaming twin of the similarity-search surface: ONLINE retrieval,
  * where query vectors arrive as a stream and the corpus is the static,
  * pre-quantized side.
  *
  * Shape: the inverse of ingest-time dedup (q73's twin) — there the
  * corpus index was the broadcast side and documents streamed past it;
  * here each micro-batch of queries IS the broadcast-sized block (the
  * q84/q34 contract) and the signed corpus is scanned per batch. Ranking
  * needs per-query top-k windows, which Structured Streaming's
  * incremental planner cannot run on an unbounded stream — and should
  * not: a retrieval query is answered once, within its batch. So the
  * twin is a `foreachBatch` body (the [[EventStream]] idempotent-sink
  * precedent): each micro-batch runs the SAME two-stage core as batch
  * q84 ([[Quantize.bqTopK]] — Hamming shortlist over packed sign bits,
  * exact-cosine re-rank), so online answers are bit-identical to the
  * batch ones (StreamingSpec asserts parity row by row).
  *
  * Nothing is stateful: no watermark, no state store, nothing to
  * checkpoint but source offsets. The static corpus signatures are
  * computed once outside the stream ([[Quantize.binarySignatures]],
  * persisted or written as a table in production).
  */
object VecStream {

  /** `foreachBatch` body: answer one micro-batch of query vectors
    * (vec_id, v) against a static signed corpus (vec_id, v, b0..b3).
    * Returns q84's production columns (q_id, rank, n_id, hamming,
    * cos_sim) for the caller's sink:
    *
    * {{{
    *   queries.writeStream.foreachBatch { (batch, _) =>
    *     sink(VecStream.bqProbe(corpusSig, batch))
    *   }
    * }}}
    */
  def bqProbe(corpusSig: DataFrame, queryBatch: DataFrame,
              shortlistN: Int = 30, k: Int = 10): DataFrame =
    Quantize.bqTopK(corpusSig, Quantize.asQueryBlock(queryBatch), shortlistN, k)
      .select("q_id", "rank", "n_id", "hamming", "cos_sim")
}
