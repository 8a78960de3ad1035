package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-guarded broadcast hints for model-side tables.
  *
  * A document-frequency table, a unigram/bigram LM, or any other table
  * DERIVED FROM the corpus grows with the corpus: trivially broadcastable
  * at sf0.1, but at a true web-scale corpus the vocabulary is billions of
  * rows and an unconditional `broadcast()` hint OOMs the driver — the hint
  * overrides `spark.sql.autoBroadcastJoinThreshold`, so Spark has no
  * chance to save us. The guard makes the hint conditional: broadcast iff
  * the model's row count is under `graft.broadcast.maxModelRows`
  * (session-configurable, default 4M rows — comfortably under a ~1 GB
  * broadcast for (long, long/double) model rows); over the bound the
  * table is returned unhinted, so the join degrades to a shuffle join
  * (AQE may still pick broadcast from runtime byte sizes) instead of
  * failing.
  *
  * The count: callers that already materialized the model (the memoized
  * LM fit caches + counts its tables) pass `knownCount` and pay nothing.
  * Otherwise the model subtree is materialized ONCE via eager
  * `localCheckpoint` and counted from the checkpoint — without it the
  * guard's count and the broadcast (or join) build would each re-run
  * the whole model aggregation (measured on q87's encoded vocabulary at
  * the 100× corpus: 36 s unmaterialized vs 31 s checkpointed; the gap
  * is one full explode+distinct+encode pass). Over the bound, the
  * checkpointed table feeds the shuffle join — one materialization +
  * one shuffle instead of two subtree executions. Correctness is
  * identical on both branches (tested in ScaleSpec).
  */
object Guard {
  val maxModelRowsKey = "graft.broadcast.maxModelRows"
  val defaultMaxModelRows = 4000000L

  def modelBroadcast(df: DataFrame, knownCount: Option[Long] = None): DataFrame = {
    val bound = df.sparkSession.conf
      .getOption(maxModelRowsKey).map(_.toLong).getOrElse(defaultMaxModelRows)
    val (model, n) = knownCount match {
      case Some(c) => (df, c)
      case None =>
        val m = df.localCheckpoint(true)
        (m, m.count())
    }
    if (n <= bound) broadcast(model) else model
  }
}
