package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary: at most [[MisraGries.K]] counters
  * plus the total item count. The classic guarantee holds per summary and
  * survives merging (Agarwal et al., "Mergeable Summaries", PODS '12):
  * every counter underestimates its item's true count by at most
  * n/(K+1), so any item with true count &gt; n/(K+1) is PRESENT in the
  * final summary. */
case class MgBuf(items: Map[String, Long], n: Long)

/** Heavy-hitter candidate generator as a typed mergeable `Aggregator` —
  * the sketch half of the q109 sketch-shortlist + exact-rescore pattern.
  *
  * Why a sketch at all: an exact token groupBy shuffles one record per
  * DISTINCT token — at 100 TB that is a billions-of-keys exchange just
  * to find the handful of dominant items. The MG summary is O(K) per
  * partition regardless of row or key count, partial-aggregates
  * map-side like any other Aggregator buffer, and the driver receives
  * ONE ≤K-entry map. The exact rescore pass then touches only rows whose
  * token is in the shortlist (a pushed-down IN filter), so the wide
  * shuffle never happens.
  *
  * Correctness contract (why the final answer is still EXACT and
  * deterministic even though MG itself is order-sensitive): the summary
  * may contain arbitrary extra items depending on merge order, but it
  * provably contains every item with count &gt; n/(K+1). q109 rescores the
  * shortlist exactly and keeps items with cnt·32 &gt; n; since
  * n/32 &gt; n/(K+1) for K = 64, qualifying items are always shortlisted
  * and order-dependent extras are filtered out by the exact threshold —
  * the output is the same rows an exact full groupBy would produce.
  *
  * The reduce step's decrement-all path is O(K) but fires at most once
  * per n/(K+1) rows amortized; merge subtracts the (K+1)-th largest
  * counter value (the mergeable-summaries rule), which preserves the
  * error bound additively across partitions. */
object MisraGries extends Aggregator[String, MgBuf, MgBuf] {
  /** Counter capacity: error ≤ n/65, comfortably under q109's n/32
    * reporting threshold. */
  val K = 64

  override def zero: MgBuf = MgBuf(Map.empty, 0L)

  override def reduce(b: MgBuf, w: String): MgBuf = {
    if (w == null) return b
    val m = b.items
    m.get(w) match {
      case Some(c) => MgBuf(m.updated(w, c + 1), b.n + 1)
      case None if m.size < K => MgBuf(m.updated(w, 1L), b.n + 1)
      case None =>
        // full and unseen: decrement every counter, drop zeros — the
        // textbook MG step; w itself is "absorbed" by the decrement
        MgBuf(m.collect { case (k, c) if c > 1 => k -> (c - 1) }, b.n + 1)
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    if (a.n == 0L) return b
    if (b.n == 0L) return a
    val sum = b.items.foldLeft(a.items) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= K) MgBuf(sum, a.n + b.n)
    else {
      // subtract the (K+1)-th largest counter from all, keep positives:
      // at most K survive and each counter lost ≤ that value, keeping
      // the summed error within (n_a + n_b)/(K+1)
      val cut = sum.values.toArray.sortBy(-_).apply(K)
      MgBuf(sum.collect { case (k, c) if c > cut => k -> (c - cut) }, a.n + b.n)
    }
  }

  override def finish(r: MgBuf): MgBuf = r

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
}
