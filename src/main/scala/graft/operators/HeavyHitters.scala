package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{MisraGries, Portable}

/** Frequent-items (heavy-hitter) detection over the token stream — the
  * sketch-shortlist + exact-rescore pattern a 100 TB corpus profile
  * needs. The reference's word count (MapRedWord2Vec.scala:96-117)
  * materializes EVERY distinct token through the shuffle; finding only
  * the dominant tokens that way pays the full distinct-key exchange.
  * Here a fixed-size mergeable Misra-Gries summary finds candidates in
  * one scan-speed pass with O(K) shuffle bytes per partition, and only
  * the ≤K shortlisted tokens are exactly counted. */
object HeavyHitters {

  /** q109: tokens whose exact count exceeds n/32 of all token
    * occurrences, found via MG-shortlist + exact rescore. Output is
    * EXACT (identical to a full groupBy + HAVING) because the summary
    * provably contains every item above n/65 — see MisraGries scaladoc
    * for the determinism argument. (Threshold n/32: comfortably above
    * the n/(K+1)=n/65 presence bound, and low enough to be non-empty on
    * the near-uniform 31-word fixture vocabulary.) */
  def q109HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select(explode(Portable.tokenize(col("text"))).as("word"))
    // pass 1 — sketch: one ≤K-entry summary reaches the driver (bounded
    // collect: O(K)=64 entries however large the corpus); headOption
    // covers the empty-corpus contract (QueriesSpec sweep)
    val sk = toks.as[String].select(MisraGries.toColumn.name("sk"))
      .collect().headOption.getOrElse(MisraGries.zero)
    val cands = sk.items.keys.toSeq.sorted
    // pass 2 — exact rescore of the shortlist only: the IN filter prunes
    // right after tokenize, so the groupBy shuffles ≤K distinct keys
    toks.filter(col("word").isin(cands: _*))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 32 > sk.n)
      .orderBy(desc("cnt"), asc("word"))
  }
}
