package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew mitigation for shuffle joins: salting. AQE's skew-join handling
  * (on by default) splits oversized partitions at runtime and is the
  * first line of defense; explicit salting is the deterministic fallback
  * when one join key dominates so heavily that even split partitions
  * overwhelm a task (the classic null-key / power-law-entity case at
  * 100 TB).
  *
  * Shape: the skewed (big) side gets a salt in [0, factor) derived by
  * hashing the whole row — deterministic, so retries/speculation see the
  * same salt; the small side is replicated `factor` times. The join key
  * becomes (key, salt): one hot key now spreads over `factor` tasks at
  * the cost of `factor`× the small side's shuffle volume.
  */
object Skew {

  /** Deterministic per-row salt in [0, factor). */
  def salt(allCols: Seq[Column], factor: Int): Column =
    pmod(xxhash64(allCols: _*), lit(factor.toLong)).cast("int")

  /** Inner equi-join `big ⋈ small` on big(key) == small(key), salted.
    * Result equals the plain join (verified in tests); only the physical
    * distribution changes. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, factor: Int): DataFrame = {
    val salted = big.withColumn("__salt", salt(big.columns.map(col).toSeq, factor))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i)): _*)))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Old and new shard counts for [[q164ShardMoves]]. */
  val ShardsBefore = 8
  val ShardsAfter = 9

  /** q164: re-sharding move report — when a store grows from
    * [[ShardsBefore]] to [[ShardsAfter]] shards, how many keys MOVE
    * under (a) modulo placement and (b) rendezvous (highest-random-
    * weight) hashing. Modulo re-homes ~(n−1)/n of all keys on any
    * resize — a cluster-wide re-copy; rendezvous moves only the ~1/n
    * that must (exactly the keys whose new shard wins the weight
    * contest), which is THE argument for consistent placement in any
    * 100 TB sharded layout (embedding shards, IVF cells, CDC
    * snapshots). This query measures both on the real key population —
    * placement schemes should be chosen on measured key distributions,
    * not folklore.
    *
    * Determinism: the per-(key, shard) weight is the q153 multiply-mod
    * chain — pure integer arithmetic, identical in the oracle — and
    * the argmax folds the shard list IN ORDER with a strict `>`
    * (first-wins tie-break; ties are ~1/(2³⁰) with the prime modulus).
    * Scale shape: per-row in-row fold over ≤ [[ShardsAfter]] shards
    * inside codegen (no explode of the corpus), collapsing to
    * O(schemes × shards) cells in one partial-aggregated pass; the
    * report is O(schemes) rows. */
  def q164ShardMoves(spark: SparkSession, dir: String): DataFrame = {
    val m = 1000000007L
    def w(key: Column, shard: Column): Column =
      pmod(pmod(pmod(pmod(key, lit(m)) * lit(1000003L), lit(m))
        + shard * lit(7919L), lit(m)) * lit(69069L), lit(m))
    def rendezvous(n: Int): Column =
      aggregate(sequence(lit(0L), lit(n - 1L)),
        struct(lit(-1L).as("h"), lit(-1L).as("s")),
        (acc, s) => {
          val hv = w(col("doc_id"), s)
          when(hv > acc.getField("h"),
            struct(hv.as("h"), s.as("s"))).otherwise(acc)
        }).getField("s")
    val assigned = Tables.documents(spark, dir)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(ShardsBefore.toLong)).as("mod_old"),
        pmod(col("doc_id"), lit(ShardsAfter.toLong)).as("mod_new"),
        rendezvous(ShardsBefore).as("rdv_old"),
        rendezvous(ShardsAfter).as("rdv_new"))
    val schemes = assigned.select(explode(array(
        struct(lit("modulo").as("scheme"), col("mod_old").as("old_shard"),
          col("mod_new").as("new_shard")),
        struct(lit("rendezvous").as("scheme"), col("rdv_old").as("old_shard"),
          col("rdv_new").as("new_shard")))).as("r"))
      .select(col("r.scheme").as("scheme"), col("r.old_shard").as("old_shard"),
        col("r.new_shard").as("new_shard"))
    val loads = schemes.groupBy("scheme", "new_shard")
      .agg(count(lit(1)).as("n"),
        sum((col("old_shard") =!= col("new_shard")).cast("long")).as("moved"))
    loads.groupBy("scheme")
      .agg(sum("n").as("n_docs"), sum("moved").as("n_moved"),
        min("n").as("min_shard_load"), max("n").as("max_shard_load"))
      .select(col("scheme"), col("n_docs"), col("n_moved"),
        round(col("n_moved").cast("double") / col("n_docs"), 6).as("moved_frac"),
        col("min_shard_load"), col("max_shard_load"))
      .orderBy("scheme")
  }
}
