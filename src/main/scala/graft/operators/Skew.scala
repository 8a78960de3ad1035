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

  /** Heavy hitters kept per join side by [[q170JoinCardEst]]. */
  val CardEstHH = 20

  /** q170: join-cardinality estimation report — what a cost-based
    * optimizer would PREDICT for a join's output size from bounded
    * per-side statistics, against the true size, for four joins of
    * very different key shapes (unique-key FK joins, a per-user
    * self-join, a 5-key enum self-join). Two estimators:
    * `est_sysr` — the System-R textbook formula |A|·|B|/max(ndv_A,
    * ndv_B), which is skew-blind; `est_hh` — a top-[[CardEstHH]]
    * heavy-hitter sketch per side (exact counts for the hitters,
    * uniform tail under the containment assumption), the shape every
    * modern CBO actually keeps. The report IS the argument for
    * histogram statistics: on the enum self-join the tail model is
    * exact and System-R's error is the skew.
    *
    * Scale shape: per side ONE partial-aggregated count shuffle with
    * O(ndv) output; the true size comes from joining the two COUNT
    * tables (O(ndv) rows, never the corpus against itself — Σ aₖ·bₖ
    * is the join size without materializing the join); heavy-hitter
    * shortlists are TakeOrdered top-20s, and the estimator algebra
    * runs on ≤ 40-row broadcast frames. Counts stay exact integers
    * (decimal sums — the q155 rule); the tail-rate doubles derive
    * identically on both engines. */
  def q170JoinCardEst(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    def scenario(name: String, a: DataFrame, b: DataFrame): DataFrame = {
      val ca = a.filter(col("k").isNotNull).groupBy("k")
        .agg(count(lit(1)).as("ca"))
      val cb = b.filter(col("k").isNotNull).groupBy("k")
        .agg(count(lit(1)).as("cb"))
      val sa = ca.agg(sum(col("ca").cast(d38)).cast("long").as("na"),
        count(lit(1)).as("da"))
      val sb = cb.agg(sum(col("cb").cast(d38)).cast("long").as("nb"),
        count(lit(1)).as("db"))
      val actual = ca.join(cb, "k")
        .agg(sum((col("ca") * col("cb")).cast(d38)).cast("long").as("actual_rows"))
      val hha = ca.orderBy(col("ca").desc, col("k").asc).limit(CardEstHH)
      val hhb = cb.orderBy(col("cb").desc, col("k").asc).limit(CardEstHH)
      val hh = hha.join(hhb, Seq("k"), "full_outer")
        .agg(
          coalesce(sum(when(col("ca").isNotNull && col("cb").isNotNull,
            (col("ca") * col("cb")).cast(d38))), lit(0).cast(d38)).as("hh_prod"),
          coalesce(sum(when(col("ca").isNotNull && col("cb").isNull,
            col("ca").cast(d38))), lit(0).cast(d38)).as("hh_a_only"),
          coalesce(sum(when(col("cb").isNotNull && col("ca").isNull,
            col("cb").cast(d38))), lit(0).cast(d38)).as("hh_b_only"),
          coalesce(sum(col("ca").cast(d38)), lit(0).cast(d38)).as("hh_a_rows"),
          coalesce(sum(col("cb").cast(d38)), lit(0).cast(d38)).as("hh_b_rows"),
          sum(col("ca").isNotNull.cast("long")).as("n_hha"),
          sum(col("cb").isNotNull.cast("long")).as("n_hhb"),
          sum((col("ca").isNotNull && col("cb").isNotNull).cast("long")).as("n_match"))
      val taHat = when(col("da") > col("n_hha"),
        (col("na") - col("hh_a_rows").cast("long")).cast("double") /
          (col("da") - col("n_hha")).cast("double")).otherwise(lit(0.0))
      val tbHat = when(col("db") > col("n_hhb"),
        (col("nb") - col("hh_b_rows").cast("long")).cast("double") /
          (col("db") - col("n_hhb")).cast("double")).otherwise(lit(0.0))
      val tNdv = greatest(lit(0L),
        least(col("da"), col("db")) - (col("n_hha") + col("n_hhb") - col("n_match")))
      hh.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
        .crossJoin(broadcast(actual)) // 1-row frames throughout
        .select(lit(name).as("join_name"),
          col("na").as("n_a"), col("da").as("ndv_a"),
          col("nb").as("n_b"), col("db").as("ndv_b"),
          col("actual_rows"),
          round(col("na").cast("double") * col("nb").cast("double") /
            greatest(col("da"), col("db")).cast("double"), 0)
            .cast("long").as("est_sysr"),
          round(col("hh_prod").cast("double")
            + col("hh_a_only").cast("double") * tbHat
            + col("hh_b_only").cast("double") * taHat
            + tNdv.cast("double") * taHat * tbHat, 0)
            .cast("long").as("est_hh"))
        .select(col("*"),
          round((col("est_sysr") - col("actual_rows")).cast("double") * 100.0 /
            col("actual_rows").cast("double"), 2).as("err_sysr_pct"),
          round((col("est_hh") - col("actual_rows")).cast("double") * 100.0 /
            col("actual_rows").cast("double"), 2).as("err_hh_pct"))
    }
    val orders = Tables.orders(spark, dir).select(col("o_orderkey").as("k"))
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir).select(col("p_partkey").as("k"))
    val evUser = Tables.events(spark, dir).select(col("user_id").as("k"))
    val evType = Tables.events(spark, dir).select(col("event_type").as("k"))
    scenario("events_self_type", evType, evType)
      .unionAll(scenario("events_self_user", evUser, evUser))
      .unionAll(scenario("orders_x_lineitem", orders,
        li.select(col("l_orderkey").as("k"))))
      .unionAll(scenario("part_x_lineitem", part,
        li.select(col("l_partkey").as("k"))))
      .orderBy("join_name")
  }
}
