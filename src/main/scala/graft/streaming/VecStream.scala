package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.operators.{LinAlg, Quantize}

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

  /** [[bqProbe]]'s shape applied to the FLAGSHIP composed index:
    * answer one micro-batch of query vectors against a PREPARED
    * IVF+ADC index ([[graft.operators.Quantize.buildIvfAdcIndex]]
    * with `materialized = true` — the checkpointed artifacts are what
    * a deployment keeps hot). Runs the SAME
    * [[graft.operators.Quantize.ivfAdcSearch]] core as batch q244's
    * query path, per query independent, so online answers are
    * bit-identical to the batch ones (StreamingSpec asserts row
    * parity). Stateless — nothing to checkpoint but source offsets;
    * index refresh is a new `buildIvfAdcIndex` swap, exactly how a
    * serving tier rotates IVF-PQ segments. Null-id/null-embedding
    * rows drop (the null-key contract). */
  def ivfAdcProbe(idx: Quantize.IvfAdcIndex, queryBatch: DataFrame): DataFrame =
    Quantize.ivfAdcSearch(idx,
      queryBatch
        .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
        .select(col("vec_id").as("q_id"),
          col("embedding").cast("array<double>").as("qv")))

  /** The embeddings schema, declared (streaming sources cannot infer).
    * `label` is int32 in the driver's parquet — a mis-declared type here
    * stays latent until a consumer actually projects the column (the
    * current probes prune it), so the spec asserts the declared schema
    * against a batch-inferred read of the real table. */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Open an embeddings parquet directory as a file stream. */
  def readStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(vecSchema).parquet(path)

  /** Streaming twin of q104's live half: maintain the per-dimension
    * (mean, variance) table incrementally as vectors arrive — the SAME
    * [[LinAlg.dimStats]] body, run by the incremental planner. State is
    * one aggregation record per dimension (O(d), corpus-size-free), so
    * run complete output mode and feed each trigger's table to
    * [[LinAlg.dimDrift]] against a static baseline in the sink (a join
    * downstream of a streaming aggregation is disallowed, so the
    * compare runs in `foreachBatch` — the q98 monitor-sink shape,
    * [[DocStream.ingestCells]]). An embedding pipeline alarms the
    * moment a new encoder checkpoint or crawl slice shifts the space,
    * before any cosine threshold or ANN index silently degrades. */
  def ingestDimStats(vecs: DataFrame): DataFrame =
    LinAlg.dimStats(vecs)

  /** Streaming IVF maintenance: assign every ARRIVING vector to its
    * nearest frozen centroid as it lands — the index-side half of the
    * q45/q119 inverted file kept current at ingest (write the output
    * partitioned by `cell` and the q119 probe prunes its scan the
    * moment a vector is committed).
    *
    * The batch [[graft.operators.KMeans.assign]] ranks candidates with
    * a per-vector window — a shape streaming forbids (no window
    * functions on unaggregated streams) and that would shuffle anyway.
    * Here the argmin is a PER-ROW fold over the broadcast centroid
    * array: same 6-dp-rounded distance, same lowest-cluster tie-break
    * (the fold visits clusters in ascending order and replaces only on
    * strictly-smaller distance), so rows equal the batch assignment
    * bit-for-bit (StreamingSpec) — stateless, append mode, scan speed,
    * and the better shape at ANY scale: k distances per row with NO
    * k-way row fanout, where the batch window materializes k candidate
    * rows per vector before discarding k−1. Null-id/null-embedding rows
    * drop (the null-key contract). */
  /** Streaming centroid maintenance — the OTHER half of IVF upkeep
    * next to [[ivfAssign]]: as vectors land in their (frozen-seed)
    * cells, keep each cell's RUNNING mean current, so the index owner
    * can watch drift between the serving centroids and the data that
    * has actually arrived and re-fit when the gap warrants it
    * (re-centering on a schedule is how IVF indexes chase a moving
    * encoder without full rebuilds).
    *
    * Shape: the same per-row broadcast-fold assignment as
    * [[ivfAssign]] (stateless, no fanout), then a streaming groupBy
    * over the cell with the SAME typed [[graft.functions.VectorMean]]
    * aggregator the batch q05/q50 queries use — one Tungsten (sum, n)
    * buffer per cell (state is O(k × dim), corpus-size-free), update
    * output mode, partial-merged map-side per micro-batch exactly like
    * the batch plan. Batch and stream literally share the aggregator
    * object; StreamingSpec pins the final emission to the batch
    * assign→mean answer. */
  def centroidUpdate(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val mean = udaf(graft.functions.VectorMean)
    assignKeepingVector(vecs, centroids)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vectors"), mean(col("v")).as("centroid"))
  }

  case class BucketMember(vec_id: Long, v: Seq[Double])
  case class BucketState(members: Seq[BucketMember], dead: Boolean)
  case class EdgeSighting(band: Int, bval: Long, id_a: Long, id_b: Long,
                          cos_sim: Double, dead: Boolean)

  /** CosineSim's exact accumulation order (dot/√nx·√ny, sequential),
    * rounded half-up to 6 like the batch `round(cosine, 6)`; the batch
    * NULL lanes (length mismatch, zero norm) and NaN components map to
    * NaN — every one of them fails the fold's `>= threshold` gate
    * exactly as the batch filter drops its null/NaN rows. */
  private def cos6(a: Seq[Double], b: Seq[Double]): Double = {
    if (a.length != b.length) return Double.NaN
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i); val y = b(i)
      dot += x * y; nx += x * x; ny += y * y; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) return Double.NaN
    val r = dot / denom
    if (r.isNaN) Double.NaN
    else BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Streaming dedup-cluster MAINTENANCE — the production event no
    * batch pass handles live: an arriving near-dup that BRIDGES two
    * existing clusters. Each arriving vector lands in its
    * [[graft.operators.Dedup.nBands]] simhash band buckets (the SAME
    * banding projection as batch q49 — [[graft.operators.Dedup
    * .simhashBandTableWithV]]); per bucket, `flatMapGroupsWithState`
    * keeps the members seen so far and emits one EXACT-cosine edge
    * sighting per (new member × existing member). The bucket cap is
    * enforced ONLINE: the arrival that would push a bucket past
    * [[graft.operators.Dedup.bucketCap]] kills it — a tombstone
    * sighting retracts the bucket downstream (batch keeps only buckets
    * with FINAL size ≤ cap, which no stream can know early; the
    * tombstone makes the early emissions harmless) and the dead
    * bucket's member list is DROPPED, so a hot bucket's state shrinks
    * to one flag the moment it stops mattering.
    *
    * [[dedupClusterReport]] folds the sighting stream to the batch q68
    * answer row-for-row through the SHARED
    * [[graft.operators.Dedup.clustersFromPairs]] body. The emission
    * set is arrival-order INDEPENDENT (every within-bucket pair is
    * emitted exactly once whatever the order; dead is a monotone
    * property of the final member count), so this twin needs no
    * event-time-ordered delivery contract at all — stronger than the
    * gap/latency twins.
    *
    * STATE BOUND: live buckets hold ≤ cap members × dim doubles; the
    * state in aggregate IS the online banding index — the same
    * asymptotic footprint as the batch signature table (nBands rows
    * per corpus vector), sharded by (band, value) key exactly as a
    * production deployment shards its LSH index. Duplicate deliveries
    * (checkpoint replay) are idempotent: a member id already in the
    * bucket re-emits nothing. */
  def bandEdgeSightings(vecs: DataFrame): Dataset[EdgeSighting] = {
    import vecs.sparkSession.implicits._
    val banded = graft.operators.Dedup.simhashBandTableWithV(
      vecs.filter(col("vec_id").isNotNull && col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
      .select(col("band"), col("val").as("bval"), col("vec_id"), col("v"))
      .as[(Int, Long, Long, Seq[Double])]
    banded.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Int, Long), rows: Iterator[(Int, Long, Long, Seq[Double])],
         state: GroupState[BucketState]) => {
          var st = state.getOption.getOrElse(BucketState(Nil, dead = false))
          val out = Vector.newBuilder[EdgeSighting]
          rows.toSeq.sortBy(_._3).foreach { case (band, bval, id, v) =>
            if (!st.dead && !st.members.exists(_.vec_id == id)) {
              if (st.members.size + 1 > graft.operators.Dedup.bucketCap) {
                st = BucketState(Nil, dead = true)
                out += EdgeSighting(band, bval, -1L, -1L, 0.0, dead = true)
              } else {
                st.members.foreach { m =>
                  val (a, b) =
                    if (m.vec_id < id) (m.vec_id, id) else (id, m.vec_id)
                  out += EdgeSighting(band, bval, a, b, cos6(m.v, v), dead = false)
                }
                st = st.copy(members = st.members :+ BucketMember(id, v))
              }
            }
          }
          state.update(st)
          out.result().iterator
        })
  }

  /** Fold emitted edge sightings to the batch q68 answer: drop every
    * sighting from a tombstoned bucket, gate at the q49 threshold,
    * dedup pairs across buckets, and resolve through the SHARED
    * [[graft.operators.Dedup.clustersFromPairs]] — parity by
    * construction. */
  def dedupClusterReport(sightings: DataFrame,
                         minCosine: Double = 0.45): DataFrame = {
    // rename the dead side's keys: both sides derive from the same
    // (often memory-sink) frame, and a self-anti-join on the shared
    // attribute ids trips conflicting-reference resolution — the alias
    // mints fresh ids
    val dead = sightings.filter(col("dead"))
      .select(col("band").as("dband"), col("bval").as("dbval")).distinct()
    val pairs = sightings.filter(!col("dead"))
      .join(dead, col("band") === col("dband")
        && col("bval") === col("dbval"), "left_anti")
      .filter(col("cos_sim") >= minCosine)
      .select("id_a", "id_b").distinct()
    graft.operators.Dedup.clustersFromPairs(pairs)
  }

  /** The argmin fold over the broadcast centroid array, shared by
    * [[ivfAssign]] and [[assignKeepingVector]]. The squared-L2 inside
    * the lambda is the native [[graft.plans.L2Dist]] expression via its
    * SQL name — the batch-side lesson applied to the ingest path: the
    * HOF `aggregate(zip_with(...))` form this replaced ran interpreted
    * lambdas and allocated a zipped array PER (row × centroid)
    * EVALUATION, corpus × K continuously at a pipeline's ingest rate.
    * `l2_dist` is one allocation-free loop with the identical
    * sequential left fold (bit-equal doubles; StreamingSpec pins rows
    * equal to the batch assignment). The outer per-row fold stays a
    * HOF — it is O(K) struct compares per row, not the hot kernel. */
  private val argminFold =
    """aggregate(cs,
      |  named_struct('cluster', CAST(-1 AS BIGINT), 'dist', CAST('Infinity' AS DOUBLE)),
      |  (acc, c) -> CASE
      |    WHEN round(l2_dist(v, c.cv), 6) < acc.dist
      |    THEN named_struct('cluster', CAST(c.cluster AS BIGINT),
      |      'dist', round(l2_dist(v, c.cv), 6))
      |    ELSE acc END)""".stripMargin

  /** `l2_dist` resolves from the session's function registry
    * ([[graft.plans.GraftExtensions]]); sessions built without the
    * extension get it registered here — idempotent registry put. */
  private def withNativeFns(df: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df
  }

  /** The [[ivfAssign]] fold, carrying the vector through for consumers
    * that aggregate it (centroid update); same argmin contract. */
  private def assignKeepingVector(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val centArr = broadcast(centroids.agg(
      expr("sort_array(collect_list(struct(cluster, cv)))").as("cs")))
    withNativeFns(vecs)
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(centArr)
      .select(col("vec_id"), col("v"), expr(argminFold).as("best"))
      .select(col("vec_id"), col("v"), col("best.cluster").as("cluster"))
  }

  def ivfAssign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val centArr = broadcast(centroids.agg(
      expr("sort_array(collect_list(struct(cluster, cv)))").as("cs")))
    withNativeFns(vecs)
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(centArr)
      .select(col("vec_id"), expr(argminFold).as("best"))
      .select(col("vec_id"), col("best.cluster").as("cluster"),
        col("best.dist").as("dist"))
  }

  /** Online probes against the PERSISTED index — [[ivfAdcProbe]]'s
    * store-backed twin and the serving half of the q262/q263/append
    * lifecycle: each micro-batch of arriving query vectors is answered
    * by [[graft.sources.IvfStore.servedTop10]], which pushes the
    * batch's probed-cell set as a static partition filter, so an
    * online probe reads nprobe-of-K cell DIRECTORIES (and only the
    * columns its stage needs) rather than holding a corpus-sized
    * index in executor memory. Stateless foreachBatch body (per-query
    * top-k windows are batch-local, the [[ivfAdcProbe]] rationale);
    * answers are bit-equal to the batch q262 rows for the same store
    * (StreamingSpec). Index refresh = pointing `path` at a new store
    * — or the SAME store [[appendArrivals]] is growing: a probe batch
    * sees every posting committed before its trigger. */
  def storedProbe(spark: SparkSession, path: String,
                  queryBatch: DataFrame): DataFrame =
    graft.sources.IvfStore.servedTop10(spark, path,
      queryBatch
        .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
        .select(col("vec_id").as("q_id"),
          col("embedding").cast("array<double>").as("qv")))

  /** Streaming STORE maintenance — the q263 incremental append run at
    * INGEST: a `foreachBatch` body that files each micro-batch of
    * arriving vectors into the persisted cell-partitioned index
    * (assignment under the STORED centroids, codes under the STORED
    * codebook, postings filed into the touched `cell=` directories
    * only — [[graft.sources.IvfStore.commitBatch]]). Because
    * per-posting content depends only on (vector, cents, codebook),
    * appends commute across micro-batches: after any drain order the
    * lists tree is bit-equal to a from-scratch batch rebuild under the
    * same frozen artifacts (StreamingSpec pins content AND serving
    * equality).
    *
    * Replay contract: `foreachBatch` is at-least-once, and batch ids
    * restart at 0 for every new checkpoint — so `lineage` (the
    * query's checkpoint identity: its checkpoint location or query
    * name, anything 1:1 with the offset log) scopes the committed-
    * batch markers. A bare-batchId marker would make a NEW query's
    * first batches against an existing store silently skip as
    * "already committed" — data loss (ADVICE r12). Replays of
    * committed batches no-op on the lineage-scoped marker; a batch
    * that crashed mid-commit re-runs its staged commit onto the SAME
    * deterministic file names, so the drained tree converges to
    * exactly-once filing with no duplicate-posting window
    * (StreamingSpec drives replay, half-commit replay, and the
    * new-lineage regression). */
  def appendArrivals(spark: SparkSession, path: String,
                     batch: DataFrame, batchId: Long,
                     lineage: String): Unit = {
    val arrivals = batch
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    graft.sources.IvfStore.commitBatch(spark, path, arrivals, lineage, batchId)
  }
}
