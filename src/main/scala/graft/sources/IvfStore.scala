package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{KMeans, Quantize}

/** Cell-partitioned PERSISTENCE for the composed IVF+ADC+refine index
  * (the q244 serving artifacts) — the q108 partition-pruning lesson
  * applied to the ANN family.
  *
  * The in-memory [[Quantize.IvfAdcIndex]] filters probed-cell members
  * out of an UNPARTITIONED frame, so at 100 TB every probe still scans
  * the full membership/code/float tables to discard (K−nprobe)/K of
  * them. This layout writes the corpus-sized artifacts as ONE
  * `cell=`-partitioned parquet tree — FAISS's inverted lists as
  * directories, codes and floats inline per posting:
  *
  * {{{
  *   path/_current            (optional) generation pointer — one small
  *                            file naming the live tree; absent = flat
  *   path[/gen-G]/cents/      (cluster, cv)                O(K), hot
  *   path[/gen-G]/codebook/   (sub, code, cv)              O(PqM·PqK), hot
  *   path[/gen-G]/lists/cell=N/ (n_id, codes: array, v)    corpus-sized
  *   path/_batches/<tag>/<id> streaming commit markers, keyed by the
  *                            fixed-width [[lineageTag]] (store-level:
  *                            they survive a retrain, which rebuilds FROM
  *                            the already-filed postings; `<id>.inflight`
  *                            intent markers flag half-committed batches
  *                            for [[recover]])
  * }}}
  *
  * A probe pushes its cell set as a STATIC `IN` filter on the
  * partition column, so Catalyst prunes to the probed DIRECTORIES
  * (`PartitionFilters` on every list scan — asserted in ScaleSpec with
  * `numFiles` ≤ the probed-cell count): an nprobe-of-K probe reads
  * nprobe/K of the index, on all three stages. The cell set is known
  * BEFORE any corpus-sized read (queries × O(K) broadcast centroids),
  * which is why a static filter works where a join would need runtime
  * DPP. WITHIN the pruned directories, parquet column pruning gives
  * each stage only its bytes: candidate generation reads `n_id` alone,
  * the ADC rank reads `n_id, codes` (never a float — the q114b
  * codes-only contract now holds at the STORAGE layer too), and only
  * the top-[[Quantize.RefineR]] rescore touches `v`. ScaleSpec pins
  * the candidate scan's `ReadSchema` to the id column.
  *
  * Each cell is written by one task (`repartition(col("cell"))`), so
  * a cell is one file at test scale and a directory of co-written
  * files at 100 TB; readers never depend on the file count. Results
  * are BIT-EQUAL to the in-memory path: parquet round-trips doubles
  * and longs exactly, the codes array is sub-ordered so its posexplode
  * reproduces the (n_id, sub, code) frame verbatim, and the serve
  * below reuses the very same [[Quantize.ivfAdcTop10]] stage code over
  * the pruned frames.
  *
  * ==Maintenance durability contract==
  *
  * All maintenance paths go through the Hadoop `FileSystem` API (the
  * `Tables` footer-probe precedent), so they carry HDFS semantics, not
  * just the local-FS ones the sandbox runs on. Three mechanisms, three
  * different guarantees:
  *
  *  - '''Generation publish''' ([[retrain]]): a whole new tree is
  *    written beside the live one and published by atomically
  *    replacing the one-line `_current` pointer file
  *    (`FileContext.rename(OVERWRITE)` — atomic on HDFS and POSIX;
  *    on an object store a single-key PUT has the same effect). A
  *    crash at ANY point leaves either the old pointer (unpublished
  *    tree is garbage [[recover]] deletes) or the new one (superseded
  *    tree is garbage) — readers never see a partial index.
  *  - '''Streaming batch commit''' ([[commitBatch]]): an intent marker
  *    lands, arrivals are staged, then moved into the live cells under
  *    DETERMINISTIC names (`b-<tag>-<batchId>-<i>.parquet`) with any
  *    same-name leftovers deleted first, then the lineage-scoped final
  *    marker lands. Replays of committed batches no-op on the marker;
  *    replays of a crashed half-commit DELETE-then-rename the same
  *    names; a half-commit that maintenance reaches BEFORE the replay
  *    is rolled back by [[recover]]'s inflight sweep — so the drained
  *    tree converges to exactly-once filing with no duplicate-posting
  *    window in either ordering.
  *  - '''Compaction''' ([[compact]]): an in-place per-cell rewrite —
  *    two directory renames per cell, which HDFS makes individually
  *    atomic but with a window between them where the cell is absent.
  *    Compaction is therefore OFFLINE, SINGLE-WRITER maintenance (run
  *    it with serving quiesced, never concurrently with append/
  *    retrain); [[recover]] rolls a crashed swap back from its
  *    `.old-` twin on the next maintenance open. On object stores,
  *    where directory rename is copy+delete (not atomic), prefer
  *    retrain-style generation rewrites or a transactional table
  *    format over in-place compaction.
  */
object IvfStore {

  // ------------------------------------------------------------------
  // Filesystem plumbing — Hadoop FileSystem throughout (never
  // java.io.File: store paths live on HDFS/object stores at the scale
  // the scaladoc claims; the sandbox's local FS is just one backend).
  // ------------------------------------------------------------------

  private def hconf(spark: SparkSession) = spark.sessionState.newHadoopConf()

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(hconf(spark))

  private def readSmall(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), UTF_8).trim finally in.close()
  }

  /** The live tree root: `path/<gen>` when the `_current` pointer
    * exists, else `path` itself (the flat layout [[write]] produces —
    * a store only grows a generation once [[retrain]] publishes one).
    * Every reader and every maintenance entry resolves through this. */
  def resolveRoot(spark: SparkSession, path: String): String =
    currentGen(spark, path)
      .map(g => new Path(new Path(path), g).toString)
      .getOrElse(path)

  /** The filesystem-safe identity of a streaming lineage: a fixed-width
    * md5 prefix of the RAW lineage string. Injective for all practical
    * purposes where a readable sanitization is not — replacing
    * disallowed chars maps distinct lineages ("a/b", "a_b") to one
    * marker namespace (skipped batches = data loss), and a variable-
    * length name embedded in a file-name prefix is ambiguous (lineage
    * "a" batch 1's cleanup prefix `b-a-1-` matches lineage "a-1" batch
    * 2's files). Fixed-width hex + digit batch ids make the
    * `b-<tag>-<batchId>-` prefix unambiguous. Public: operational
    * tooling needs it to locate a query's markers. */
  def lineageTag(lineage: String): String = {
    require(lineage.nonEmpty, "lineage must be non-empty")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(lineage.getBytes(UTF_8)).take(8)
      .map(b => f"$b%02x").mkString
  }

  private def currentGen(spark: SparkSession, path: String): Option[String] = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    val cur = new Path(p, "_current")
    if (fs.exists(cur)) Some(readSmall(fs, cur)) else None
  }

  /** Atomically publish generation `gen` as the live tree: write the
    * pointer beside itself, then rename OVER the old pointer in one
    * `FileContext.rename(OVERWRITE)` — the single atomic step of the
    * whole retrain. */
  private def publish(spark: SparkSession, path: String, gen: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    val tmp = new Path(p, "_current.tmp")
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes(UTF_8)) finally out.close()
    val qualified = fs.makeQualified(p)
    val fc = FileContext.getFileContext(qualified.toUri, hconf(spark))
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(new Path(p, "_current")),
      Options.Rename.OVERWRITE)
  }

  /** Crash recovery for the maintenance paths — run on every
    * maintenance open ([[compact]]/[[retrain]] call it first), cheap
    * O(K) directory listings:
    *
    *  - a `gen-*` tree not named by `_current` (crash between tree
    *    write and publish, or between publish and old-tree retire) is
    *    deleted; with `_current` published, a leftover FLAT tree
    *    (`lists`/`cents`/`codebook` directly under `path`) is the
    *    retired pre-generation layout and is deleted too;
    *  - a `.old-cell=N` whose `cell=N` twin is ABSENT is a compaction
    *    that crashed between its two renames — rolled BACK (the old
    *    files are intact by construction); one whose twin exists is a
    *    completed swap whose cleanup crashed — deleted;
    *  - `.compact-*` temp trees and `_current.tmp` are deleted. */
  def recover(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return
    val cur = currentGen(spark, path)
    fs.listStatus(p).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("gen-") && !cur.contains(n)) fs.delete(s.getPath, true)
      else if (n == "_current.tmp") fs.delete(s.getPath, false)
      // abandoned half-staged batches (a writer that crashed mid-stage
      // and never re-delivered): recover only runs at offline
      // single-writer maintenance entries, where no commit can be
      // in flight by contract, so the whole staging area is garbage.
      // Committed batches are untouched — their markers and filed
      // postings live outside _staging.
      else if (n == "_staging") fs.delete(s.getPath, true)
      else if (cur.isDefined && (n == "lists" || n == "cents" || n == "codebook"))
        fs.delete(s.getPath, true)
    }
    val lists = new Path(resolveRoot(spark, path), "lists")
    if (fs.exists(lists)) {
      fs.listStatus(lists).foreach { s =>
        val n = s.getPath.getName
        if (n.startsWith(".old-cell=")) {
          val cell = new Path(lists, n.stripPrefix(".old-"))
          if (!fs.exists(cell)) {
            if (!fs.rename(s.getPath, cell))
              throw new IllegalStateException(
                s"recover: cannot roll back ${s.getPath} to $cell — " +
                  "the cell would stay absent and probes would silently " +
                  "miss its postings")
          } else fs.delete(s.getPath, true)
        }
      }
      fs.listStatus(lists).foreach { s =>
        if (s.getPath.getName.startsWith(".compact-"))
          fs.delete(s.getPath, true)
      }
    }
    // half-committed streaming batches: an inflight marker without its
    // final twin means the commit crashed after touching the live tree
    // (or before — either way its files, still identifiable by their
    // batch prefix, must go BEFORE compaction/retrain folds them into
    // anonymous files the replay's delete-by-prefix can no longer see).
    // The batch's eventual replay then re-files it exactly once.
    val batches = new Path(p, "_batches")
    if (fs.exists(batches)) {
      fs.listStatus(batches).filter(_.isDirectory).foreach { lin =>
        fs.listStatus(lin.getPath)
          .filter(_.getPath.getName.endsWith(".inflight")).foreach { m =>
            val id = m.getPath.getName.stripSuffix(".inflight")
            val committed = fs.exists(new Path(lin.getPath, id))
            if (!committed && fs.exists(lists)) {
              val prefix = batchPrefix(lin.getPath.getName, id.toLong)
              fs.listStatus(lists)
                .filter(c => c.isDirectory && c.getPath.getName.startsWith("cell="))
                .foreach { c =>
                  fs.listStatus(c.getPath)
                    .filter(_.getPath.getName.startsWith(prefix))
                    .foreach(f => fs.delete(f.getPath, false))
                }
            }
            fs.delete(m.getPath, false)
          }
      }
    }
  }

  /** Assemble the inverted-list posting frame (n_id, codes, v, cell)
    * from the three index pieces — shared by the from-scratch write
    * and the incremental append, so both paths produce bit-identical
    * postings by construction. */
  private def postings(members: DataFrame, codes: DataFrame,
                       floats: DataFrame): DataFrame = {
    val codesArr = codes.groupBy("n_id")
      .agg(expr("transform(sort_array(collect_list(struct(sub, code))), p -> p.code)")
        .as("codes"))
    floats.select(col("vec_id").as("n_id"), col("v"))
      .join(codesArr, Seq("n_id"), "left")
      .join(members.select(col("n_id"), col("cluster").as("cell")), "n_id")
  }

  /** Persist a built index at `path` (overwrite, flat layout). One
    * corpus-sized inverted-list tree; cents/codebook are the O(K) /
    * O(PqM·PqK) hot metadata every probe broadcasts anyway. The PQ
    * codes pivot to a sub-ordered array per posting (PqM bytes of
    * payload per vector — the FAISS list entry), so the tree carries
    * one row per vector. */
  def write(idx: Quantize.IvfAdcIndex, path: String): Unit = {
    postings(idx.members, idx.codes, idx.floats)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/lists")
    idx.cents.write.mode("overwrite").parquet(s"$path/cents")
    idx.codebook.write.mode("overwrite").parquet(s"$path/codebook")
  }

  /** Fit-and-persist: seeded-Lloyd centroids + seeded PQ codebook on
    * `corpus`, every vector assigned and encoded under them, the whole
    * tree written at `path` — the build step shared by the q263/q268/
    * q269 lifecycle scenarios (one definition of the build convention,
    * not a copy per query). */
  def writeFitted(corpus: DataFrame, path: String): Unit = {
    val cents = KMeans.fit(corpus)
    val cb = Quantize.pqCodebook(corpus)
    write(Quantize.IvfAdcIndex(
      cents,
      KMeans.assign(corpus, cents)
        .select(col("vec_id").as("n_id"), col("cluster")),
      Quantize.pqCodesWith(cb, corpus)
        .select(col("vec_id").as("n_id"), col("sub"), col("code")),
      cb,
      corpus), path)
  }

  /** INCREMENTAL index maintenance — the act q261's staleness audit
    * decides about, for the no-retrain branch: new arrivals are
    * assigned under the STORED centroids, encoded under the STORED
    * codebook, and their postings APPENDED into the existing
    * `cell=` directories. The maintenance job's inputs are the new
    * vectors and the O(K)/O(PqM·PqK) sidecars alone — the stored
    * corpus is never read, so maintaining a 100 TB index costs
    * O(arrivals), not O(corpus). Append (not dynamic overwrite) is
    * the correct parquet op for postings: untouched cells' files are
    * physically untouched (ScaleSpec pins their file lists), touched
    * cells gain files, and the merged tree is bit-equal to a
    * from-scratch rebuild under the same frozen artifacts because
    * per-posting content depends only on (vector, cents, codebook).
    * Returns the touched cell ids (O(K) bounded).
    *
    * This is the BATCH maintenance form: it assumes its caller runs
    * once (a replay re-files the same arrivals — there is no marker
    * at this layer). Streaming ingest goes through [[commitBatch]],
    * whose staged deterministic-name commit makes replays converge
    * to exactly-once filing. */
  def append(spark: SparkSession, path: String, arrivals: DataFrame): Array[Long] = {
    val root = resolveRoot(spark, path)
    val cents = spark.read.parquet(s"$root/cents")
    val cb = spark.read.parquet(s"$root/codebook")
    val asg = KMeans.assign(arrivals, cents)
      .select(col("vec_id").as("n_id"), col("cluster"))
      .localCheckpoint(true) // feeds the postings join + the touched set
    postings(asg,
        Quantize.pqCodesWith(cb, arrivals)
          .select(col("vec_id").as("n_id"), col("sub"), col("code")),
        arrivals.select(col("vec_id"), col("v")))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$root/lists")
    asg.select("cluster").distinct().collect().map(_.getLong(0)) // O(K)
  }

  /** EXACTLY-ONCE streaming filing — [[append]] hardened for the
    * at-least-once `foreachBatch` replay contract. The marker is
    * namespaced by the streaming query's LINEAGE (its checkpoint
    * identity), not the bare batchId: batch ids restart at 0 for
    * every new checkpoint, so an unscoped marker would silently skip
    * a new query's first batches against a pre-existing store (data
    * loss the rebuild-equality audit would only catch offline).
    *
    * Filing is a staged commit, each step replay-idempotent, keyed by
    * the fixed-width [[lineageTag]] (injective where a readable
    * sanitization is not — see its scaladoc):
    *
    *  1. INTENT: `path/_batches/<tag>/<batchId>.inflight` lands before
    *     any live-tree mutation, so [[recover]] can identify and roll
    *     back a half-committed batch even after a crash;
    *  2. STAGE: the batch's postings are written (overwrite) under
    *     `path/_staging/<tag>/<batchId>`, partitioned by cell — the
    *     same frozen-artifact encode as [[append]];
    *  3. MOVE: per staged cell, any prior `b-<tag>-<batchId>-*` files
    *     in the live cell directory are deleted (a replayed
    *     half-commit's leftovers), then the staged files are renamed
    *     in under those DETERMINISTIC names — so a replayed commit
    *     overwrites itself instead of duplicating postings;
    *  4. MARK: the `path/_batches/<tag>/<batchId>` marker lands, the
    *     intent marker and staging tree are deleted. Markers live at
    *     STORE level (not inside a generation): a retrain rebuilds
    *     FROM the filed postings, so committed batches must stay
    *     committed across it.
    *
    * A marker hit short-circuits everything (committed batches
    * re-deliver as no-ops; empty batches land only their marker); any
    * crash before the marker either re-runs the whole staged commit
    * onto the same file names (stream replays first) or is rolled
    * back by [[recover]]'s inflight sweep (maintenance runs first —
    * without the intent marker, compaction would fold the orphaned
    * postings into anonymous files the replay's delete-by-prefix can
    * no longer see, and the replay would duplicate them).
    * StreamingSpec drives both replay shapes, the new-lineage
    * regression, and the maintenance-before-replay rollback. */
  def commitBatch(spark: SparkSession, path: String, arrivals: DataFrame,
                  lineage: String, batchId: Long): Unit = {
    val tag = lineageTag(lineage)
    val p = new Path(path)
    val fs = fsOf(spark, p)
    val marker = new Path(p, s"_batches/$tag/$batchId")
    if (fs.exists(marker)) return
    // empty-batch fast path: a low-traffic stream triggers mostly-empty
    // batches — land the marker alone, no assign/encode/staging jobs
    if (arrivals.isEmpty) {
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
      return
    }
    val root = new Path(resolveRoot(spark, path))
    val staging = new Path(p, s"_staging/$tag/$batchId")
    // INTENT marker before any live-tree mutation: if this commit
    // crashes half-way, [[recover]] finds the inflight marker without
    // its final twin and deletes the batch's (prefix-named, so still
    // identifiable) files — restoring the exactly-once contract even
    // when compaction/retrain would otherwise have folded the orphans
    // into anonymous files before the stream replays
    val inflight = new Path(p, s"_batches/$tag/$batchId.inflight")
    fs.mkdirs(inflight.getParent)
    fs.create(inflight, true).close()
    val cents = spark.read.parquet(new Path(root, "cents").toString)
    val cb = spark.read.parquet(new Path(root, "codebook").toString)
    val asg = KMeans.assign(arrivals, cents)
      .select(col("vec_id").as("n_id"), col("cluster"))
    postings(asg,
        Quantize.pqCodesWith(cb, arrivals)
          .select(col("vec_id").as("n_id"), col("sub"), col("code")),
        arrivals.select(col("vec_id"), col("v")))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(staging.toString)
    val lists = new Path(root, "lists")
    val prefix = batchPrefix(tag, batchId)
    fs.listStatus(staging)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .foreach { cellDir =>
        val dst = new Path(lists, cellDir.getPath.getName)
        fs.mkdirs(dst)
        fs.listStatus(dst).filter(_.getPath.getName.startsWith(prefix))
          .foreach(f => fs.delete(f.getPath, false))
        fs.listStatus(cellDir.getPath).map(_.getPath)
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
          .zipWithIndex.foreach { case (src, i) =>
            if (!fs.rename(src, new Path(dst, s"$prefix$i.parquet")))
              throw new IllegalStateException(
                s"commitBatch: cannot move $src into $dst")
          }
      }
    fs.create(marker, true).close()
    fs.delete(inflight, false)
    fs.delete(staging, true)
    ()
  }

  /** File-name prefix of one committed batch's postings — fixed-width
    * [[lineageTag]] + digit batch id, so no batch's prefix is a prefix
    * of another batch's file names. */
  private def batchPrefix(tag: String, batchId: Long): String =
    s"b-$tag-$batchId-"

  /** Serve the q244 query path (probe → ADC → refine, top-10 per
    * query) from a stored index, reading ONLY the probed cells'
    * directories. `queries` is (q_id, qv), broadcast-sized by the
    * q34 contract. Returns (q_id, rank, n_id, l2sq), bit-equal to
    * [[Quantize.ivfAdcSearch]] over the same index.
    *
    * The probed-cell collect is O(|q|·Nprobe) ≤ O(K) distinct values —
    * bounded by construction (the IVF-cell-ids rule): it exists
    * precisely so the cell bound reaches the scans as a literal
    * partition filter instead of a join Catalyst can't prune by. */
  def servedTop10(spark: SparkSession, path: String,
                  queries: DataFrame): DataFrame = {
    val root = resolveRoot(spark, path)
    val cents = spark.read.parquet(s"$root/cents")
    val wq = Window.partitionBy("q_id").orderBy(asc("cdist"), asc("cluster"))
    val qcells = queries.crossJoin(broadcast(cents))
      .select(col("q_id"), col("cluster"),
        round(graft.plans.L2Dist.sqDist(col("qv"), col("cv")), 6).as("cdist"))
      .withColumn("crk", row_number().over(wq))
      .filter(col("crk") <= KMeans.Nprobe)
      .select("q_id", "cluster")
      .localCheckpoint(true) // read twice: the cell collect + the join
    val cellSet = qcells.select("cluster").distinct()
      .collect().map(_.getLong(0)) // O(K) bounded by construction
    // three scans of ONE tree: each prunes to the probed dirs AND to
    // its own columns (ids / ids+codes / ids+floats)
    def lists: DataFrame = spark.read.parquet(s"$root/lists")
      .filter(col("cell").isin(cellSet: _*))
    val members = lists.select(col("n_id"), col("cell").cast("long").as("cluster"))
    val cand = members.join(broadcast(qcells), "cluster")
      .filter(col("n_id") =!= col("q_id"))
      .select("q_id", "n_id")
    val codes = lists
      .select(col("n_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .select(col("n_id"), col("sub").cast("long").as("sub"), col("code"))
    val served = Quantize.IvfAdcIndex(
      cents,
      members,
      codes,
      spark.read.parquet(s"$root/codebook"),
      lists.select(col("n_id").as("vec_id"), col("v")))
    Quantize.ivfAdcTop10(served, queries, cand)
  }

  /** Compact the inverted-list tree — the small-files half of index
    * maintenance: every [[append]]/[[commitBatch]] adds files to its
    * touched cells, so a long-running ingest leaves each hot cell a
    * directory of many small postings files (more open/seek cost per
    * probe, more namenode/listing pressure at 100 TB). Compaction
    * rewrites ONLY the cells whose file count exceeds
    * `maxFilesPerCell`, each back to a single co-written file set,
    * through a temp directory with a per-cell rename swap — untouched
    * cells keep their exact files, and the tree's CONTENT is
    * bit-identical before and after (postings are row-identical; only
    * their file layout changes — ScaleSpec pins content, serving, and
    * the untouched cells' file lists).
    *
    * OFFLINE, SINGLE-WRITER (see the object scaladoc): the two renames
    * are each atomic on HDFS but the cell is absent between them, so
    * serving must be quiesced for the cells being rewritten; a crash
    * in the window is rolled back by the [[recover]] pass every
    * maintenance entry (this one included) runs first. Returns
    * (cell, files_before, files_after) for the rewritten cells —
    * O(K) bounded. */
  def compact(spark: SparkSession, path: String,
              maxFilesPerCell: Int = 4): Seq[(Long, Int, Int)] = {
    require(maxFilesPerCell >= 1)
    recover(spark, path)
    val root = new Path(resolveRoot(spark, path), "lists")
    val fs = fsOf(spark, root)
    val cells = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
    val out = Vector.newBuilder[(Long, Int, Int)]
    cells.foreach { c =>
      val dir = c.getPath
      def parts = fs.listStatus(dir).map(_.getPath.getName)
        .filter(n => n.endsWith(".parquet") || n.startsWith("part-"))
      val before = parts.length
      if (before > maxFilesPerCell) {
        val cellId = dir.getName.stripPrefix("cell=").toLong
        val tmp = new Path(root, s".compact-${dir.getName}")
        // one task writes the merged cell (a cell is one task's worth
        // by the write() contract; a TB-scale hot cell would raise
        // the coalesce count the way filesPerDay salts q108's days)
        spark.read.parquet(dir.toString)
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        fs.delete(new Path(tmp, "_SUCCESS"), false)
        val old = new Path(root, s".old-${dir.getName}")
        if (!fs.rename(dir, old))
          throw new IllegalStateException(s"compact: cannot swap $dir")
        if (!fs.rename(tmp, dir)) {
          fs.rename(old, dir) // roll back — the old cell is still intact
          throw new IllegalStateException(s"compact: cannot promote $tmp")
        }
        fs.delete(old, true)
        out += ((cellId, before, parts.length))
      }
    }
    out.result()
  }

  /** The RETRAIN act — the branch of the q266 maintenance gate
    * [[append]] does not cover: when churn says the stored centroids
    * no longer describe the corpus, re-fit EVERYTHING from the store's
    * own postings and atomically swap the whole tree.
    *
    *  1. read the stored vectors (`n_id, v` — the one corpus-sized
    *     read a retrain fundamentally requires; codes/cells are NOT
    *     read, they are superseded by construction);
    *  2. seeded-Lloyd re-fit + PQ codebook re-seed on the full stored
    *     corpus, re-assign and re-encode every vector — the exact
    *     [[Quantize.buildIvfAdcIndex]] artifacts, so a retrained store
    *     is indistinguishable from one built fresh on today's corpus;
    *  3. write the new tree into the NEXT generation directory beside
    *     the live one, then [[publish]] it by atomically replacing the
    *     `_current` pointer — readers resolve the pointer per query,
    *     so they see the old index until the instant they see the new
    *     one, never a mixture;
    *  4. retire the superseded tree (a crash between publish and
    *     retire leaves garbage [[recover]] deletes, never a wrong
    *     answer). One honest race: a query that resolved the pointer
    *     BEFORE the swap and is still scanning the old tree when the
    *     retire lands will fail its read — it can retry against the
    *     new pointer and get a correct (never partial) answer. A
    *     deployment serving during retrains delays the retire by its
    *     max query latency (generation pinning); the swap itself
    *     needs no such grace.
    *
    * Scale shape: one full corpus scan + the q262 build cost — the
    * honest price of a retrain, paid only when the q266 gate's
    * measured churn demands it (the append branch stays O(arrivals)).
    * Returns the published generation name. */
  def retrain(spark: SparkSession, path: String): String = {
    recover(spark, path)
    val p = new Path(path)
    val fs = fsOf(spark, p)
    val oldGen = currentGen(spark, path)
    val root = resolveRoot(spark, path)
    val stored = spark.read.parquet(s"$root/lists")
      .select(col("n_id").as("vec_id"), col("v"))
    val cents = KMeans.fit(stored)
    val cb = Quantize.pqCodebook(stored)
    val nextNum = oldGen.map(_.stripPrefix("gen-").toLong + 1L).getOrElse(1L)
    val gen = f"gen-$nextNum%06d"
    write(Quantize.IvfAdcIndex(
      cents,
      KMeans.assign(stored, cents)
        .select(col("vec_id").as("n_id"), col("cluster")),
      Quantize.pqCodesWith(cb, stored)
        .select(col("vec_id").as("n_id"), col("sub"), col("code")),
      cb,
      stored.localCheckpoint(true)), // cut lineage BEFORE the old tree retires
      new Path(p, gen).toString)
    publish(spark, path, gen)
    oldGen match {
      case Some(g) => fs.delete(new Path(p, g), true)
      case None =>
        Seq("lists", "cents", "codebook")
          .foreach(d => fs.delete(new Path(p, d), true))
    }
    gen
  }

  /** The REBUILD-EQUALITY audit — the offline check every maintenance
    * scaladoc above defers to, as a first-class API: re-derive every
    * posting from the store's own floats under the store's own frozen
    * artifacts (assign under stored cents, encode under stored
    * codebook — postings depend only on (vector, cents, codebook), the
    * q263 contract) and compare the result MULTISET-wise against what
    * the tree actually holds. Duplicated postings (a replayed
    * non-transactional append), lost postings (a swap that dropped a
    * file), misfiled postings (filed under the wrong cell) and
    * corrupted codes all surface as nonzero diff columns; a clean
    * store reads (cell, n, 0, 0) on every row.
    *
    * Cost is O(corpus) by definition — one stored-tree scan, one
    * re-encode, and two multiset anti-joins keyed on the full posting
    * (cell, n_id, codes) — which is exactly why it is an AUDIT (run
    * scheduled or after suspected crashes), while the per-batch
    * exactly-once filing ([[commitBatch]]) keeps the hot path from
    * needing it. Returns (cell, n_stored, n_only_stored,
    * n_only_rebuilt) ordered by cell. */
  def auditRebuild(spark: SparkSession, path: String): DataFrame = {
    val root = resolveRoot(spark, path)
    def lists = spark.read.parquet(s"$root/lists")
      .select(col("n_id"), col("cell").cast("long").as("cell"), col("codes"),
        col("v"))
    val cents = spark.read.parquet(s"$root/cents")
    val cb = spark.read.parquet(s"$root/codebook")
    // DISTINCT vectors: the reference tree is one posting per distinct
    // (id, vector). Without this, a duplicated stored posting would
    // duplicate the rebuild too (and multiply through the join),
    // flagging in the wrong column or not at all — the audit's teeth
    // test in ScaleSpec pins the duplicated-file case to n_only_stored.
    val floats = lists.select(col("n_id").as("vec_id"), col("v")).distinct()
    // Both posting frames feed multiple passes (each exceptAll side +
    // the count rollup), so they are persisted for the audit's lifetime
    // — without this the corpus re-encode ran once per consumer
    // (measured 13.5 s -> ~7 s at sf0.1). MEMORY_AND_DISK, so at
    // cluster scale the pinned frames spill instead of evicting; the
    // result is O(K) rows, materialized eagerly so the caches release
    // before return.
    val rebuilt = postings(
        KMeans.assign(floats, cents)
          .select(col("vec_id").as("n_id"), col("cluster")),
        Quantize.pqCodesWith(cb, floats)
          .select(col("vec_id").as("n_id"), col("sub"), col("code")),
        floats)
      .select(col("cell").cast("long").as("cell"), col("n_id"), col("codes"))
      .persist()
    val stored = lists.select(col("cell"), col("n_id"), col("codes")).persist()
    try {
      val onlyS = stored.exceptAll(rebuilt)
        .groupBy("cell").agg(count(lit(1)).as("n_only_stored"))
      val onlyR = rebuilt.exceptAll(stored)
        .groupBy("cell").agg(count(lit(1)).as("n_only_rebuilt"))
      stored.groupBy("cell").agg(count(lit(1)).as("n_stored"))
        .join(onlyS, Seq("cell"), "left")
        .join(onlyR, Seq("cell"), "left")
        .select(col("cell"), col("n_stored"),
          coalesce(col("n_only_stored"), lit(0L)).as("n_only_stored"),
          coalesce(col("n_only_rebuilt"), lit(0L)).as("n_only_rebuilt"))
        .orderBy("cell")
        .localCheckpoint(true)
    } finally { stored.unpersist(); rebuilt.unpersist(); () }
  }

  /** q269: the rebuild-equality audit run on the q263 maintenance
    * scenario — build under the old-half artifacts, append the
    * arrivals, then [[auditRebuild]] the merged tree. The engine-side
    * multiset compare is the content check; the oracle replays the
    * q261 old-fit assignment chain over raw embeddings for the
    * per-cell counts AND pins both diff columns to literal zero — so a
    * maintenance path that ever duplicated, lost, misfiled or
    * re-encoded a posting breaks the hash (nonzero diffs or shifted
    * counts), closing the "the audit would catch it" claim the r12
    * ADVICE leaned on with an actually-declared audit. */
  def q269RebuildAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val mx = e.agg(max("vec_id")).head() // 1 row by construction
    if (mx.isNullAt(0))
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("cell", "n_stored", "n_only_stored", "n_only_rebuilt")
    val cutoff = Math.floorDiv(mx.getLong(0), 2L)
    val path = graft.Scratch.dir("q269-audit")
    writeFitted(e.filter(col("vec_id") <= cutoff), path)
    append(spark, path, e.filter(col("vec_id") > cutoff))
    auditRebuild(spark, path)
  }

  /** q262: the composed index SERVED FROM THE STORE — build the q244
    * artifacts, persist them cell-partitioned, and answer the standard
    * EvalBlock query block from disk with directory pruning. The
    * output is the refined top-10 (q_id, rank, n_id, l2sq), which the
    * oracle replays with the q244 probe/ADC/refine chain directly over
    * the embeddings table — the store is an ENGINE layout choice the
    * results must be invariant to, and that invariance IS the check
    * (same two-paths-one-answer shape as q131). ScaleSpec separately
    * proves the scans prune (`PartitionFilters`, `numFiles` ≤ probed
    * cells) and that the served rows are bit-equal to the in-memory
    * [[Quantize.ivfAdcSearch]]. */
  def q262IvfServedStore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // empty-corpus guard: a partitionBy write of zero rows creates no
    // files, so the store would be unreadable — an empty corpus has an
    // empty answer, not a broken store (the empty-corpus sweep)
    if (e.agg(max("vec_id")).head().isNullAt(0))
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("q_id", "rank", "n_id", "l2sq")
    val q = e.filter(col("vec_id") < KMeans.EvalBlock)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val path = graft.Scratch.dir("q262-ivf-store")
    write(Quantize.buildIvfAdcIndex(e, materialized = true), path)
    servedTop10(spark, path, q).orderBy("q_id", "rank")
  }

  /** q263: the incremental re-index ACT — the plan→act loop q261's
    * staleness audit left open, closed for the no-retrain branch the
    * way q243 closed it for mix planning. The index was built when
    * the corpus was half its current size (the q261 old-id-snapshot
    * convention: centroids fit and codebook seeded on vec_id ≤
    * max/2); the arrivals since then are assigned under the STORED
    * centroids, encoded under the STORED codebook, and their postings
    * APPENDED into the existing cell directories — the stored corpus
    * is never read, so the maintenance job costs O(arrivals), not
    * O(corpus). The report then reads the MERGED tree: per cell, the
    * resident postings before, the arrivals appended, and the total
    * after — so the declared output flows THROUGH the persisted
    * store, and the oracle hash (the q261 old-fit assignment chain
    * over raw embeddings, which never sees the store) fails if the
    * merge ever lost, duplicated, or misfiled a posting. ScaleSpec
    * additionally pins the physical contract: untouched cells' files
    * are untouched, and the merged tree serves bit-equal to a
    * from-scratch rebuild under the same frozen artifacts (two paths,
    * one answer — the q131 shape). */
  def q263IncrementalReindex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val mx = e.agg(max("vec_id")).head() // 1 row by construction
    if (mx.isNullAt(0))
      return Seq.empty[(Long, Long, Long, Long, Double)]
        .toDF("cell", "n_before", "n_added", "n_after", "added_share")
    val cutoff = Math.floorDiv(mx.getLong(0), 2L)
    val path = graft.Scratch.dir("q263-ivf-maint")
    writeFitted(e.filter(col("vec_id") <= cutoff), path)
    append(spark, path, e.filter(col("vec_id") > cutoff))
    spark.read.parquet(s"$path/lists")
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_after"),
        sum((col("n_id") > cutoff).cast("long")).as("n_added"))
      .select(col("cell"),
        (col("n_after") - col("n_added")).as("n_before"),
        col("n_added"), col("n_after"),
        round(col("n_added").cast("double") / col("n_after"), 6)
          .as("added_share"))
      .orderBy("cell")
  }

  /** q268: the RETRAIN act run end-to-end through the persisted store
    * — the branch of the q266 maintenance gate q263 left open, so the
    * plan→act loop is now closed for BOTH of its decisions. The full
    * lifecycle the query prices: build the store under the STALE
    * artifacts (fit on the old half — the q261/q263 snapshot
    * convention), file the arrivals incrementally into it (the q263
    * append act), then EXECUTE the retrain the q266 gate's churn
    * measurement calls for on exactly this scenario: re-fit + re-encode
    * everything from the store's own postings, publish the new
    * generation via the atomic `_current` pointer swap, retire the old
    * tree, and serve the EvalBlock query block from the retrained
    * store. The oracle replays the q262 chain — probe/ADC/refine under
    * artifacts fit on the FULL corpus — over raw embeddings: it never
    * sees the store, the generations, or the append, so the hash
    * proves the retrained store is answer-identical to an index built
    * fresh on today's corpus (stale-build → append → retrain → serve
    * and fresh-build → serve are two paths to one answer — the q131
    * shape, across the store's whole mutation lifecycle). ScaleSpec
    * separately pins the physical swap: pointer flipped, exactly one
    * live generation, superseded tree gone, crash garbage recovered. */
  def q268RetrainActStore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val mx = e.agg(max("vec_id")).head() // 1 row by construction
    if (mx.isNullAt(0))
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("q_id", "rank", "n_id", "l2sq")
    val cutoff = Math.floorDiv(mx.getLong(0), 2L)
    val path = graft.Scratch.dir("q268-retrain")
    writeFitted(e.filter(col("vec_id") <= cutoff), path)
    append(spark, path, e.filter(col("vec_id") > cutoff))
    retrain(spark, path)
    val q = e.filter(col("vec_id") < KMeans.EvalBlock)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    servedTop10(spark, path, q).orderBy("q_id", "rank")
  }
}
