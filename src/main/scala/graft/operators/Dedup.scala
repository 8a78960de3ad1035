package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Deduplication family for a large-scale training-data pipeline: exact
  * (hash group-by), MinHash signatures + LSH banding, SimHash, and n-gram
  * Jaccard — each expressed as declarative relational plans so Catalyst
  * gets partial aggregation, pushdown and AQE for free, and each
  * reproducible in DuckDB SQL for the oracle (the portable polynomial
  * hash in [[graft.functions.Portable]] is the shared randomness).
  *
  * Scale design: all variants reduce documents to small per-doc
  * signatures BEFORE any join. The only shuffles are on signature keys
  * (vocab-, band- or shingle-cardinality), never doc × doc. The classic
  * trap — pairwise similarity — appears only AFTER candidate generation
  * (LSH buckets / shared-shingle pairs with a document-frequency cutoff),
  * which is how MinHash dedup is run on web-scale corpora (RefinedWeb /
  * SlimPajama style).
  */
object Dedup {

  /** q30: exact dedup — group identical texts by a 128-bit content hash
    * (md5 of the UTF-8 bytes; byte-identical in DuckDB), keep the
    * smallest doc_id as canonical. The hash keeps shuffle rows narrow at
    * corpus scale. Width matters: an earlier version grouped on the
    * 30-bit portable fingerprint and a 100× amplification run (500k
    * docs) produced ~844 birthday collisions — false merges an exact
    * dedup must not have. The rolling fingerprint remains the right tool
    * for order-sensitive similarity (q38), not identity. */
  def q30ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_hash"))
      .groupBy("content_hash")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy("canonical_id")

  /** Per-(doc, word) distinct tokens — the common prefix of the hashing
    * dedupers. */
  private def docTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Portable.tokenize(col("text"))).as("word"))
      .distinct()

  /** Fixed MinHash band parameters (a, b) — shared literally with the
    * oracle SQL. 8 hash functions h_j(x) = (a_j * x + b_j) mod P. */
  val minhashBands: Seq[(Int, Long, Long)] = Seq(
    (0, 1000003L, 12345L), (1, 999983L, 54321L), (2, 850021L, 98765L),
    (3, 774047L, 13579L), (4, 655243L, 24680L), (5, 524287L, 86420L),
    (6, 433003L, 11111L), (7, 334213L, 99999L))

  /** q31: MinHash signatures — for each doc and each of 8 hash bands,
    * min((a*h(word)+b) mod P) over the doc's distinct words. Equal
    * signatures in a band = LSH candidate bucket. The 8 band minima are
    * static aggregate columns over one row per (doc, word-hash) —
    * unpivoted to (doc, band, minhash) AFTER aggregation, so the
    * pre-shuffle row count is O(doc tokens), not ×8 (same lesson as
    * q32: the bands-table cross join cost 8× shuffle rows at a 100×
    * corpus). */
  def q31MinHashSig(spark: SparkSession, dir: String): DataFrame = {
    val mins = minhashBands.map { case (band, a, b) =>
      min((col("h") * a + b) % Portable.P).as(s"m$band")
    }
    docTokens(spark, dir)
      .withColumn("h", Portable.tokenId(col("word")))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        posexplode(array(minhashBands.map { case (band, _, _) => col(s"m$band") }: _*))
          .as(Seq("band", "minhash")))
      .select(col("doc_id"), col("band").cast("long").as("band"), col("minhash"))
      .orderBy("doc_id", "band")
  }

  /** q32: 16-bit SimHash — each distinct word votes ±1 on each bit of
    * its hash; bit set iff the vote sum is positive. The 16 bit-votes
    * are 16 static aggregate columns over one (doc, word-hash) row —
    * NOT a ×16 bits-table join: at a 100×-amplified corpus the join
    * form pushed 240M rows through the shuffle (11s) where this shape
    * shuffles O(docs) partial-agg buffers. */
  def q32SimHash(spark: SparkSession, dir: String): DataFrame = {
    val votes = (0 until 16).map { b =>
      sum(when((col("h").divide(lit(1L << b))).cast("long") % 2 === 1, 1L).otherwise(-1L)).as(s"v$b")
    }
    val simhash = (0 until 16)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    docTokens(spark, dir)
      .withColumn("h", Portable.tokenId(col("word")))
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
      .orderBy("doc_id")
  }

  /** q33: n-gram Jaccard near-dup candidates — 4-word shingles, inverted-
    * index self-join on shingle, Jaccard = |∩| / (|A|+|B|-|∩|), keep the
    * top-20 most similar pairs. The document-frequency cutoff (df ≤ 50)
    * is prefix filtering: it bounds the worst-case join fanout per
    * shingle and drops only stop-shingles that carry no dedup signal
    * (the cutoff is part of the operator contract, mirrored in the
    * oracle). Shingle width matters at scale: on this corpus 3-grams
    * produce ~1.3M candidate pairs, 4-grams ~50k — same knob that keeps
    * web-scale MinHash dedup tractable. */
  def q33NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // One scan, persisted: both downstream consumers (pair generation
    // and per-doc sizes) would otherwise re-run the explode. At cluster
    // scale this is a checkpoint of O(corpus shingles), the standard
    // shape for multi-pass dedup.
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Portable.shingles(split(col("text"), " "), 4)).as("shingle"))
      .persist()
    try {
      // Candidate pairs by bucket, not by self-join: group each shingle's
      // doc list (the df ≤ 50 cutoff bounds the list, so no skew bomb),
      // emit ordered (a, b) pairs with one HOF — one shuffle on shingle
      // replaces the self-join's two, and pair generation is codegen'd.
      val pairs = sh.groupBy("shingle")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")).between(2, 50))
        .select(explode(expr(
          "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), b -> struct(a AS id_a, b AS id_b))))"
        )).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("inter"))
      // per-doc shingle-set sizes: tiny (one row per doc) — broadcast.
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val top = pairs
        .join(broadcast(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("size_a"))), "id_a")
        .join(broadcast(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("size_b"))), "id_b")
        .select(col("id_a"), col("id_b"),
          round(col("inter") / (col("size_a") + col("size_b") - col("inter")), 6).as("jaccard"))
        .orderBy(desc("jaccard"), asc("id_a"), asc("id_b"))
        .limit(20)
      // Materialize eagerly so the shingle cache can be released before
      // returning (a lazy plan would pin it for the session lifetime).
      // The result is a top-20 by contract, so collecting is driver-safe
      // at any corpus size — the LIMIT, not the corpus, bounds it.
      val rows = top.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), top.schema)
    } finally sh.unpersist()
  }

  /** Library API: approximate near-duplicate pairs via MinHashLSH over
    * word sets. Returns (id_a, id_b, jaccard_dist) with id_a < id_b and
    * Jaccard distance ≤ `maxDistance`. LSH bounds candidate generation to
    * bucket collisions — the N²-free path at corpus scale.
    *
    * @param docs   (id: long, text: string)
    * @param maxDistance Jaccard distance threshold (0 = identical sets) */
  def approxNearDupPairs(docs: DataFrame, maxDistance: Double): DataFrame = {
    import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
    val tokens = docs.select(col("id"), Portable.tokenize(col("text")).as("words"))
      .filter(size(col("words")) > 0)
    val cv = new CountVectorizer().setInputCol("words").setOutputCol("features")
      .setBinary(true).setMinDF(1.0)
    val vecs = cv.fit(tokens).transform(tokens)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(5).setSeed(42L)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, maxDistance, "jaccard_dist")
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"), col("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
  }

  /** q49: embedding-cosine near-duplicates — exact pairs above a cosine
    * threshold. Brute force is the oracle-checkable exact baseline (the
    * blocked variants — MinHashLSH q42, random-projection q43, IVF
    * q45 — are the scale path that feeds candidate pairs to this same
    * scoring). The fused [[graft.plans.CosineSim]] expression keeps the
    * N²/2 inner loop allocation-free. */
  def q49EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.CosineSim
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(CosineSim.cosine(col("a.v"), col("b.v")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.45)
      .orderBy(desc("cos_sim"), asc("id_a"), asc("id_b"))
  }

  /** Library API: LSH-blocked embedding near-dup — the scale path for
    * what q49 does exactly. Vectors are L2-normalized so squared
    * euclidean distance maps to cosine (d² = 2 − 2·cos); random-
    * projection buckets generate candidates, and the join compares only
    * within-bucket pairs. Measured: exact all-pairs at 20k vectors is
    * ~200M cosine evaluations (212s on 32 threads) and grows
    * quadratically; the blocked join's cost follows bucket occupancy.
    *
    * @param embeddings (vec_id, embedding)
    * @param minCosine  cosine similarity threshold */
  def approxEmbeddingNearDup(embeddings: DataFrame, minCosine: Double): DataFrame = {
    import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, Normalizer}
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = new Normalizer().setInputCol("raw").setOutputCol("features").setP(2.0)
      .transform(embeddings.select(col("vec_id"),
        array_to_vector(col("embedding").cast("array<double>")).as("raw")))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(1.0).setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(vecs)
    val maxDist = math.sqrt(math.max(0.0, 2.0 - 2.0 * minCosine))
    model.approxSimilarityJoin(vecs, vecs, maxDist, "dist")
      .select(col("datasetA.vec_id").as("id_a"), col("datasetB.vec_id").as("id_b"),
        round(lit(1.0) - col("dist") * col("dist") / 2.0, 6).as("cos_sim"))
      .filter(col("id_a") < col("id_b"))
  }

  /** q42 (rows-only): MLlib MinHashLSH signatures over word sets — the
    * library-native LSH surface (model hashes are seeded but not
    * reproducible in DuckDB, so no SQL oracle; the approx-join path is
    * exercised in the test suite). */
  def q42MlMinHashLsh(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Portable.tokenize(col("text")).as("words"))
      .filter(size(col("words")) > 0) // MinHashLSH rejects all-zero vectors
    val cv = new CountVectorizer().setInputCol("words").setOutputCol("features")
      .setBinary(true).setMinDF(1.0)
    val vecs = cv.fit(docs).transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(vecs)
    model.transform(vecs)
      .select(col("doc_id"), posexplode(col("hashes")).as(Seq("table_id", "hvec")))
      .select(col("doc_id"), col("table_id").cast("long").as("table_id"),
        org.apache.spark.ml.functions.vector_to_array(col("hvec")).getItem(0).cast("long").as("hash"))
      .orderBy("doc_id", "table_id")
  }
}
