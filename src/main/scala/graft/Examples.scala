package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Usage examples for the library APIs that are not part of the declared
  * query surface — near-dup detection and ad-hoc vector search. Run with
  * `sbt "runMain graft.Examples"`. */
object Examples {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // near-duplicate detection over a corpus with planted dups
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tomorrow"),
      (3L, "catalyst plans exchanges and whole stage codegen spans"),
    ).toDF("id", "text")
    println("near-dup pairs (jaccard distance <= 0.4):")
    Dedup.approxNearDupPairs(docs, maxDistance = 0.4).orderBy("id_a", "id_b").show()

    // ad-hoc top-k cosine search against the embeddings table
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    println("top-5 cosine neighbors of vec 0:")
    Similarity.topKCosine(emb, query, 5).show()

    // train a BPE tokenizer on any corpus and inspect the merges
    val merges = operators.Bpe.train(docs.withColumnRenamed("text", "body"), "body", numMerges = 8)
    println(s"learned merges: $merges")
    println("encodings under the frozen pretrained table:")
    Seq("customer", "window", "stream").toDF("word")
      .select(col("word"), graft.plans.BpeEncode.bpe(col("word"), operators.Bpe.pretrainedMerges).as("tokens"))
      .show(truncate = false)

    // the native expressions are plain SQL functions after registration
    graft.plans.GraftExtensions.register(spark)
    spark.sql(
      """SELECT word, token_id(word) AS token, bpe_encode(word) AS pieces
        |FROM VALUES ('spark'), ('catalyst') AS t(word)""".stripMargin).show(truncate = false)

    // resolve near-dup pairs into clusters and elect canonicals
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b") // 0~1, 1~2 ⇒ one cluster
    println("connected components over the pair graph:")
    operators.Graph.connectedComponents(pairs).orderBy("id").show()

    // scrub PII and report what was redacted
    println("PII scrub:")
    Seq((0L, "reach me at jane@example.com or 415 555 0142"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), operators.TextAnalysis.redactPii(col("text")).as("clean"))
      .show(truncate = false)

    // per-doc repetition statistics via the native one-pass expression
    println("repetition stats (n_bigrams, n_distinct, top_cnt):")
    spark.sql("SELECT repetition_stats(array('buy','now','buy','now','buy')) AS st").show()

    // binary-quantized retrieval: sign-bit signatures + two-stage search
    val corpus = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val corpusSig = operators.Quantize.binarySignatures(corpus)
    println("BQ two-stage top-3 for vectors 0-1 (Hamming shortlist, exact re-rank):")
    operators.Quantize.bqTopK(corpusSig,
      operators.Quantize.asQueryBlock(corpus.filter(col("vec_id") < 2)),
      shortlistN = 20, k = 3).show()

    // thresholded text near-dup edge list (the q33 shape, no top-k cap)
    println("text near-dup edges at jaccard >= 0.5:")
    operators.Dedup.textNearDupEdges(
      docs.withColumnRenamed("id", "doc_id"), k = 4, dfCap = 50, minJaccard = 0.5)
      .orderBy("id_a", "id_b").show()

    // vocabulary-independent DSIR (hashed features) and sampled MinHash
    // calibration — the production modes of q81/q77
    println("hashed-feature DSIR weights (bounded model at any corpus size):")
    operators.TextAnalysis.dsirWeightHashed(spark, "/root/testdata/sf0.001", buckets = 1000)
      .show(3)
    println("sampled MinHash calibration (10% of pairs):")
    operators.Dedup.minhashCalibration(spark, "/root/testdata/sf0.001", pairSamplePct = 10)
      .show(3)

    // BM25 search over any (doc_id, text) table
    println("BM25 top-3 for {quick, fox}:")
    operators.Retrieval.bm25TopK(
      docs.withColumnRenamed("id", "doc_id"), Seq("quick", "fox"), 3).show()

    // drift between two corpus snapshots (vanished cells stay finite)
    println("snapshot drift, old = half the corpus:")
    val snap = Tables.documents(spark, "/root/testdata/sf0.001")
    operators.TextAnalysis.snapshotDrift(snap.filter(col("doc_id") % 2 === 0), snap)
      .show(5)

    // the one-call materialized build: corpus in, training set out
    val outDir = java.nio.file.Files.createTempDirectory("graft-example-build").toString
    val report = operators.TrainingSet.build(spark, "/root/testdata/sf0.001", outDir)
    println(s"training-set build: $report")
    println(s"artifacts under $outDir: train/ validation/ test/ manifest/")

    // embedding-space anisotropy check + projection
    val (comps, ratios) = operators.LinAlg.pca(emb, k = 4)
    println(s"PCA explained-variance spectrum: ${ratios.map(r => f"$r%.4f").mkString(", ")}")
    operators.LinAlg.project(emb, comps.take(2)).show(3)

    // embedding drift: did the space move between snapshots?
    println("embedding drift, snapshot split by vec_id parity:")
    operators.LinAlg.dimDrift(
      operators.LinAlg.dimStats(emb.filter(col("vec_id") % 2 === 0)),
      operators.LinAlg.dimStats(emb.filter(col("vec_id") % 2 =!= 0)))
      .orderBy(abs(col("mean_shift")).desc).show(3)

    // whitened near-dup: anisotropy-corrected semantic duplicates
    println("top whitened near-dup pairs:")
    operators.LinAlg.q105WhitenedNearDup(spark, "/root/testdata/sf0.001").show(3)

    // exact snapshot delta: which docs changed between crawls?
    println("snapshot content delta (synthetic revision):")
    operators.TextAnalysis.q106SnapshotDelta(spark, "/root/testdata/sf0.001")
      .groupBy("status").count().show()

    // incremental retention: fold append-only week sightings from the
    // event stream into the q101 cohort matrix, no history recompute
    println("stream-folded retention cohort matrix (first 5 rows):")
    val evDir = java.nio.file.Files.createTempDirectory("graft-example-ret")
    java.nio.file.Files.copy(
      java.nio.file.Path.of("/root/testdata/sf0.001/events.parquet"),
      evDir.resolve("events.parquet"))
    val retQ = streaming.EventStream.retentionWeeks(
        streaming.EventStream.readStream(spark, evDir.toString)
          .select(col("user_id"), col("event_id"), col("ts"))
          .as[streaming.EventStream.Event])
      .writeStream.outputMode("append").format("memory").queryName("ret_weeks")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-example-ret-ckpt").toString)
      .start()
    try retQ.processAllAvailable() finally retQ.stop()
    streaming.EventStream.retentionMatrix(spark.table("ret_weeks")).show(5)

    // language-ID: fit once on a labeled seed, score any corpus
    println("seed-fit language ID accuracy:")
    val model = operators.TextAnalysis.langIdFit(snap.filter(col("doc_id") % 10 < 3))
    operators.TextAnalysis.langIdScore(snap, model)
      .agg(avg(col("is_correct")).as("accuracy")).show()

    // unigram-LM tokenizer: train on any corpus, Viterbi-segment words
    val uni = operators.Unigram.trainFromCounts(
      Seq(("walking", 30L), ("talking", 25L), ("walks", 20L), ("talks", 15L)),
      vocabSize = 24)
    println("unigram Viterbi segmentations:")
    Seq("walking", "talks", "stalking").foreach { w =>
      val (pieces, score) = operators.Unigram.viterbi(w, uni)
      println(f"  $w%-10s -> ${pieces.mkString("|")}%-14s score $score%.3f")
    }

    // RAG chunking: content-addressed overlap chunks for any doc table
    println("overlap chunks (window 200, stride 150):")
    operators.TextAnalysis.chunkOverlap(
        snap.limit(2).select(col("doc_id"), col("text"),
          length(col("text")).cast("long").as("n_chars")))
      .show(truncate = false)

    // NFC canonicalization: two byte-different encodings of the same
    // visible text collapse to ONE content key before dedup
    println("nfc gate: composed vs decomposed 'café' share an md5:")
    Seq((1L, "caf\u00e9 crawl"), (2L, "cafe\u0301 crawl")).toDF("id", "text")
      .select(col("id"), md5(col("text").cast("binary")).as("raw_key"),
        md5(plans.NfcNormalize.nfc(col("text")).cast("binary")).as("nfc_key"))
      .show(truncate = false)

    // diversity-aware retrieval: MMR re-rank vs pure top-k for vec 0
    println("MMR top-5 for query 0 (vs q34's pure relevance):")
    operators.Similarity.q161MmrRerank(spark, "/root/testdata/sf0.001")
      .filter(col("q_id") === 0).show()

    // cluster-balanced sampling: equal quota per semantic region
    println("diversity sample, picks per k-means cell:")
    operators.KMeans.q158DiversitySample(spark, "/root/testdata/sf0.001")
      .groupBy("cluster").count().orderBy("cluster").show(4)

    // distribution shift as a distance: which sources' length mixes
    // sit furthest apart (W1 keeps growing where JS saturates)
    println("farthest source pairs by length-distribution EMD:")
    operators.TextAnalysis.q160SourceEmd(spark, "/root/testdata/sf0.001")
      .orderBy(desc("emd_tokens")).show(3)

    // data-driven attribution: what each channel is WORTH (removal
    // effect), not just what it happened to touch last
    println("Markov removal-effect attribution vs last-touch:")
    operators.Temporal.q163MarkovAttribution(spark, "/root/testdata/sf0.001").show()

    // the composed production ANN index: build the IVF+ADC artifacts
    // once (the tables a serving tier keeps hot), then probe — the
    // same core the streaming VecStream.ivfAdcProbe twin runs per
    // micro-batch
    val idx = operators.Quantize.buildIvfAdcIndex(corpus, materialized = true)
    println("IVF+ADC top-3 for queries 0-1 (probe -> code-table ADC -> exact refine):")
    operators.Quantize.ivfAdcSearch(idx,
        corpus.filter(col("vec_id") < 2)
          .select(col("vec_id").as("q_id"), col("v").as("qv")))
      .filter(col("rank") <= 3).show()

    spark.stop()
  }
}
