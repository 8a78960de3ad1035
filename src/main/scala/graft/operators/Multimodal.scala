package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** A raw media blob with its id — the multimodal data model: media is an
  * opaque binary column plus typed metadata columns. */
case class MediaBlob(doc_id: Long, bytes: Array[Byte])

/** Extracted (stub-decoded) media metadata. */
case class MediaMeta(doc_id: Long, n_bytes: Long, first_byte: Long,
                     width: Long, height: Long, channels: Long)

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns and run decode / feature-extraction as partition-batched typed
  * transformations (`Dataset.mapPartitions`) — the Scala analogue of
  * `mapInPandas` batch UDFs.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic stand-in (dimensions derived from byte length/content).
  * Everything around it — binary schema, encoder-based batching, the
  * partition-wise execution shape that would host a real codec, and the
  * metadata contract — is real and oracle-checked: the stand-in formula
  * is arithmetic on byte length, so DuckDB reproduces it exactly.
  */
object Multimodal {

  /** The stub decoder: stands in for an image header parse;
    * deterministic so results are stable across retries/speculation.
    * Null-tolerant: a missing/unfetched blob (inevitable in a crawl)
    * decodes as zero-byte media instead of poisoning the task — the
    * contract a real codec wrapper needs too. */
  def decodeStub(blob: MediaBlob): MediaMeta = {
    val b = if (blob.bytes == null) MediaBlob(blob.doc_id, Array.emptyByteArray) else blob
    val n = b.bytes.length.toLong
    // "decode" only the first codepoint (bounded 4-byte prefix decode —
    // a full-blob String would allocate O(blob) per row): keeps the
    // value well-defined and oracle-reproducible for non-ASCII content
    val first =
      if (n > 0)
        new String(b.bytes, 0, math.min(4, b.bytes.length),
          java.nio.charset.StandardCharsets.UTF_8).codePointAt(0).toLong
      else -1L
    MediaMeta(
      doc_id = b.doc_id,
      n_bytes = n,
      first_byte = first,
      width = 64L + n % 512L,
      height = 64L + (n * 31L) % 512L,
      channels = 3L)
  }

  /** q46: frame sampling — the video-shaped access pattern: stride
    * through a blob, lift a fixed-size window ("frame") at each step,
    * fingerprint it. Here the window hash is the portable polynomial
    * fold so the DuckDB oracle checks the full plumbing (stride
    * arithmetic, window extraction, per-frame rows); a real codec would
    * replace the hash with a decode inside the same per-frame shape. */
  def q46FrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .filter(col("n_chars") >= 16)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(1, greatest(n_chars - 15, 1), 64), i -> substring(text, i, 16))"))
          .as(Seq("idx", "frame")))
      .select(col("doc_id"), col("idx").cast("long").as("frame_idx"),
        graft.functions.Portable.tokenId(col("frame")).as("frame_hash"))
      .orderBy("doc_id", "frame_idx")

  /** q60: content-addressed chunk deduplication — the blob-store
    * primitive: split every payload into fixed 64-byte chunks, address
    * each by md5, and report chunks stored more than once with the
    * bytes a content-addressed store would save. Completes the dedup
    * ladder: whole-doc (q30) → line/segment (q59) → binary chunk (this)
    * — the level at which media blobs dedup when documents don't.
    *
    * Scale shape: chunking is a per-row generator; the only shuffle is
    * the group-by on the 128-bit chunk address (partial-aggregated), so
    * cost is O(corpus bytes) scan + O(chunks) shuffle. The text column
    * stands in for media bytes as in q39; the md5-over-bytes plumbing
    * is identical for real blobs. */
  def q60ChunkDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(posexplode(expr(
        "transform(sequence(1, greatest(n_chars, 1), 64), i -> substring(text, i, 64))"))
        .as(Seq("idx", "chunk")))
      .filter(length(col("chunk")) > 0)
      .select(md5(col("chunk").cast("binary")).as("chunk_md5"),
        length(col("chunk")).cast("long").as("n_b"))
      .groupBy("chunk_md5")
      .agg(count(lit(1)).as("n_refs"), max("n_b").as("n_bytes"))
      .filter(col("n_refs") >= 2)
      .select(col("chunk_md5"), col("n_refs"), col("n_bytes"),
        ((col("n_refs") - 1L) * col("n_bytes")).as("bytes_saved"))
      .orderBy("chunk_md5")

  /** Resized + feature-extracted media record: the q39 metadata plus
    * the preprocessing a vision pipeline runs before embedding. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long,
                           width: Long, height: Long,
                           out_w: Long, out_h: Long,
                           code_mean: Double, code_var: Double)

  /** q93: resize + feature extraction over the decoded media — the two
    * remaining preprocessing stages a multimodal training pipeline runs
    * between decode (q39) and embedding: (1) RESIZE the stub-decoded
    * dimensions to fit a 224-pixel budget preserving aspect ratio
    * (integer arithmetic, the letterbox computation every vision
    * pipeline performs), (2) EXTRACT a content feature from the raw
    * payload — here first/second moments of the byte stream (for real
    * images this is where the pixel-statistics / CLIP-preprocess
    * normalization sits). Moments come from INTEGER sums (Σc, Σc²)
    * folded per row, so mean/variance are exact on both engines and
    * the oracle checks every value; only the final division rounds.
    *
    * Same partition-batched `mapPartitions` shape as q39: one
    * extractor instance per partition, streamed, no per-row setup, no
    * shuffle — scan-speed preprocessing at any corpus size. */
  def q93MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val blobs: Dataset[MediaBlob] = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      .as[MediaBlob]
    blobs
      .mapPartitions { it =>
        // per-partition extractor init would go here (the real pixel
        // pipeline; code-point moments are the deterministic stand-in —
        // a "symbol histogram" both engines can reproduce exactly from
        // INTEGER sums; floor(x*1e6+0.5) is the q76 rounding contract)
        it.map { blob =>
          val m = decodeStub(blob)
          val bytes = if (blob.bytes == null) Array.emptyByteArray else blob.bytes
          val str = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          var i = 0; var n = 0L; var s = 0L; var s2 = 0L
          while (i < str.length) {
            val cp = str.codePointAt(i)
            s += cp; s2 += cp.toLong * cp; n += 1
            i += Character.charCount(cp)
          }
          val budget = 224L
          val longSide = math.max(m.width, m.height)
          val outW = if (longSide <= budget) m.width else m.width * budget / longSide
          val outH = if (longSide <= budget) m.height else m.height * budget / longSide
          val mean = if (n > 0) s.toDouble / n else 0.0
          val variance = if (n > 0) s2.toDouble / n - mean * mean else 0.0
          def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
          MediaFeatures(m.doc_id, m.n_bytes, m.width, m.height, outW, outH,
            r6(mean), r6(variance))
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** q39: binary ingest + partition-batched decode. `text` is cast to
    * binary to stand in for raw media bytes (the testdata ships no blob
    * column); one decoder instance per partition, streamed — the shape a
    * real codec needs (amortized init, no per-row setup, no collect). */
  def q39MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val blobs: Dataset[MediaBlob] = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      .as[MediaBlob]
    blobs
      .mapPartitions { it =>
        // per-partition decoder init would go here (real codecs are not
        // in this container; decodeStub is the deterministic stand-in)
        it.map(decodeStub)
      }
      .toDF()
      .orderBy("doc_id")
  }
}
