package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding quantization — the storage/bandwidth half of a similarity
  * system. A 100 TB float32 embedding store drops to 25 TB as int8 with
  * per-vector max-abs scaling, and most ANN stacks (IVF-flat-int8 /
  * scalar-quantized HNSW) search the quantized vectors directly, so the
  * engine must be able to (a) produce the quantized form and (b) report
  * what the compression costs — per-vector reconstruction error and
  * cosine fidelity — before anyone commits a corpus to it.
  *
  * Everything is per-row column arithmetic (HOF transforms over the
  * array, no shuffle, no UDF), so quantization runs at scan speed and
  * the report is one projection. Determinism contract with the oracle:
  * every step (float→double widening, abs-max, /127, x/scale+0.5 floor,
  * clamp, dequant multiply, sequential error fold) is the same IEEE
  * operation in the same order on both engines, so values — not just
  * rounded displays — agree bit-for-bit.
  */
object Quantize {

  /** Quantized twin of an embedding table: (vec_id, scale, qvec).
    * q_i = clamp(floor(v_i/scale + 0.5), ±127), scale = max|v_i|/127
    * (floored at 1e-12 so an all-zero vector quantizes to zeros instead
    * of dividing by zero). floor(x+0.5) rather than round(): Spark's
    * HALF_UP on doubles and DuckDB's banker-ish rounding disagree at
    * .5 boundaries; floor pins one semantics on both engines. */
  def quantized(e: DataFrame): DataFrame = {
    val scale = greatest(
      aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))),
      lit(1e-12)) / lit(127.0)
    e.withColumn("scale", scale)
      .withColumn("qvec", transform(col("v"), x =>
        greatest(lit(-127.0), least(lit(127.0), floor(x / col("scale") + 0.5)))
          .cast("long")))
  }

  /** q76: int8 quantization report — per vector: the scale, the l2
    * reconstruction error (rmse over dims) and the cosine between the
    * original and its dequantized reconstruction. The fleet-health
    * numbers a quantized ANN deployment is judged by: cos_q ~ 0.999+
    * means brute-force/IVF ranking on int8 is safe at the usual
    * thresholds. */
  def q76QuantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    quantized(e)
      .withColumn("dq", transform(col("qvec"), q => q.cast("double") * col("scale")))
      .withColumn("sq_err",
        aggregate(zip_with(col("v"), col("dq"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
      .select(
        col("vec_id"),
        col("scale"),
        round(sqrt(col("sq_err") / size(col("v"))), 6).as("rmse"),
        round(graft.plans.CosineSim.cosine(col("v"), col("dq")), 6).as("cos_q"))
      .orderBy("vec_id")
  }
}
