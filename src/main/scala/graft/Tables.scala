package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated tables (TESTDATA.md / FIXTURES.md §B):
  * TPC-H-ish star schema (`region nation customer supplier part orders
  * lineitem`) plus `documents` (text corpus), `embeddings` (64-dim float
  * vectors) and `events` (timestamped JSON-props stream table).
  *
  * One parquet file per table under the scale-factor dir. Reading goes
  * through `spark.read.parquet` so Catalyst gets a real `FileSourceScanExec`
  * with predicate pushdown + column pruning — at 100 TB these scans are the
  * dominant cost and pruning must reach the footer, so operators should
  * `.select` only what they need and filter as early as possible.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw long nanos (legacy conf) and rebuild
    * a microsecond timestamp column. Micro-truncation is invisible to the
    * day/second granularity the queries use, and the DuckDB oracle floors
    * to the same boundaries.
    *
    * The nanos flag is SESSION-GLOBAL (Spark exposes no per-read option
    * for it): it changes how any later parquet read in the session
    * decodes TIMESTAMP(NANOS) columns. All engine entry points (Verify /
    * Bench / RunOne / Smoke / drivers / TestSpark) therefore set it at
    * session construction; the set below is a defensive idempotent
    * repeat for ad-hoc sessions, not the mechanism — do not rely on it
    * under concurrent first-reads. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer `div`, not `/`: Column./ is double division, and epoch
    // nanos (~1.7e18) exceed double's 2^53 exact range — a boundary
    // timestamp could round down one microsecond
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
}
