package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated test lake (TESTDATA.md).
  *
  * Only projections/filters declared downstream reach Catalyst, so the
  * parquet scans keep full pushdown/pruning. `events.ts` is written as
  * parquet TIMESTAMP(NANOS) which Spark's vectorized reader rejects; we
  * read it as raw nanos (`nanosAsLong`) and convert to a µs
  * TIMESTAMP_NTZ — the same truncation DuckDB applies reading the file,
  * so oracle comparisons line up exactly.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events with `ts` as TIMESTAMP_NTZ(µs), matching DuckDB's read. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
  }

  /** events restricted to a UTC instant range, with the bounds applied
    * to the RAW nanosecond column *before* timestamp conversion — a
    * predicate on the converted column can't reach the parquet scan
    * (the cast blocks pushdown), whereas the long-range filter shows up
    * in `PushedFilters` and prunes row groups / partitions. This is the
    * path a time-sliced query must take at 100 TB. */
  def eventsRange(spark: SparkSession, dir: String,
      startUtc: String, endUtc: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def ns(s: String): Long =
      java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC)
        .getEpochSecond * 1000000000L
    table(spark, dir, "events")
      .filter(col("ts") >= ns(startUtc) && col("ts") < ns(endUtc))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
  }
}
