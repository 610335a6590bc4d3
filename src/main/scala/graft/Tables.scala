package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated test lake (TESTDATA.md).
  *
  * Only projections/filters declared downstream reach Catalyst, so the
  * parquet scans keep full pushdown/pruning. `events.ts` has shipped
  * in two encodings across driver regenerations: parquet
  * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read as
  * raw nanos via `nanosAsLong` and truncate to µs, matching DuckDB's
  * read of the same file) and plain TIMESTAMP(MICROS) (read natively
  * as TIMESTAMP_NTZ, no conversion). [[events]] branches on the
  * schema Spark actually loaded, so both lakes produce the identical
  * µs TIMESTAMP_NTZ column and every oracle comparison lines up
  * exactly either way.
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

  /** events with `ts` as TIMESTAMP_NTZ(µs), matching DuckDB's read —
    * adaptive to either on-disk encoding (nanos-as-long or µs). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampNTZType))
      case TimestampType =>
        // instant-typed lake (isAdjustedToUTC=true): UTC wall time via
        // pure epoch arithmetic on an NTZ base — timezone-function
        // routes (to_utc_timestamp / convert_timezone) shift by the
        // session zone's DST gaps/overlaps for one hour a year; adding
        // epoch micros to the NTZ epoch cannot
        raw.withColumn("ts", expr(
          "timestampadd(MICROSECOND, unix_micros(ts), TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts encoding: $other")
    }
  }

  /** events restricted to a UTC instant range, with the bounds applied
    * to the RAW on-disk column *before* any conversion — a predicate on
    * a converted column can't reach the parquet scan (the cast blocks
    * pushdown), whereas a filter in the file's own domain (long nanos
    * for the nanos encoding, an NTZ timestamp literal for the µs
    * encoding) shows up in `PushedFilters` and prunes row groups /
    * partitions. This is the path a time-sliced query must take at
    * 100 TB. */
  def eventsRange(spark: SparkSession, dir: String,
      startUtc: String, endUtc: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        def ns(s: String): Long = {
          val i = java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC)
          i.getEpochSecond * 1000000000L + i.getNano
        }
        raw.filter(col("ts") >= ns(startUtc) && col("ts") < ns(endUtc))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case TimestampNTZType =>
        def ldt(s: String) = lit(java.time.LocalDateTime.parse(s))
        raw.filter(col("ts") >= ldt(startUtc) && col("ts") < ldt(endUtc))
          .withColumn("ts", col("ts").cast(TimestampNTZType))
      case TimestampType =>
        // instant-typed lake: bound in instant domain (pushable), then
        // convert to UTC wall time session-independently as in [[events]]
        def inst(s: String) = lit(java.sql.Timestamp.from(
          java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC)))
        raw.filter(col("ts") >= inst(startUtc) && col("ts") < inst(endUtc))
          .withColumn("ts", expr(
            "timestampadd(MICROSECOND, unix_micros(ts), TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts encoding: $other")
    }
  }
}
