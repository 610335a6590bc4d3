package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Op, Tables}
import graft.functions._

/** Batch twins of the streaming jobs in [[StreamingJobs]] — same
  * semantics expressed over the static `events` table so the driver's
  * DuckDB oracle can gate them. StreamingSpec asserts the streaming
  * plans produce these exact results through a memory sink.
  */
object BatchEquivalents {

  // --- s1_window_candles: per-minute OHLCV bars per event type ---------
  // open/close via min_by/max_by on the event timestamp (nanosecond
  // timestamps are unique per (symbol, ts) — verified on the test lake).

  private def s1(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type").as("symbol"),
        window(col("ts"), "1 minute").getField("start").as("minute"))
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("value"), col("ts")).as("open"),
        max_by(col("value"), col("ts")).as("close"),
        min(col("value")).as("low"),
        max(col("value")).as("high"),
        dsum(col("value")).as("volume"))
      .orderBy("symbol", "minute")

  private val s1Sql =
    s"""SELECT event_type AS symbol,
       |       time_bucket(INTERVAL '1 minute', ts) AS minute,
       |       COUNT(*) AS n_events,
       |       min_by(value, ts) AS open,
       |       max_by(value, ts) AS close,
       |       MIN(value) AS low,
       |       MAX(value) AS high,
       |       ${dsumSql("value")} AS volume
       |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  // --- s2_sessionize: gap-based sessions (30 min) per user -------------
  // Batch shape of the stateful streaming job: lag + cumulative flag sum
  // assigns session ids, then one aggregate per session.

  private val GapUs = 30L * 60 * 1000 * 1000

  private def s2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = Tables.events(s, dir)
      .withColumn("us", unix_micros(col("ts").cast(TimestampType)))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(w) > GapUs || lag(col("us"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    sessions.groupBy("user_id", "session_id")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .orderBy("user_id", "session_id")
  }

  private val s2Sql =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts, value,
       |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > $GapUs
       |                OR lag(epoch_us(ts), 1) OVER w IS NULL
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sessions AS (
       |  SELECT user_id, ts, value,
       |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged)
       |SELECT user_id, session_id,
       |       MIN(ts) AS session_start,
       |       MAX(ts) AS session_end,
       |       COUNT(*) AS n_events,
       |       ${dsumSql("value")} AS total_value
       |FROM sessions GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  // --- s3_stream_dedup: event-stream deduplication ---------------------
  // Batch shape of streaming dropDuplicatesWithinWatermark: one
  // representative event per (user_id, event_type, minute) — the state
  // key a streaming dedup would hold within its watermark horizon.

  private def s3(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"),
        date_trunc("minute", col("ts")).as("minute"))
      .agg(min(col("event_id")).as("first_event"), count(lit(1)).as("n_dups"))
      .orderBy("user_id", "event_type", "minute")

  private val s3Sql =
    """SELECT user_id, event_type, date_trunc('minute', ts) AS minute,
      |       MIN(event_id) AS first_event, COUNT(*) AS n_dups
      |FROM events GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("s1_window_candles", s1, Some(s1Sql)),
    Op("s2_sessionize", s2, Some(s2Sql)),
    Op("s3_stream_dedup", s3, Some(s3Sql)))
}
