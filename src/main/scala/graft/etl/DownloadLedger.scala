package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Failure accounting for the acquisition stage — the reference
  * downloader's bounded-retry / exponential-backoff / 404-no-retry /
  * per-file stats semantics (`glue_binance_downloader.py:107-152`:
  * `for attempt in range(max_retries)`, 404 → return without retry,
  * `wait_time = 2 ** attempt`, and the `stats` dict) re-expressed as
  * DATA. A Spark job doesn't sleep in a retry loop; the scheduler
  * re-runs it. So the retry state machine becomes three tables:
  *
  *  - an append-only ATTEMPT LEDGER — one row per (file, attempt):
  *    `(file_key, attempt_ts, status_code, bytes)`; the producer
  *    (whatever fetches) only ever appends;
  *  - the per-file STATUS REPORT derived from it — the accounting the
  *    reference logs per file, as a queryable table: attempts used,
  *    terminal state (`ok` / `not_found` / `exhausted`) or
  *    `retry_pending` with the exponential-backoff `due_at`;
  *  - the RETRY QUEUE — the files the NEXT run should actually fetch:
  *    `retry_pending` rows whose backoff has elapsed.
  *
  * Scale: the ledger is one row per attempt (not per data row); the
  * report is one groupBy(file_key) — a single bounded shuffle. The
  * ingest twin (`IncrementalIngest`'s load ledger) handles the
  * skip-if-present half of the reference's semantics; this handles
  * the failure half. EtlSpec pins the classification rules, the
  * backoff arithmetic, and a full crash-retry replay to `ok`.
  */
object DownloadLedger {

  /** The reference's parameters: 3 bounded attempts, 2^attempt-second
    * backoff (1s, 2s after failures 1 and 2). */
  val MaxRetries = 3
  val BackoffBaseSec = 1L

  val attemptSchema: StructType = StructType(Seq(
    StructField("file_key", StringType),
    StructField("attempt_ts", TimestampType),
    StructField("status_code", IntegerType),
    StructField("bytes", LongType)))

  def ledgerPath(root: String): String = s"$root/_download_attempts"

  def append(spark: SparkSession, root: String, attempts: DataFrame): Unit =
    attempts.select(attemptSchema.fieldNames.toIndexedSeq.map(col): _*)
      .write.mode(SaveMode.Append).parquet(ledgerPath(root))

  def read(spark: SparkSession, root: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(ledgerPath(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(attemptSchema).parquet(p.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], attemptSchema)
  }

  /** Per-file accounting from the raw attempt stream. Classification
    * mirrors the reference's control flow exactly:
    *  - any 2xx            → `ok` (the loop returns on success);
    *  - else any 404       → `not_found` (no-retry: terminal on first
    *                          sight, however many attempts remain);
    *  - else ≥ maxRetries  → `exhausted` (the `stats['failed']` bucket);
    *  - else               → `retry_pending`, with
    *                          `due_at = last_ts + base·2^(attempts−1)`
    *                          (the reference waits 2^attempt seconds
    *                          after 0-based attempt `attempts−1`).
    * One groupBy(file_key); conditional aggregates, no self-join. */
  def statusReport(attempts: DataFrame,
      maxRetries: Int = MaxRetries,
      backoffBaseSec: Long = BackoffBaseSec): DataFrame = {
    val isOk = col("status_code") >= 200 && col("status_code") < 300
    attempts
      .groupBy("file_key")
      .agg(
        count(lit(1)).as("n_attempts"),
        max(when(isOk, 1).otherwise(0)).as("any_ok"),
        max(when(col("status_code") === 404, 1).otherwise(0)).as("any_404"),
        min("attempt_ts").as("first_ts"),
        max("attempt_ts").as("last_ts"),
        sum(when(isOk, col("bytes")).otherwise(0L)).as("ok_bytes"))
      .withColumn("status",
        when(col("any_ok") === 1, "ok")
          .when(col("any_404") === 1, "not_found")
          .when(col("n_attempts") >= maxRetries, "exhausted")
          .otherwise("retry_pending"))
      .withColumn("due_at",
        // microsecond arithmetic: unix_timestamp() would truncate a
        // sub-second last_ts, making the retry eligible up to ~1s
        // before base·2^(n−1) has fully elapsed
        when(col("status") === "retry_pending",
          timestamp_micros(unix_micros(col("last_ts").cast(TimestampType))
            + lit(backoffBaseSec * 1000000L)
              * expr("shiftleft(1L, CAST(n_attempts - 1 AS INT))")))
          .otherwise(lit(null).cast(TimestampType)))
      .drop("any_ok", "any_404")
  }

  /** What the next scheduled run fetches: retryable files whose
    * exponential backoff has elapsed at `asOf`. */
  def retryQueue(report: DataFrame, asOf: Column): DataFrame =
    report.filter(col("status") === "retry_pending" && col("due_at") <= asOf)
      .select("file_key", "n_attempts", "due_at")

  /** The reference's end-of-run `stats` dict as a one-row frame. */
  def summary(report: DataFrame): DataFrame =
    report.agg(
      count(lit(1)).as("files_total"),
      sum(when(col("status") === "ok", 1).otherwise(0)).as("files_ok"),
      sum(when(col("status") === "not_found", 1).otherwise(0)).as("files_not_found"),
      sum(when(col("status") === "exhausted", 1).otherwise(0)).as("files_exhausted"),
      sum(when(col("status") === "retry_pending", 1).otherwise(0)).as("files_retry_pending"),
      sum(col("ok_bytes")).as("total_bytes"))
}
