package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.functions._

/** Structured Streaming versions of the analytics surface: the
  * reference's batch ETL feeding a live lake becomes `readStream` →
  * transforms → `writeStream` here.
  *
  * Scale notes: the candle job is watermark-bounded (state per
  * (symbol, window) only within the lateness horizon); sessionization
  * keeps one small state object per active user with a processing-time
  * timeout, so state size tracks *active* keys, not history.
  */
object StreamingJobs {

  /** Event row as consumed from a stream source. */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** A CDC change record for a minimal trades lake (tests/examples). */
  case class CdcChange(trade_id: Long, price: Double, year: Int, month: Int,
      day: Int, symbol: String, op: String, seq: Long)

  case class SessionState(start: Long, end: Long, n: Long, total: Double)

  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Per-minute OHLCV candles over a streaming event feed, watermarked
    * so late data beyond 10 minutes is dropped and state is bounded. */
  def candles(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("event_type").as("symbol"), window(col("ts"), "1 minute"))
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("value"), col("ts")).as("open"),
        max_by(col("value"), col("ts")).as("close"),
        min(col("value")).as("low"),
        max(col("value")).as("high"),
        dsum(col("value")).as("volume"))
      .select(col("symbol"), col("window.start").as("minute"),
        col("n_events"), col("open"), col("close"), col("low"), col("high"), col("volume"))

  /** Stream-stream time-range join: each trade joined to the quotes of
    * the same user in the trailing 60 minutes. Watermarks on BOTH sides
    * bound the buffered state — Spark retains only quotes young enough
    * to still match a future trade. Batch twin: r14_range_join. */
  def streamRangeJoin(trades: DataFrame, quotes: DataFrame): DataFrame = {
    val t = trades.withWatermark("ts", "70 minutes")
      .select(col("event_id").as("trade_event"), col("user_id"), col("ts").as("t_ts"))
    val q = quotes.withWatermark("ts", "70 minutes")
      .select(col("user_id").as("q_user"), col("ts").as("q_ts"), col("value").as("q_value"))
    t.join(q,
      col("user_id") === col("q_user") &&
      col("q_ts") >= col("t_ts") - expr("INTERVAL 60 MINUTES") &&
      col("q_ts") <= col("t_ts"))
  }

  /** Streaming dedup: one event per (user, type, minute) key within
    * the watermark horizon — state for a key is dropped once the
    * watermark passes it, so state size is bounded by the horizon. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("minute", date_trunc("minute", col("ts")))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")

  /** Windowed streaming heavy hitters: the SpaceSaving
    * `TypedImperativeAggregate` (graft.plans.HeavyHitters) running as a
    * plain aggregate inside a watermarked window groupBy — per-window
    * state is one bounded sketch (≤ capacity counters), merged
    * incrementally across micro-batches by the engine like any agg
    * buffer. The custom-aggregate tier composes with Structured
    * Streaming unchanged. */
  def heavyHittersStream(events: DataFrame, capacity: Int = 64): DataFrame = {
    graft.plans.HeavyHitters.register(events.sparkSession)
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(graft.plans.HeavyHitters.heavy_hitters(col("event_type"), capacity).as("top_types"))
      .select(col("window.start").as("window_start"), col("top_types"))
  }

  /** Windowed streaming quantile monitor (q25's twin): the t-digest
    * `TypedImperativeAggregate` (graft.plans.TDigestSketch) as a plain
    * aggregate inside a watermarked window groupBy — per-(window, type)
    * state is one bounded digest (≤ ~2δ centroids), merged
    * incrementally across micro-batches by the engine like any agg
    * buffer; completing the sketch trio's streaming story next to
    * [[heavyHittersStream]]. Estimates are merge-order-dependent
    * (inherent to every t-digest), so the twin's pinned contract
    * mirrors q25's: EXACT min/max (p=0/1), rank-error-bounded interior
    * quantiles — StreamingSpec checks both against batch exact values
    * across a multi-batch feed. */
  def quantileStream(events: DataFrame, compression: Int = 100): DataFrame = {
    graft.plans.TDigestSketch.register(events.sparkSession)
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(graft.plans.TDigestSketch.tdigest_quantiles(
        col("value").cast("double"), compression, Seq(0.0, 0.5, 0.99, 1.0)).as("qs"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("qs").getItem(0).as("vmin"), col("qs").getItem(1).as("p50"),
        col("qs").getItem(2).as("p99"), col("qs").getItem(3).as("vmax"))
  }

  /** Benchmark shingle index for the streaming decontamination gate:
    * the distinct 3-gram set of the held-out eval suite, materialized
    * once (vocabulary-bounded — MBs vs the TB-scale feed). */
  def contaminationIndex(evalDocs: DataFrame): DataFrame =
    graft.operators.Curation.docShingles(evalDocs)
      .select("shingle").distinct()
      .withColumn("hit", lit(1)).localCheckpoint()

  /** Streaming benchmark-decontamination gate (text_contamination's
    * twin, and the fourth admission control next to the quality gate,
    * redaction, and the near-dup gate): each micro-batch of incoming
    * documents runs the SAME batch core (Curation.contaminationOf —
    * shingle pass, ledger-gated broadcast join against the static
    * benchmark shingle index, per-doc aggregate) via foreachBatch;
    * clean docs append to the training lake, flagged docs to
    * quarantine with their shingle counts and contaminated fraction.
    * Stream-static and stateless across batches — a doc's verdict
    * depends only on the fixed eval suite, so the union of per-batch
    * verdicts equals the batch op on the whole feed (StreamingSpec
    * pins that). Same at-least-once parquet-append caveat as every
    * foreachBatch file sink; content is deterministic, replay
    * converges. */
  def contaminationGateStream(docs: DataFrame, evalSet: DataFrame,
      cleanPath: String, quarantinePath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // persist (not localCheckpoint): no sink here reads a path
          // the batch writes, so lineage truncation isn't needed, and
          // persist gives a DETERMINISTIC unpersist at batch end — a
          // long-lived stream must not accumulate per-batch blocks
          val b = batch.persist()
          // the ledger key carries the gate's checkpoint identity: two
          // gates with different eval suites in one application must
          // not share a memoized eval-set count
          val verdict = graft.operators.Curation.contaminationOf(
            s, b, evalSet, s"$checkpointDir#contamination_evalset")
          // LEFT join: a doc too short to shingle (< 3 tokens) has no
          // verdict row but MUST still route — it carries no 3-gram,
          // so it cannot be contaminated, and an admission gate that
          // silently drops feed rows is data loss
          val judged = b.join(verdict, Seq("doc_id"), "left")
            .withColumn("n_shingles", coalesce(col("n_shingles"), lit(0L)))
            .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
            .withColumn("contaminated_frac", coalesce(col("contaminated_frac"), lit(0.0)))
            .withColumn("flag_contaminated", coalesce(col("flag_contaminated"), lit(false)))
            .persist()
          try {
            judged.filter(!col("flag_contaminated"))
              .write.mode("append").parquet(cleanPath)
            judged.filter(col("flag_contaminated"))
              .write.mode("append").parquet(quarantinePath)
          } finally { judged.unpersist(); b.unpersist(); () }
        }
      }
      .start()

  /** Per-benchmark positional shingle index for the streaming
    * decontamination SCRUB: distinct (bench_id, shingle) pairs of the
    * held-out eval suite, materialized once (eval-suite-bounded —
    * MBs vs the TB-scale feed). Unlike [[contaminationIndex]] the
    * benchmark identity survives: the scrub qualifies islands per
    * (doc, benchmark) — cross-bench pseudo-runs stitched from
    * unrelated single grams are noise and must not cut. */
  def decontaminationScrubIndex(benchDocs: DataFrame): DataFrame =
    graft.operators.Curation.posShingles(benchDocs)
      .select(col("doc_id").as("bench_id"), col("shingle")).distinct()
      .localCheckpoint()

  /** Streaming decontamination SCRUB (text_decontaminate_rewrite's
    * twin — the salvaging form of eval hygiene next to the
    * quarantining [[contaminationGateStream]]): where the gate drops a
    * whole doc over one leaked paragraph, the scrub excises the
    * qualifying contamination islands via the SAME batch core
    * ([[graft.operators.Curation.decontaminateRewriteOf]] — one
    * definition, so stream and batch can never drift) and admits the
    * remainder. Stream-static against the fixed per-benchmark shingle
    * index; stateless across batches — islands, interval merges and
    * the excision are all per-doc computations against the fixed eval
    * suite, so the union of per-batch outputs equals the batch op over
    * the whole feed (StreamingSpec pins cell equality). Every feed row
    * yields exactly one output row (the core LEFT-joins the span
    * frame): untouched docs pass with n_spans_cut=0 and a fully-leaked
    * doc survives as the n_tokens_kept=0 audit row — an admission
    * stage that silently drops feed rows is data loss. Same
    * at-least-once parquet-append caveat as every foreachBatch file
    * sink; content is deterministic, replay converges. */
  def decontaminateScrubStream(docs: DataFrame, benchIndex: DataFrame,
      cleanPath: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // persist, not localCheckpoint: nothing downstream reads a
          // path this batch writes, and the deterministic unpersist
          // keeps a long-lived stream from accumulating blocks
          val b = batch.persist()
          try {
            // the ledger key carries the scrub's checkpoint identity:
            // two scrubs with different eval suites in one application
            // must not share a memoized bench-index count
            graft.operators.Curation.decontaminateRewriteOf(
              s, b, benchIndex, s"$checkpointDir#decon_benchindex")
              .write.mode("append").parquet(cleanPath)
          } finally { b.unpersist(); () }
        }
      }
      .start()

  /** Streaming perplexity admission gate (text_perplexity's twin — the
    * FIFTH admission control next to the quality gate, redaction, the
    * near-dup gate and the decontamination gate): the bigram LM is
    * trained ONCE on the reference corpus
    * ([[graft.operators.Curation.pplModel]] — bounded model tables,
    * localCheckpointed; the same build/serve split the rarity table and
    * contamination index follow) and each micro-batch scores its docs
    * against the FIXED model (one bigram pass + two broadcast joins +
    * a map-side-combinable per-doc aggregate). Docs below the fluency
    * floor or above the OOV ceiling land in quarantine with their
    * scores; the rest append to the training lake. Stream-static and
    * stateless across batches — a doc's verdict depends only on the
    * fixed model, so the union of per-batch verdicts equals the batch
    * op over the whole feed (StreamingSpec pins cell equality). A doc
    * too short to form a bigram carries no fluency evidence and routes
    * clean (the decontamination gate's no-evidence convention). Same
    * at-least-once parquet-append caveat as every foreachBatch file
    * sink; content is deterministic, replay converges. */
  def perplexityGateStream(docs: DataFrame, refDocs: DataFrame,
      cleanPath: String, quarantinePath: String, checkpointDir: String,
      minFluency: Double = 1000.0, maxOov: Double = 0.5)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val (ctx, bi) = graft.operators.Curation.pplModel(refDocs)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val b = batch.persist()
          val verdict = graft.operators.Curation.pplScore(
            b.select("doc_id", "text"), ctx, bi)
          // n_bigrams = 0 ⇒ fluency is null ⇒ the AND below is false ⇒
          // clean: no evidence is not low quality
          val judged = b.join(verdict, Seq("doc_id"), "left")
            .withColumn("flag_lowquality",
              col("n_bigrams") > 0L &&
                (col("mean_fluency") < minFluency || col("oov_frac") > maxOov))
            .persist()
          try {
            judged.filter(!col("flag_lowquality"))
              .write.mode("append").parquet(cleanPath)
            judged.filter(col("flag_lowquality"))
              .write.mode("append").parquet(quarantinePath)
          } finally { judged.unpersist(); b.unpersist(); () }
        }
      }
      .start()
  }

  /** Windowed streaming distinct-count monitor (q23's twin): the KMV
    * `TypedImperativeAggregate` (graft.plans.KmvSketch) as a plain
    * aggregate inside a watermarked window groupBy — per-(window,
    * type) state is the k smallest distinct hashes (bounded, capacity
    * rows max), merged across micro-batches by the engine like any agg
    * buffer. Completes the sketch trio's streaming story next to
    * [[heavyHittersStream]] and [[quantileStream]]: every
    * bounded-memory aggregate in the engine runs unchanged under
    * Structured Streaming. Same portable estimator as q23: below
    * capacity the sketch IS the distinct hash set and the estimate is
    * exact; above it the (k−1)·2³²/h_k estimate kicks in. A KMV
    * sketch is a set of minima — union is commutative and idempotent —
    * so unlike the t-digest the streamed estimate is bit-identical to
    * the batch one in BOTH regimes, which is exactly what
    * StreamingSpec pins. */
  def distinctStream(events: DataFrame, capacity: Int = 256): DataFrame = {
    graft.plans.KmvSketch.register(events.sparkSession)
    events
      .withColumn("h", h32(col("user_id").cast(StringType)))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(graft.plans.KmvSketch.kmv_sketch(col("h"), capacity).as("sketch"))
      .select(col("window.start").as("window_start"), col("event_type"),
        size(col("sketch")).as("sketch_size"),
        when(size(col("sketch")) < capacity, size(col("sketch")).cast(DoubleType))
          .otherwise(round(lit((capacity - 1) * 4294967296.0)
            / element_at(col("sketch"), capacity), 6))
          .as("ndv_est"))
  }

  /** Streaming klines: the bar builder behind etl_normalize_klines as
    * a watermarked 1-minute streaming aggregation over a live trades
    * feed. open/close are min_by/max_by on the (trade_time, trade_id)
    * composite — the streamable equivalent of the batch row_number()
    * first/last rows (same ordering, same unique tiebreak), so a
    * closed streaming bar is cell-identical to the batch bar. Closed
    * bars then run the REAL klines ingestion tier
    * (MarketEtl.normalizeKlines + dqFilterKlines), exactly like a
    * downloaded bar file entering through readKlinesCsv.
    *
    * Scale: state is one in-flight bar per (symbol, minute) inside the
    * 10-minute lateness horizon — bounded by active symbols, not by
    * history. Append mode emits each bar exactly once when the
    * watermark closes its window, which is what lets the sink be an
    * append-only partitioned lake ([[klinesLakeSink]]). */
  def klinesStream(trades: DataFrame): DataFrame = {
    val arrival = struct(col("trade_time"), col("trade_id"))
    val bars = trades
      .withWatermark("trade_time", "10 minutes")
      .groupBy(col("symbol"), window(col("trade_time"), "1 minute"))
      .agg(
        min_by(col("price"), arrival).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), arrival).as("close"),
        dsum(col("quantity")).as("volume"),
        dsum(col("quote_qty")).as("quote_volume"),
        count(lit(1)).as("count"),
        dsum(when(!col("is_buyer_maker"), col("quantity")).otherwise(lit(0.0)))
          .as("taker_buy_volume"),
        dsum(when(!col("is_buyer_maker"), col("quote_qty")).otherwise(lit(0.0)))
          .as("taker_buy_quote_volume"))
      .withColumn("open_time", unix_millis(col("window.start")))
      .withColumn("close_time", col("open_time") + 59999L)
      .withColumn("year", year(col("window.start")))
      .withColumn("month", month(col("window.start")))
      .drop("window")
    graft.etl.MarketEtl.dqFilterKlines(graft.etl.MarketEtl.normalizeKlines(bars))
  }

  /** Streaming klines → the partitioned bar lake through the
    * exactly-once parquet file sink: the sink's _spark_metadata commit
    * log is the streaming analogue of the batch committer contract
    * (readers only trust files the log lists), so a crash-replayed
    * micro-batch can never double-land a bar. Each closed bar lands
    * once under year=/month=/day=/symbol= — the same layout
    * MarketEtl.writePartitioned gives the batch tier. */
  def klinesLakeSink(trades: DataFrame, lakePath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    klinesStream(trades).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .partitionBy("year", "month", "day", "symbol")
      .format("parquet").option("path", lakePath)
      .start()

  case class QuoteState(us: Long, event: Long, value: Double)

  case class AsofOut(trade_event: Long, user_id: Long,
      trade_ts: java.sql.Timestamp, trade_value: Double,
      quote_event: Option[Long], quote_value: Option[Double])

  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000

  /** Streaming as-of join: each trade ("purchase") enriched with the
    * latest quote ("view") of the same user at or before the trade —
    * live trade⋈quote enrichment, the streaming twin of r6_asof_join.
    *
    * State is ONE small record per user (the latest quote), not a
    * buffer of history — at any corpus size the state store holds
    * |active users| rows, the minimal state an as-of join can carry.
    * Within a batch events are sorted in event-time order (quotes
    * before trades at the same instant, r6's tie rule); across batches
    * the monotone-update guard keeps the newest quote under any
    * event-time-ordered feed. StreamingSpec pins equivalence with the
    * batch r6 semantics across a multi-batch feed. */
  def asofJoin(events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[QuoteState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(e =>
              (micros(e.ts), if (e.event_type == "view") 0 else 1, e.event_id))
            var cur = state.getOption
            val out = Seq.newBuilder[AsofOut]
            sorted.foreach { e =>
              e.event_type match {
                case "view" =>
                  if (cur.forall(q => q.us < micros(e.ts) ||
                      (q.us == micros(e.ts) && q.event < e.event_id)))
                    cur = Some(QuoteState(micros(e.ts), e.event_id, e.value))
                case "purchase" =>
                  out += AsofOut(e.event_id, userId, e.ts, e.value,
                    cur.map(_.event), cur.map(_.value))
                case _ => () // other event types are neither side of the join
              }
            }
            cur.foreach(state.update)
            out.result().iterator
          }
        })
  }

  /** Streaming CDC apply: a live change feed (rows tagged 'I'/'U'/'D'
    * with a monotone seq) merged into the partitioned lake once per
    * micro-batch through etl.CdcMerge. Each micro-batch is one
    * surgical merge — partition-pruned read of affected partitions,
    * anti-join + union, dynamic partition overwrite — and CdcMerge's
    * latest-wins idempotence makes a crash-replayed batch converge to
    * the same lake state, so the sink is effectively exactly-once at
    * the partition level. Snapshot housekeeping (expire + re-commit)
    * runs per merge exactly as in the batch path. */
  def cdcApply(changes: DataFrame, lakePath: String, keyCols: Seq[String],
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          // decouple the merge's lake rewrite from whatever source the
          // micro-batch derives from
          graft.etl.CdcMerge(batch.sparkSession, lakePath, batch.localCheckpoint(), keyCols)
          ()
        }
      }
      .start()

  /** Bootstrap the streaming near-dup gate's band index: 8 MinHash
    * band-hash rows per already-admitted document, landed as a parquet
    * table partitioned by `ingest_batch` (the bootstrap corpus is
    * partition -1; each micro-batch of the gate adds its own). The
    * index is a real maintained lake table, not a driver-held frame —
    * the gate reads it back per batch, so it survives restarts and is
    * shared by any number of gate instances. */
  def nearDupIndexInit(corpus: DataFrame, indexPath: String): Unit =
    writeIndexBootstrap(graft.operators.Dedup.bandRows(corpus), indexPath)

  /** Lake-corpus bootstrap through the MEMOIZED signature table
    * ([[graft.operators.Dedup.corpusSigs]]): when the gate's admitted
    * corpus is a doc-subset of the lake's documents table, the band
    * rows are a filter over the one shared signature build — the
    * batch dedup family and the streaming index bootstrap then charge
    * the corpus sign exactly once per application. */
  def nearDupIndexInit(spark: SparkSession, lakeDir: String,
      corpusPred: Column, indexPath: String): Unit =
    writeIndexBootstrap(
      graft.operators.Dedup.corpusBands(spark, lakeDir).filter(corpusPred),
      indexPath)

  private def writeIndexBootstrap(bands: DataFrame, indexPath: String): Unit =
    bands
      .withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch").mode("overwrite").parquet(indexPath)

  /** Streaming near-dup admission gate (dedup_gate's twin), SELF-
    * ADMITTING: every micro-batch of incoming documents is banded with
    * the SAME codegen'd machinery as batch MinHash (foreachBatch hands
    * a full batch DataFrame, so the window/groupBy signature path runs
    * unchanged — no per-row reimplementation to drift) and checked
    * against the maintained band index with a banded join; novel docs
    * append to the training lake AND their band rows land in the
    * index's own `ingest_batch=<N>` partition, so batch N+1's verdict
    * sees every doc batch N admitted — two near-identical docs
    * arriving in different micro-batches quarantine the second one.
    *
    * Replay semantics are exact, not best-effort: batch N judges
    * against `ingest_batch < N` only (its own partition from a crashed
    * earlier attempt is invisible, so a doc never collides with
    * itself), and the index write is a dynamic partition OVERWRITE of
    * partition N (a replayed batch rewrites, never duplicates). Within
    * one micro-batch admission is atomic — docs are judged against the
    * prior index, not each other — exactly the batch gate's semantics
    * applied per arrival slice; the sequential fold over batches is
    * what StreamingSpec pins. The novel/quarantine parquet appends
    * inherit the at-least-once-on-crash-retry caveat every
    * foreachBatch file sink has; their content is deterministic given
    * the (exactly-once) index, so replay converges. */
  def nearDupGateStream(docs: DataFrame, indexPath: String,
      novelPath: String, quarantinePath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val b = batch.localCheckpoint()
          val index = indexRead(s, indexPath)
            .filter(col("ingest_batch") < batchId)
          val verdict = graft.operators.Dedup.nearDupVerdict(b, index)
          val judged = b.join(verdict, Seq("doc_id")).localCheckpoint()
          val admitted = judged.filter(!col("is_near_dup"))
            .drop("is_near_dup", "n_hit_bands", "first_match")
          admitted.write.mode("append").parquet(novelPath)
          judged.filter(col("is_near_dup"))
            .write.mode("append").parquet(quarantinePath)
          // self-admission: the batch's accepted docs join the index,
          // partition-exact so a replayed batch rewrites its own rows
          graft.operators.Dedup.bandRows(admitted)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(indexPath)
          indexAppendCommit(s, indexPath, batchId)
          // b/judged are localCheckpoint'd because judged's lineage
          // must NOT reference the index parquet this batch overwrites
          // (Spark rejects overwrite-of-a-read-path at analysis);
          // their blocks are reclaimed by the ContextCleaner once the
          // closure's references die at batch end
          ()
        }
      }
      .start()

  /** Bootstrap the streaming paragraph gate's seen-hash lake: one
    * `ph` row per DISTINCT paragraph of the already-admitted corpus
    * (the bootstrap corpus owns its paragraphs — partition -1). The
    * lake carries only 8-byte hashes, never paragraph text. */
  def paragraphIndexInit(corpus: DataFrame, indexPath: String): Unit =
    writeIndexBootstrap(
      graft.operators.Dedup.paraRows(corpus).select("ph").distinct(), indexPath)

  /** Streaming paragraph-dedup admission gate
    * (dedup_paragraph_rewrite's twin — the SEVENTH admission control
    * next to the quality gate, redaction, the near-dup gate, the
    * decontamination gate, the perplexity gate and the learned
    * classifier gate), SELF-ADMITTING at paragraph granularity: each
    * micro-batch's documents split into paragraphs through the SAME
    * shared derivation as the batch ops
    * ([[graft.operators.Dedup.paraRows]] — boundary and hash cannot
    * drift); a paragraph is kept iff it is the first occurrence
    * WITHIN its batch (the batch ops' min-key window) AND its hash is
    * absent from the maintained seen-paragraph lake at
    * `ingest_batch < N` (left-anti — a crash-replayed batch's own
    * partition is invisible, so no paragraph collides with itself on
    * replay); cleaned docs (re-assembled from kept paragraphs, docs
    * reduced to nothing dropped — CCNet's empty-doc removal) append
    * to `cleanPath`, and the batch's kept hashes land in the lake's
    * own `ingest_batch=<N>` partition via dynamic overwrite + the
    * manifest commit. Cross-batch, a boilerplate paragraph arriving
    * again in batch N+1 is dropped there — the batch rewrite op's
    * first-occurrence semantics folded over arrival order
    * (StreamingSpec pins the stream output equal to the sequential
    * fold of the batch core). The cleaned-doc parquet append inherits
    * foreachBatch's at-least-once-on-crash-retry caveat; content is
    * deterministic given the exactly-once lake, so replay converges. */
  def paragraphGateStream(docs: DataFrame, indexPath: String,
      cleanPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val b = batch.localCheckpoint()
          val seen = indexRead(s, indexPath)
            .filter(col("ingest_batch") < batchId).select("ph")
          // kept is localCheckpoint'd: its lineage reads the lake this
          // batch overwrites (the near-dup gate's analysis-rejection
          // note), and it feeds two sinks (clean docs + lake append)
          val kept = graft.operators.Dedup
            .paraFirstOccurrence(graft.operators.Dedup.paraRows(b))
            .filter(col("kept"))
            .join(seen, Seq("ph"), "left_anti")
            .localCheckpoint()
          graft.operators.Dedup.paraRewrite(kept)
            .write.mode("append").parquet(cleanPath)
          kept.select("ph").distinct()
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(indexPath)
          indexAppendCommit(s, indexPath, batchId)
          ()
        }
      }
      .start()

  /** Bootstrap the streaming substring gate's seen-gram lake: one `gh`
    * row per DISTINCT 8-gram window of the already-admitted corpus
    * (partition -1). Like the paragraph lake it carries only 8-byte
    * h60 hashes — text never enters the admission state, so the lake
    * is O(distinct grams), not O(corpus bytes). */
  def substringIndexInit(corpus: DataFrame, indexPath: String): Unit =
    writeIndexBootstrap(
      graft.operators.Dedup.spanGramsOf(corpus.sparkSession, corpus)
        .select("gh").distinct(), indexPath)

  /** Streaming substring-dedup admission gate
    * (dedup_substring_rewrite's twin and dedup_gate_substring's
    * streaming form — the NINTH admission control), SELF-ADMITTING at
    * 8-gram granularity: each micro-batch's documents derive their
    * window stream through the SAME shared derivation as the batch ops
    * ([[graft.operators.Dedup.spanGramsOf]] — tokenization and hash
    * cannot drift), computed ONCE per batch (localCheckpoint) and fed
    * to both consumers; docs are rewritten by the SAME core as the
    * registry op ([[graft.operators.Dedup.substringRewriteWithSeen]])
    * with seen = the maintained gram lake at `ingest_batch < N`
    * (a crash-replayed batch's own partition is invisible, so no gram
    * collides with itself on replay) — a window is excised iff its
    * gram was admitted in an earlier ingest OR it repeats within the
    * batch (non-canonical occurrence), merged to maximal spans and
    * cut; cleaned rows (with the n_tokens_kept=0 audit rows the batch
    * rewrite keeps) append to `cleanPath`, and the batch's DISTINCT
    * grams land in the lake's own `ingest_batch=<N>` partition via
    * dynamic overwrite + manifest commit. ALL of the batch's grams
    * become seen — not just uncut ones — because every duplicated
    * gram's canonical occurrence was admitted at ingest ≤ N (the
    * family's boilerplate-forward rule; Lee et al.'s excision can
    * clip even the canonical copy when adjacent spans overlap it, in
    * the batch op and here identically). Cross-batch, a passage
    * admitted in batch N arriving again in batch N+1 is cut there —
    * the batch rewrite's first-occurrence semantics folded over
    * arrival order (StreamingSpec pins the stream output equal to the
    * sequential fold of the batch core). Cleaned-doc appends inherit
    * foreachBatch's at-least-once-on-crash-retry caveat; content is
    * deterministic given the exactly-once lake, so replay converges. */
  def substringGateStream(docs: DataFrame, indexPath: String,
      cleanPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val b = batch.localCheckpoint()
          // win is localCheckpoint'd: one gram derivation feeds the
          // rewrite AND the lake append, and the rewrite's lineage
          // reads the lake this batch then overwrites
          val win = graft.operators.Dedup.spanGramsOf(s, b).localCheckpoint()
          val seen = indexRead(s, indexPath)
            .filter(col("ingest_batch") < batchId).select("gh")
          graft.operators.Dedup
            .substringRewriteWithSeen(s, b, Some(seen), Some(win))
            .write.mode("append").parquet(cleanPath)
          win.select("gh").distinct()
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(indexPath)
          indexAppendCommit(s, indexPath, batchId)
          ()
        }
      }
      .start()

  /** Bootstrap the streaming ANN index lake: train the IVF coarse
    * quantizer on the base corpus (the one-time BUILD of the FAISS
    * build/serve split — retraining stays a maintenance job) and land
    * it as two parquet tables under `indexPath`: `centroids` (k rows,
    * the fixed quantizer) and `postings` (one row per indexed vector),
    * the latter partitioned by `ingest_batch` (bootstrap = -1) so the
    * append stream maintains it replay-exactly like the near-dup band
    * index. */
  def ivfIndexInit(spark: SparkSession, lakeDir: String,
      corpusPred: Column, indexPath: String): Unit = {
    graft.plans.VecDotProduct.register(spark)
    val v = graft.operators.Similarity
      .withNorm2(graft.Tables.embeddings(spark, lakeDir)).filter(corpusPred)
    val (cents, index) = graft.operators.Similarity.buildIvfIndexOver(spark, v)
    cents.write.mode("overwrite").parquet(s"$indexPath/centroids")
    index.select("vec_id", "embedding", "n2", "list_id")
      .withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch").mode("overwrite")
      .parquet(s"$indexPath/postings")
  }

  /** Streaming ANN index maintenance: per micro-batch of incoming
    * (vec_id, embedding) rows, assign each vector to the EXISTING
    * centroids (the same two-phase decimal argmax the batch build
    * uses — the quantizer is fixed, so assignment is per-vector and
    * order-free) and land the posting rows in the index's own
    * `ingest_batch=<N>` partition. Dynamic partition overwrite keyed
    * by batchId ⇒ a replayed batch rewrites its own rows, never
    * duplicates — the maintained lake table stays exactly-once.
    * Periodic re-train (centroid drift) remains a maintenance job on
    * the batch path, exactly the FAISS build/serve split. */
  def ivfAppendStream(vecs: DataFrame, indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // the micro-batch runs in a cloned session whose function
          // registry may predate any batch-side register call
          graft.plans.VecDotProduct.register(s)
          val cents = s.read.parquet(s"$indexPath/centroids").localCheckpoint()
          val v = graft.operators.Similarity
            .withNorm2(batch.select("vec_id", "embedding")).localCheckpoint()
          val assigned = v.join(
            graft.operators.Similarity.assignVectors(s, v, cents.drop("cn2")),
            "vec_id")
          assigned.select("vec_id", "embedding", "n2", "list_id")
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(s"$indexPath/postings")
          indexAppendCommit(s, s"$indexPath/postings", batchId)
          ()
        }
      }
      .start()

  /** Serve over the maintained streaming index: probe the fixed
    * centroids, rank over bootstrap + every appended batch's posting
    * rows — the same serve path as the batch op
    * ([[graft.operators.Similarity.ivfServe]]), so stream-appended
    * search is definitionally the batch search over the union corpus
    * (StreamingSpec pins it). */
  def ivfIndexSearch(spark: SparkSession, indexPath: String,
      queries: DataFrame, k: Int = 5): DataFrame = {
    graft.plans.VecDotProduct.register(spark)
    val cents = spark.read.parquet(s"$indexPath/centroids")
    val postings = indexRead(spark, s"$indexPath/postings").drop("ingest_batch")
    graft.operators.Similarity.ivfServe(spark, cents, postings, queries, k)
  }

  /** Metadata-filtered serve over the maintained streaming index — the
    * lake leg of `ann_filtered_search`: same predicate-during-
    * candidate-generation + selectivity-widened probing
    * ([[graft.operators.Similarity.filteredServe]] — one serve
    * definition, so the batch op and the lake can never disagree about
    * filtered semantics), reading bootstrap + every appended batch's
    * posting rows against the fixed quantizer. `meta` maps vec_id →
    * source (at scale: the posting table stores the filterable column,
    * so the predicate prunes at the scan); `queries` needs (query_id,
    * q_emb, qn2, q_source). Audited as the `ivf_lake_filtered` row of
    * [[annRecallReportLake]]; StreamingSpec pins lake-filtered ==
    * batch-filtered on an append-free full-corpus lake. */
  def ivfIndexFilteredSearch(spark: SparkSession, indexPath: String,
      meta: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    graft.plans.VecDotProduct.register(spark)
    val cents = spark.read.parquet(s"$indexPath/centroids")
    val idxMeta = indexRead(spark, s"$indexPath/postings").drop("ingest_batch")
      .join(meta, "vec_id").localCheckpoint()
    graft.operators.Similarity.filteredServe(spark, cents, idxMeta, queries, k)
  }

  /** IVF index-lake compaction — the maintenance leg of the FAISS
    * build/serve/maintain split. A long-running append stream leaves
    * one small `ingest_batch=N` partition per micro-batch; serve cost
    * and file counts grow with stream age, not corpus size. This job
    * folds every appended partition back into the bootstrap partition
    * (-1), clustering rows by `list_id` on the way so posting lists
    * land contiguously in files. Staged write + require-checked rename
    * swap (CdcMerge's loud-failure convention): the combined index is
    * fully written to a sibling dir before the two renames, so a crash
    * leaves either the old index intact, a loudly-missing dir (the
    * narrow window between renames — never silently halved), or the
    * new index; it never double-counts. Run it between stream
    * generations (stop stream → compact → restart with a fresh
    * checkpoint so batch ids restart cleanly above the folded state —
    * appended partitions are judged `< batchId` and -1 is below every
    * batch id, so search and replay semantics are unchanged either
    * way). Returns the number of appended partitions folded. */
  def ivfCompactPostings(spark: SparkSession, indexPath: String): Int =
    compactIngestPartitions(spark, s"$indexPath/postings", Seq("list_id"))

  /** Near-dup band-index compaction — the same maintenance leg for the
    * OTHER maintained index lake: the self-admitting gate leaves one
    * `ingest_batch=N` partition per micro-batch, so the banded
    * admission join's file count grows with stream age. Folds every
    * appended partition into the bootstrap partition (-1), clustering
    * rows by `(band_idx, band_hash)` — the gate's join key — so a
    * bucket's rows land contiguously. Same staged-rename swap and
    * stream-generation protocol as [[ivfCompactPostings]]; gate
    * verdicts are unchanged because the gate judges `ingest_batch <
    * batchId` and -1 is below every batch id. Returns the number of
    * appended partitions folded. */
  def nearDupIndexCompact(spark: SparkSession, indexPath: String): Int =
    compactIngestPartitions(spark, indexPath, Seq("band_idx", "band_hash"))

  /** Paragraph-lake compaction — the same maintenance leg for the
    * seen-paragraph lake: folds every appended `ingest_batch`
    * partition into bootstrap (-1), clustering by `ph` (the gate's
    * anti-join key). Verdicts unchanged (`ingest_batch < batchId`,
    * -1 below every batch id); same staged-rename swap and
    * stream-generation protocol. Returns partitions folded. */
  def paragraphIndexCompact(spark: SparkSession, indexPath: String): Int =
    compactIngestPartitions(spark, indexPath, Seq("ph"))

  /** Seen-gram-lake compaction — the same maintenance leg for the
    * substring gate's lake: folds every appended `ingest_batch`
    * partition into bootstrap (-1), clustering by `gh` (the gate's
    * semi-join key). Verdicts unchanged (`ingest_batch < batchId`,
    * -1 below every batch id); same staged-rename swap and
    * stream-generation protocol. Returns partitions folded. */
  def substringIndexCompact(spark: SparkSession, indexPath: String): Int =
    compactIngestPartitions(spark, indexPath, Seq("gh"))

  /** Manifest-aware index-table read. On a snapshot-enabled table (the
    * OBJECT-STORE model — enabled by committing a first snapshot after
    * the index bootstrap) this reads exactly the latest committed
    * manifest's files: no data-directory listing in the read path, so
    * staged-but-uncommitted compaction output and crashed-append
    * orphans are invisible by construction. On a table without
    * snapshot history (the HDFS/local model, where the directory IS
    * the committed state) it is the plain directory read. */
  private[graft] def indexRead(spark: SparkSession, tableDir: String): DataFrame = {
    val vs = graft.etl.Snapshots.versions(spark, tableDir)
    if (vs.nonEmpty) graft.etl.Snapshots.readVersion(spark, tableDir, vs.max)
    else spark.read.parquet(tableDir)
  }

  /** The object-store commit of one micro-batch's index append: the
    * next manifest = the previous one minus this batch's partition
    * prefix plus the partition's just-written files — dynamic
    * partition overwrite semantics lifted to the manifest, so a
    * crash-replayed batch REPLACES its own rows at the manifest layer
    * too. The enumeration lists only the partition this writer just
    * wrote (writer-side, bounded), never the table. No-op on the
    * HDFS/local model (no snapshot history). */
  private def indexAppendCommit(spark: SparkSession, tableDir: String,
      batchId: Long): Unit = {
    val vs = graft.etl.Snapshots.versions(spark, tableDir)
    if (vs.isEmpty) return
    val prefix = s"ingest_batch=$batchId/"
    val kept = graft.etl.Snapshots.manifest(spark, tableDir, vs.max)
      .filterNot(_._1.startsWith(prefix))
    val added = graft.etl.Snapshots.filesUnder(spark, tableDir,
      s"ingest_batch=$batchId")
    graft.etl.Snapshots.commitEntries(spark, tableDir, kept ++ added)
    ()
  }

  /** Fold every appended `ingest_batch=N` partition of a maintained
    * index table into the bootstrap partition (-1), clustering rows by
    * `clusterCols` so serve-side join keys land contiguously in files.
    *
    * Commit protocol follows the table's model:
    *  - Snapshot-enabled (OBJECT-STORE model): stage the folded table
    *    as new objects under `gen{v}/`, then commit by PUTting ONE
    *    manifest object naming exactly the staged files
    *    ([[graft.etl.Snapshots.commitEntries]]) — the committer
    *    contract (atomic single-object PUT, never a rename; see
    *    Snapshots). Crash before the PUT: every reader still resolves
    *    the old manifest, the staged files are invisible garbage the
    *    next attempt overwrites. Crash after: readers see the new
    *    index; the superseded files are unreferenced garbage the
    *    trailing vacuum (rollback-to-latest + expireInvalid) removes
    *    idempotently. At no point is the table missing or halved.
    *  - No snapshot history (HDFS/local model): staged write +
    *    require-checked rename swap (CdcMerge's loud-failure
    *    convention) — a crash leaves the old table intact, a
    *    loudly-missing dir (the narrow window between renames), or
    *    the new table; never a silent half. */
  private def compactIngestPartitions(spark: SparkSession,
      tableDir: String, clusterCols: Seq[String],
      merge: DataFrame => DataFrame = identity,
      subPartCols: Seq[String] = Nil): Int = {
    val partCols = "ingest_batch" +: subPartCols
    def fold(df: DataFrame): DataFrame = {
      val merged = merge(df.drop("ingest_batch"))
        .withColumn("ingest_batch", lit(-1L))
      // cluster so serve-side join keys land contiguously; a keyless
      // table (one-row stats partials) collapses to a single file
      if (clusterCols.nonEmpty) merged.repartition(clusterCols.map(col): _*)
      else merged.coalesce(1)
    }
    val table = new org.apache.hadoop.fs.Path(tableDir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = graft.etl.Snapshots.versions(spark, tableDir)
    if (vs.nonEmpty) {
      // object-store model: appended partitions are discovered from
      // the MANIFEST (the read path never lists data dirs)
      val entries = graft.etl.Snapshots.manifest(spark, tableDir, vs.max)
      val appended = entries.map(_._1)
        .flatMap("(?:^|/)ingest_batch=(-?\\d+)/".r.findFirstMatchIn(_))
        .map(_.group(1).toLong).distinct.filter(_ != -1L)
      if (appended.isEmpty) {
        // Nothing to fold — but a PRIOR rewrite may have crashed and
        // leaked storage (reads stay correct either way). Two
        // DETECTABLE crash states, each safe to clean here:
        //  - crashed AFTER its commitEntries PUT, before its vacuum:
        //    more than one live manifest (vs.size > 1);
        //  - crashed BEFORE the PUT: a staged gen{v} dir on disk that
        //    the live manifest doesn't reference — only exclusive
        //    rewrites (compaction/retrain) write gen dirs, so an
        //    orphan gen can never be an in-flight APPEND (appends
        //    write ingest_batch=N dirs and must not run during
        //    maintenance anyway).
        // Only then run the (idempotent) vacuum — the steady-state
        // idle call stays read-only, so a concurrent append's
        // just-landed but not-yet-committed files are never at risk.
        val liveGens = entries.map(_._1).filter(_.startsWith("gen"))
          .map(_.takeWhile(_ != '/')).toSet
        val orphanGens = fs.listStatus(table)
          .filter(d => d.isDirectory && d.getPath.getName.startsWith("gen"))
          .map(_.getPath.getName).toSet -- liveGens
        if (vs.size > 1 || orphanGens.nonEmpty) {
          graft.etl.Snapshots.rollback(spark, tableDir, vs.max)
          graft.etl.Snapshots.expireInvalid(spark, tableDir)
        }
        return 0
      }
      publishRewrite(spark, tableDir,
        fold(graft.etl.Snapshots.readVersion(spark, tableDir, vs.max)), partCols)
      return appended.length
    }
    val appended = fs.listStatus(table).filter { d =>
      val n = d.getPath.getName
      d.isDirectory && n.startsWith("ingest_batch=") && n != "ingest_batch=-1"
    }
    if (appended.isEmpty) return 0
    publishRewrite(spark, tableDir, fold(spark.read.parquet(table.toString)),
      partCols)
    appended.length
  }

  /** Publish `content` as a maintained table's NEW full content — the
    * rewrite-commit half of [[compactIngestPartitions]], shared with
    * the RE-TRAIN jobs ([[ivfRetrain]], [[graphIndexRebuild]]):
    * snapshot-enabled tables stage under `gen{v}` and commit with ONE
    * manifest PUT then vacuum idempotently (the committer contract);
    * otherwise staged write + require-checked rename swap. The
    * non-snapshot staged write EXECUTES `content` while the original
    * table is still in place, so a lazy read of the table itself is a
    * valid content lineage there; snapshot callers' staged files
    * coexist with the live version until the vacuum either way. */
  private def publishRewrite(spark: SparkSession, tableDir: String,
      content: DataFrame, partCols: Seq[String]): Unit = {
    val table = new org.apache.hadoop.fs.Path(tableDir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (graft.etl.Snapshots.enabled(spark, tableDir)) {
      val gen = s"gen${graft.etl.Snapshots.nextVersion(spark, tableDir)}"
      content.write.partitionBy(partCols: _*).mode("overwrite")
        .parquet(s"$tableDir/$gen")
      // THE commit: one manifest object naming exactly the staged files
      val v = graft.etl.Snapshots.commitEntries(spark, tableDir,
        graft.etl.Snapshots.filesUnder(spark, tableDir, gen))
      // vacuum (idempotent, safe to crash through): drop every file
      // the new manifest doesn't reference, expire dangling manifests
      graft.etl.Snapshots.rollback(spark, tableDir, v)
      graft.etl.Snapshots.expireInvalid(spark, tableDir)
    } else {
      val tmp = new org.apache.hadoop.fs.Path(s"$tableDir" + "_compacting")
      val old = new org.apache.hadoop.fs.Path(s"$tableDir" + "_old")
      fs.delete(tmp, true); fs.delete(old, true)
      content.write.partitionBy(partCols: _*).mode("overwrite")
        .parquet(tmp.toString)
      require(fs.rename(table, old),
        s"publishRewrite: rename $table -> $old failed; table unchanged")
      require(fs.rename(tmp, table),
        s"publishRewrite: rename $tmp -> $table failed; " +
        s"old table preserved at $old — restore it by renaming back")
      fs.delete(old, true)
    }
  }

  /** Quantization-drift report over the maintained IVF index — the
    * signal that schedules the periodic RE-TRAIN (the one maintenance
    * step the fixed-quantizer append path defers): per posting list,
    * member counts and mean member↔centroid cosine for the bootstrap
    * segment vs the stream-appended segments. A healthy list's
    * appended members fit the trained centroid about as well as the
    * bootstrap members did; a list whose appended mean falls well
    * below its bootstrap mean is quantizing new data badly —
    * `drifted` flags a 0.05 cosine gap. Means are DECIMAL(38,12)
    * sums over per-row cosines (partition-order independent, §4).
    * One narrow scan of the posting table joined to the k-row
    * centroid table — maintenance-priced at any scale. */
  def ivfDriftReport(spark: SparkSession, indexPath: String): DataFrame = {
    import graft.plans.VecDotProduct.vec_dot
    graft.plans.VecDotProduct.register(spark)
    val cents = spark.read.parquet(s"$indexPath/centroids")
      .select(col("cid").as("list_id"), col("cent"), col("cn2"))
    val cos = vec_dot(col("embedding"), col("cent")) /
      (sqrt(col("n2")) * sqrt(col("cn2")))
    val seg = indexRead(spark, s"$indexPath/postings")
      .join(broadcast(cents), "list_id")
      .withColumn("segment",
        when(col("ingest_batch") === -1L, "base").otherwise("appended"))
      .groupBy("list_id", "segment")
      .agg(count(lit(1)).as("n"),
        sum(cos.cast(DecimalType(38, 12))).as("cos_sum"))
      .withColumn("mean_cos",
        round6((col("cos_sum") / col("n")).cast(DoubleType)))
    val base = seg.filter(col("segment") === "base")
      .select(col("list_id"), col("n").as("n_base"),
        col("mean_cos").as("mean_cos_base"))
    val app = seg.filter(col("segment") === "appended")
      .select(col("list_id"), col("n").as("n_appended"),
        col("mean_cos").as("mean_cos_appended"))
    base.join(app, Seq("list_id"), "full")
      .select(col("list_id"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_appended"), lit(0L)).as("n_appended"),
        col("mean_cos_base"), col("mean_cos_appended"),
        (coalesce(col("mean_cos_appended"), lit(1.0))
          < coalesce(col("mean_cos_base"), lit(-1.0)) - 0.05).as("drifted"))
      .orderBy("list_id")
  }

  /** IVF RE-TRAIN — the maintenance step [[ivfDriftReport]] schedules
    * and the one the fixed-quantizer append path defers (the FAISS
    * build/serve/maintain split's last leg): re-run the deterministic
    * k-means build over the CURRENT indexed corpus (bootstrap + every
    * appended batch) and publish fresh centroids plus a single folded
    * posting partition. k re-derives from the lake's own count (the
    * derivedIvfK rule, k ∝ n), so a corpus that doubled since
    * bootstrap gets proportionally more lists — posting-list length,
    * and with it probe cost, stays constant. Same stop-the-stream
    * protocol as compaction, and STRICTER: retrain rewrites BOTH
    * tables of one index, and nothing orders the two publishes for a
    * concurrent reader — new-k centroids against old-list_id postings
    * (or vice versa) probe the wrong lists silently — so serving must
    * be paused for the retrain window too (exclusive maintenance, the
    * stop-the-world re-train every ANN deployment schedules; restart
    * appends with a fresh checkpoint after). A retrained lake over
    * corpus C serves bit-identically to the batch op's memoized build
    * over C — the quantizer derivation is deterministic end to end
    * (StreamingSpec pins it). Crash anywhere mid-retrain: RE-RUN it —
    * idempotent, because the columns it reads from the posting table
    * (vec_id, embedding, n2) are retrain-invariant, and the staged
    * centroid swap below never leaves a half-written centroid table.
    * Returns the re-derived k. */
  def ivfRetrain(spark: SparkSession, indexPath: String): Int = {
    graft.plans.VecDotProduct.register(spark)
    // localCheckpoint: the rebuild's lineage must not lazily reference
    // the posting files the publish replaces (the near-dup gate rule)
    val corpus = indexRead(spark, s"$indexPath/postings")
      .select("vec_id", "embedding", "n2").localCheckpoint()
    val (cents, index) =
      graft.operators.Similarity.buildIvfIndexOver(spark, corpus)
    // postings first, then the k-row centroid table via staged rename —
    // a crash between the two renames leaves a loudly-missing dir, not
    // a silently half-written quantizer (CdcMerge's convention)
    publishRewrite(spark, s"$indexPath/postings",
      index.select("vec_id", "embedding", "n2", "list_id")
        .withColumn("ingest_batch", lit(-1L))
        .repartition(col("list_id")),
      Seq("ingest_batch"))
    val cTable = new org.apache.hadoop.fs.Path(s"$indexPath/centroids")
    val fs = cTable.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cTmp = new org.apache.hadoop.fs.Path(s"$indexPath/centroids_staging")
    fs.delete(cTmp, true)
    cents.write.mode("overwrite").parquet(cTmp.toString)
    fs.delete(cTable, true)
    require(fs.rename(cTmp, cTable),
      s"ivfRetrain: rename $cTmp -> $cTable failed — re-run the retrain")
    // if this lake carries the outlier gate's frozen moments, they are
    // keyed by the OLD cluster ids and wrong for the new quantizer —
    // re-freeze them from the retrained index (inside the same
    // exclusive-maintenance window; idempotent like the rest)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/moments")))
      outlierMomentsInit(spark, indexPath)
    cents.count().toInt
  }

  // ---- maintained IVFPQ lake (compressed-posting serve tier) --------
  // The memory-honest member of the index-lake family: same
  // build/serve/maintain split as the IVF lake, but posting lists
  // carry PQ codes + one norm per vector instead of the embedding —
  // the compressed tier FAISS's IVFADC ships, and the shape a 100 TB
  // deployment actually serves from RAM/flash. Recall sits below the
  // full-precision IVF lake by construction (ADC approximation, no
  // rescore) and the annRecallReportLake `ivfpq_lake` row prices that
  // honestly. Every core is shared with the batch machinery
  // (Similarity.buildIvfPqIndexOver / ivfpqEncode / ivfpqAdcServe) so
  // the lake and the batch twins can never disagree.

  /** Bootstrap the compressed lake: train the coarse quantizer AND the
    * residual codebooks on the base corpus, land three tables under
    * `indexPath` — `centroids` (k rows), `rcodebooks` (M×K rows), and
    * `postings` (COMPRESSED: vec_id, list_id, codes, n2, qerr;
    * partitioned by ingest_batch, bootstrap = -1). qerr (squared
    * residual-after-code reconstruction error) is recorded at encode
    * time — the only moment the vector is in hand — and is what
    * [[ivfpqDriftReport]] reads. */
  def ivfpqIndexInit(spark: SparkSession, lakeDir: String,
      corpusPred: Column, indexPath: String): Unit = {
    graft.plans.VecDotProduct.register(spark)
    val v = graft.operators.Similarity
      .withNorm2(graft.Tables.embeddings(spark, lakeDir)).filter(corpusPred)
    val (cents, rcents, postings) =
      graft.operators.Similarity.buildIvfPqIndexOver(spark, v)
    cents.write.mode("overwrite").parquet(s"$indexPath/centroids")
    rcents.write.mode("overwrite").parquet(s"$indexPath/rcodebooks")
    postings.withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch").mode("overwrite")
      .parquet(s"$indexPath/postings")
  }

  /** Streaming append to the compressed lake: assign each incoming
    * vector to the FIXED coarse centroids and encode its residual with
    * the FIXED codebooks (exactly FAISS `add` — training stays a
    * maintenance job), landing the compressed rows in the batch's own
    * `ingest_batch` partition (dynamic overwrite ⇒ a replayed batch
    * replaces its own rows — exactly-once, like every index lake). The
    * incoming embedding is dropped after encoding; only codes reach
    * storage. */
  def ivfpqAppendStream(vecs: DataFrame, indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          graft.plans.VecDotProduct.register(s)
          val cents = s.read.parquet(s"$indexPath/centroids").localCheckpoint()
          val rcents = s.read.parquet(s"$indexPath/rcodebooks").localCheckpoint()
          val v = graft.operators.Similarity
            .withNorm2(batch.select("vec_id", "embedding")).localCheckpoint()
          val assigned = v
            .join(graft.operators.Similarity.assignVectors(s, v, cents.drop("cn2")),
              "vec_id")
            .join(broadcast(cents.select(col("cid").as("list_id"), col("cent"))),
              "list_id")
          graft.operators.Similarity.ivfpqEncode(assigned, rcents)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(s"$indexPath/postings")
          indexAppendCommit(s, s"$indexPath/postings", batchId)
          ()
        }
      }
      .start()

  /** Serve over the maintained compressed lake: ADC scan of the probed
    * posting lists' CODES against the per-query residual LUT — the
    * shared [[graft.operators.Similarity.ivfpqAdcServe]], so
    * stream-appended search is definitionally the batch encode+serve
    * over the union corpus (StreamingSpec pins it). */
  def ivfpqIndexSearch(spark: SparkSession, indexPath: String,
      queries: DataFrame, k: Int = 5): DataFrame = {
    graft.plans.VecDotProduct.register(spark)
    val cents = spark.read.parquet(s"$indexPath/centroids")
    val rcents = spark.read.parquet(s"$indexPath/rcodebooks")
    val postings = indexRead(spark, s"$indexPath/postings").drop("ingest_batch")
    graft.operators.Similarity.ivfpqAdcServe(spark, cents, rcents, postings,
      queries, k)
  }

  /** Compressed-lake compaction: fold every appended `ingest_batch`
    * partition into bootstrap (-1), clustering by `list_id` so each
    * posting list's codes land contiguously — same staged publish and
    * stream-generation protocol as [[ivfCompactPostings]]. */
  def ivfpqCompactPostings(spark: SparkSession, indexPath: String): Int =
    compactIngestPartitions(spark, s"$indexPath/postings", Seq("list_id"))

  /** Quantization-drift report for the compressed lake — the signal
    * that schedules [[ivfpqRetrain]]: per posting list, member counts
    * and mean squared reconstruction error (the encode-time `qerr` —
    * the lake cannot recompute it from codes) for the bootstrap vs
    * stream-appended segments. A list whose appended members
    * reconstruct ≥25% worse than its bootstrap members is quantizing
    * new data badly. Decimal mean sums (§4); one narrow scan of the
    * code table — maintenance-priced at any scale. */
  def ivfpqDriftReport(spark: SparkSession, indexPath: String): DataFrame = {
    val seg = indexRead(spark, s"$indexPath/postings")
      .withColumn("segment",
        when(col("ingest_batch") === -1L, "base").otherwise("appended"))
      .groupBy("list_id", "segment")
      .agg(count(lit(1)).as("n"),
        sum(col("qerr").cast(DecimalType(38, 12))).as("err_sum"))
      .withColumn("mean_qerr",
        round6((col("err_sum") / col("n")).cast(DoubleType)))
    val base = seg.filter(col("segment") === "base")
      .select(col("list_id"), col("n").as("n_base"),
        col("mean_qerr").as("mean_qerr_base"))
    val app = seg.filter(col("segment") === "appended")
      .select(col("list_id"), col("n").as("n_appended"),
        col("mean_qerr").as("mean_qerr_appended"))
    base.join(app, Seq("list_id"), "full")
      .select(col("list_id"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_appended"), lit(0L)).as("n_appended"),
        col("mean_qerr_base"), col("mean_qerr_appended"),
        (coalesce(col("mean_qerr_appended"), lit(0.0))
          > coalesce(col("mean_qerr_base"), lit(Double.MaxValue)) * 1.25)
          .as("drifted"))
      .orderBy("list_id")
  }

  /** IVFPQ RE-TRAIN + RE-ENCODE — the maintenance leg the drift report
    * schedules, and the one structural difference from the
    * full-precision lake: the compressed lake CANNOT retrain from
    * itself (codes are not training data), so the caller supplies the
    * current corpus `vectors` (vec_id, embedding) from the
    * source-of-truth vector lake — the production shape, where
    * embeddings live in the corpus lake and the index lake holds only
    * codes. Re-derives k ∝ n, re-trains quantizer + residual
    * codebooks, RE-ENCODES every vector, and publishes all three
    * tables (postings via the staged publish, the two small tables via
    * staged rename — a crash between swaps leaves a loudly-missing
    * dir, never a silently mixed quantizer). Same exclusive-
    * maintenance window as [[ivfRetrain]]: pause appends AND serving,
    * restart appends with a fresh checkpoint; crash anywhere ⇒ re-run
    * (idempotent — inputs come from the corpus lake, which retrain
    * never writes). A retrained lake over corpus C serves
    * bit-identically to a fresh build over C (StreamingSpec pins it).
    * Returns the re-derived k. */
  def ivfpqRetrain(spark: SparkSession, indexPath: String,
      vectors: DataFrame): Int = {
    graft.plans.VecDotProduct.register(spark)
    val v = graft.operators.Similarity
      .withNorm2(vectors.select("vec_id", "embedding")).localCheckpoint()
    val (cents, rcents, postings) =
      graft.operators.Similarity.buildIvfPqIndexOver(spark, v)
    publishRewrite(spark, s"$indexPath/postings",
      postings.withColumn("ingest_batch", lit(-1L))
        .repartition(col("list_id")),
      Seq("ingest_batch"))
    publishSmallTable(spark, s"$indexPath/centroids", cents)
    publishSmallTable(spark, s"$indexPath/rcodebooks", rcents)
    cents.count().toInt
  }

  /** Staged-rename swap of a small unpartitioned table (a quantizer, a
    * codebook) — CdcMerge's loud-failure convention: a crash leaves
    * the old table, a loudly-missing dir, or the new table, never a
    * half-written mix. */
  private def publishSmallTable(spark: SparkSession, tableDir: String,
      content: DataFrame): Unit = {
    val table = new org.apache.hadoop.fs.Path(tableDir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(tableDir + "_staging")
    fs.delete(tmp, true)
    content.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(table, true)
    require(fs.rename(tmp, table),
      s"publishSmallTable: rename $tmp -> $table failed — re-run the job")
  }

  // ---- maintained BINARY-SIGNATURE lake (third index family) --------
  // The build/serve/maintain/re-train split for ann_binary_topk's sign
  // quantizer: `means` (d rows — the frozen per-dim thresholds, the
  // quantizer) and `signatures` (one packed row per vector,
  // partitioned by ingest_batch, bootstrap -1). Packing against FIXED
  // means is per-vector and order-free, so the append stream is
  // exactly the batch assignment per micro-batch — the same
  // fixed-quantizer append contract as the IVF lake, with the same
  // replay-exactly dynamic-partition-overwrite commit.

  /** Bootstrap: train (per-dim fsum12 means) on the base corpus and
    * land quantizer + packed base as two parquet tables. */
  def bqIndexInit(spark: SparkSession, lakeDir: String,
      corpusPred: Column, indexPath: String): Unit = {
    graft.plans.VecDotProduct.register(spark)
    val v = graft.operators.Similarity
      .withNorm2(graft.Tables.embeddings(spark, lakeDir)).filter(corpusPred)
      .localCheckpoint()
    val means = graft.operators.Similarity.bqMeans(v).localCheckpoint()
    means.write.mode("overwrite").parquet(s"$indexPath/means")
    graft.operators.Similarity.bqPackWith(v, means)
      .select("vec_id", "embedding", "n2", "sig")
      .withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch").mode("overwrite")
      .parquet(s"$indexPath/signatures")
  }

  /** Per micro-batch of incoming (vec_id, embedding) rows: pack sign
    * bits against the FROZEN means and land the rows in the lake's own
    * `ingest_batch=<N>` partition (dynamic overwrite ⇒ a replayed
    * batch rewrites its own rows — exactly-once, like the IVF lake).
    * Re-deriving means stays a maintenance job ([[bqRepack]]). */
  def bqAppendStream(vecs: DataFrame, indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          graft.plans.VecDotProduct.register(s)
          val means = s.read.parquet(s"$indexPath/means").localCheckpoint()
          val v = graft.operators.Similarity
            .withNorm2(batch.select("vec_id", "embedding")).localCheckpoint()
          graft.operators.Similarity.bqPackWith(v, means)
            .select("vec_id", "embedding", "n2", "sig")
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(s"$indexPath/signatures")
          indexAppendCommit(s, s"$indexPath/signatures", batchId)
          ()
        }
      }
      .start()

  /** Serve over the maintained signature lake: pack the query vectors
    * with the SAME frozen means, hamming-rank over bootstrap + every
    * appended batch, exact-rerank — the batch op's serve path
    * ([[graft.operators.Similarity.bqServe]]) with the rerank budget
    * derived from the lake's own row count. `queries` carries
    * (query_id, q_emb, qn2). */
  def bqIndexSearch(spark: SparkSession, indexPath: String,
      queries: DataFrame, k: Int = 5): DataFrame = {
    graft.plans.VecDotProduct.register(spark)
    val means = spark.read.parquet(s"$indexPath/means")
    val sigs = indexRead(spark, s"$indexPath/signatures")
      .drop("ingest_batch").localCheckpoint()
    val qsig = graft.operators.Similarity.bqPackWith(
      queries.select(col("query_id").as("vec_id"), col("q_emb").as("embedding"),
        col("qn2").as("n2")), means)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("n2").as("qn2"), col("sig").as("qsig"))
    graft.operators.Similarity.bqServe(spark, sigs, qsig,
      graft.operators.Similarity.bqRerankForCount(sigs.count()), k)
  }

  /** Signature-lake compaction — folds every appended partition into
    * bootstrap (-1), clustering by vec_id so the popcount scan reads
    * dense files. Same commit protocol and stream-generation rules as
    * [[ivfCompactPostings]]. */
  def bqCompactSignatures(spark: SparkSession, indexPath: String): Int =
    compactIngestPartitions(spark, s"$indexPath/signatures", Seq("vec_id"))

  /** Drift clock for the frozen sign quantizer: per dimension, the
    * frozen mean vs the mean re-derived over the CURRENT indexed
    * corpus, and the share of vectors whose sign bit would FLIP under
    * the re-derived threshold (x between the two means) — the direct
    * measure of how stale the packed signatures are, in the same
    * report-then-schedule family as [[ivfDriftReport]]. One narrow
    * dims pass; flip counting is pure integer. */
  def bqDriftReport(spark: SparkSession, indexPath: String): DataFrame = {
    val frozen = spark.read.parquet(s"$indexPath/means")
      .select(col("i"), col("m").as("m_frozen"))
    val corpus = indexRead(spark, s"$indexPath/signatures")
      .select("vec_id", "embedding")
    val dims = corpus
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("vec_id"), col("i"), col("xf").cast(DoubleType).as("x"))
      .localCheckpoint()
    val now = dims.groupBy("i")
      .agg((graft.functions.fsum12(col("x")) / count(lit(1))).as("m_now"))
    dims.join(broadcast(frozen.join(now, "i")), "i")
      .groupBy(col("i"), col("m_frozen"), col("m_now"))
      .agg(count(lit(1)).as("n"),
        sum(when((col("x") > col("m_frozen")) =!= (col("x") > col("m_now")),
          1L).otherwise(0L)).as("n_flip"))
      .select(col("i"), round6(col("m_frozen")).as("m_frozen"),
        round6(col("m_now")).as("m_now"), col("n"), col("n_flip"),
        (col("n_flip") * lit(1000L) / col("n")).as("flip_permil"))
      .orderBy("i")
  }

  /** Signature RE-PACK — the maintenance step [[bqDriftReport]]
    * schedules: re-derive the per-dim means over the CURRENT indexed
    * corpus and re-pack every signature, publishing both tables
    * (signatures via staged manifest/rename publish, then the d-row
    * means table via staged rename — same exclusive-maintenance,
    * stop-the-stream protocol as [[ivfRetrain]], and idempotent to
    * crash-rerun for the same reason: the columns read are
    * repack-invariant). A repacked lake over corpus C packs
    * bit-identically to the batch build over C — the mean derivation
    * is deterministic end to end. Returns the corpus size. */
  def bqRepack(spark: SparkSession, indexPath: String): Long = {
    graft.plans.VecDotProduct.register(spark)
    val corpus = indexRead(spark, s"$indexPath/signatures")
      .select("vec_id", "embedding", "n2").localCheckpoint()
    val means = graft.operators.Similarity.bqMeans(corpus).localCheckpoint()
    publishRewrite(spark, s"$indexPath/signatures",
      graft.operators.Similarity.bqPackWith(corpus, means)
        .select("vec_id", "embedding", "n2", "sig")
        .withColumn("ingest_batch", lit(-1L))
        .repartition(col("vec_id")),
      Seq("ingest_batch"))
    val mTable = new org.apache.hadoop.fs.Path(s"$indexPath/means")
    val fs = mTable.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mTmp = new org.apache.hadoop.fs.Path(s"$indexPath/means_staging")
    fs.delete(mTmp, true)
    means.write.mode("overwrite").parquet(mTmp.toString)
    fs.delete(mTable, true)
    require(fs.rename(mTmp, mTable),
      s"bqRepack: rename $mTmp -> $mTable failed — re-run the repack")
    corpus.count()
  }

  // ---- embedding-outlier admission gate (eighth admission control) --
  // The first EMBEDDING-SPACE gate (the seven text gates screen
  // content; this screens geometry): incoming vectors whose distance
  // to their own cluster centroid exceeds the cluster's FROZEN
  // μ + 2σ threshold are rejected at ingest — corrupt/mislabeled/OOD
  // embeddings never reach the index or the training corpus, the
  // streaming twin of the `embedding_outliers` batch screen. Rides an
  // existing IVF index lake: thresholds freeze as a `moments` table
  // derived from the lake's own bootstrap distances, assignment uses
  // the lake's frozen centroids — re-deriving either stays a
  // maintenance job (ivfRetrain re-freezes the moments table itself:
  // retrained centroids re-key the cluster ids, so stale moments
  // would threshold against the wrong clusters).

  /** Freeze the per-cluster admission thresholds from the lake's
    * CURRENT posting distances (at bootstrap: the base corpus) as
    * `$indexPath/moments` — the gate's one-time BUILD. */
  def outlierMomentsInit(spark: SparkSession, indexPath: String): Unit = {
    import graft.operators.Similarity
    graft.plans.VecDotProduct.register(spark)
    val cents = spark.read.parquet(s"$indexPath/centroids")
      .select(col("cid").as("list_id"), col("cent"), col("cn2"))
    val idx = indexRead(spark, s"$indexPath/postings")
      .join(broadcast(cents), "list_id")
    Similarity.clusterMoments(
        Similarity.centroidDists(idx).localCheckpoint())
      .write.mode("overwrite").parquet(s"$indexPath/moments")
  }

  /** Per micro-batch of (vec_id, embedding) rows: assign to the frozen
    * centroids, reject ⇔ the cluster's σ > 0 AND dist > μ + 2σ (a
    * centroid whose bootstrap list was empty has no moments row —
    * admitted: no evidence to reject, recorded as `has_moments=false`
    * with a NULL threshold), land the full verdict table (vector
    * geometry + dist + the applied threshold + `has_moments` +
    * `admitted`) in
    * `verdictPath`'s own `ingest_batch=<N>` partition — replay-exact
    * like every gate; downstream feeds admitted rows onward (e.g. into
    * [[ivfAppendStream]]). */
  def outlierGateStream(vecs: DataFrame, indexPath: String,
      verdictPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          import graft.operators.Similarity
          graft.plans.VecDotProduct.register(s)
          val cents = s.read.parquet(s"$indexPath/centroids").localCheckpoint()
          val moments = s.read.parquet(s"$indexPath/moments").localCheckpoint()
          val v = Similarity.withNorm2(batch.select("vec_id", "embedding"))
            .localCheckpoint()
          val idx = v
            .join(Similarity.assignVectors(s, v, cents.drop("cn2")), "vec_id")
            .join(broadcast(cents
              .select(col("cid").as("list_id"), col("cent"), col("cn2"))), "list_id")
          Similarity.centroidDists(idx)
            .join(v, "vec_id")
            .join(broadcast(moments), Seq("list_id"), "left")
            .select(col("vec_id"), col("embedding"), col("n2"), col("list_id"),
              col("dist"),
              (col("mu") + lit(2.0) * col("sigma")).as("threshold"),
              // the verdict must be REPLAYABLE from the row alone: a
              // moments-less cluster admits with threshold NULL, and
              // has_moments records that the admission was "no evidence
              // to reject", not "passed a threshold" — without it the
              // two cases are indistinguishable in the landed table
              // (three-valued logic folds NULL comparisons into the
              // same admitted=true)
              col("mu").isNotNull.as("has_moments"),
              (!(coalesce(col("sigma"), lit(0.0)) > 0 &&
                col("dist") > col("mu") + lit(2.0) * col("sigma"))).as("admitted"))
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(verdictPath)
          indexAppendCommit(s, verdictPath, batchId)
          ()
        }
      }
      .start()

  /** Bootstrap the streaming GRAPH index lake — the second maintained
    * index family next to IVF (the HNSW/NSG build/serve/maintain
    * split): `nodes` = (vec_id, embedding, n2, bucket) over the base
    * corpus, `edges` = a symmetrized kNN graph over it, both parquet
    * tables partitioned by `ingest_batch` (bootstrap -1) so the append
    * stream maintains them replay-exactly like the IVF posting lake.
    *
    * The DEFAULT edge build is the CAPPED (hotprobe) one
    * ([[graft.operators.Similarity.knnEdgesCappedOver]]): pair volume
    * bounded to ≤ 2·(d+1)·cap·n by hot-bucket splitting, planes
    * derived from the TableStats ledger and the cap from the graph
    * degree ([[graft.operators.Similarity.bootstrapCapFor]]) — the
    * 100 TB posture, where the unbounded build's Σ|bucket|² pair skew
    * makes the one-time bootstrap unschedulable (PROBE_r11 measures
    * 91.9× vs 8.2× at ×16). `capped = false` keeps the plain
    * multiprobe edge set ([[graft.operators.Similarity.knnEdgesOver]]
    * — the batch op's oracle-exact build core) as a spec-scale
    * reference fixture; the walk, append and compaction legs are
    * edge-set-agnostic either way. */
  def graphIndexInit(spark: SparkSession, lakeDir: String,
      corpusPred: Column, indexPath: String,
      capped: Boolean = true): Unit = {
    graft.plans.VecDotProduct.register(spark)
    val vn = graft.operators.Similarity
      .withNorm2(graft.Tables.embeddings(spark, lakeDir)).filter(corpusPred)
      .select("vec_id", "embedding", "n2").localCheckpoint()
    graft.operators.Similarity.withBucket(vn)
      .withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch").mode("overwrite")
      .parquet(s"$indexPath/nodes")
    val edges =
      if (capped) graft.operators.Similarity.knnEdgesCappedOver(spark, vn,
        graft.operators.Similarity.derivedPlanes(spark, lakeDir))
      else graft.operators.Similarity.knnEdgesOver(spark, vn)
    edges
      .withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch").mode("overwrite")
      .parquet(s"$indexPath/edges")
  }

  /** Entry-point + walk over the maintained graph tables: entry = the
    * query's home-bucket's lowest node id, falling back to the GLOBAL
    * lowest node id when the home bucket holds no indexed member — an
    * external query (or an insert landing in an empty bucket) must
    * never be left without a walk start. The registry op keeps its
    * no-fallback entry: its queries are corpus members, whose home
    * bucket is never empty. */
  private def graphSearchNodes(s: SparkSession, nodes: DataFrame,
      edges: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val bucketEntry = nodes
      .join(broadcast(q.select("query_id", "q_bucket")),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .groupBy("query_id").agg(min("vec_id").as("bnode"))
    val globalMin = nodes.agg(min("vec_id").as("gnode"))
    val entry = q.select("query_id")
      .join(bucketEntry, Seq("query_id"), "left")
      .crossJoin(broadcast(globalMin))
      .select(col("query_id"), coalesce(col("bnode"), col("gnode")).as("node"))
    graft.operators.Similarity.graphWalk(s,
      nodes.select("vec_id", "embedding", "n2"), edges, entry,
      q.select("query_id", "q_emb", "qn2"), k)
  }

  /** Streaming graph-index maintenance — HNSW's insert-by-search as a
    * micro-batch job: each incoming vector SEARCHES the current graph
    * (the same beam walk serving runs — the insert path and the serve
    * path are one algorithm) for its `degree` nearest indexed
    * neighbors and links to them SYMMETRICALLY, so new vectors are
    * immediately reachable from the old graph and vice versa. Within
    * one micro-batch, inserts are judged against the PRIOR graph (the
    * near-dup gate's atomic-arrival-slice convention); node and edge
    * rows land in the tables' own `ingest_batch=<N>` partitions via
    * dynamic partition overwrite ⇒ a replayed batch rewrites its own
    * rows, never duplicates. Periodic full re-build (graph quality
    * drift as the corpus doubles) stays a maintenance job on the batch
    * path — the same split as IVF re-training; both tables compact
    * with [[compactIngestPartitions]] semantics via
    * [[graphIndexCompact]]. */
  def graphAppendStream(vecs: DataFrame, indexPath: String,
      checkpointDir: String, degree: Int = 3)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          graft.plans.VecDotProduct.register(s)
          // localCheckpoint: the lineage must not reference the parquet
          // dirs this batch overwrites (the near-dup gate's rule)
          val nodes = indexRead(s, s"$indexPath/nodes")
            .drop("ingest_batch").localCheckpoint()
          val edges = indexRead(s, s"$indexPath/edges")
            .drop("ingest_batch").localCheckpoint()
          val vn = graft.operators.Similarity.withBucket(
            graft.operators.Similarity.withNorm2(
              batch.select("vec_id", "embedding"))).localCheckpoint()
          val nn = graphSearchNodes(s, nodes, edges,
            vn.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
              col("n2").as("qn2"), col("bucket").as("q_bucket")), degree)
          val e = nn.select(col("query_id").as("src"), col("neighbor_id").as("dst"))
          e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
            .distinct()
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(s"$indexPath/edges")
          vn.withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(s"$indexPath/nodes")
          indexAppendCommit(s, s"$indexPath/edges", batchId)
          indexAppendCommit(s, s"$indexPath/nodes", batchId)
          ()
        }
      }
      .start()

  /** Serve over the maintained graph index: the same beam walk as the
    * batch op, over bootstrap + every appended batch's nodes and
    * edges. `queries` carries (query_id, embedding). */
  def graphIndexSearch(spark: SparkSession, indexPath: String,
      queries: DataFrame, k: Int = 3): DataFrame = {
    graft.plans.VecDotProduct.register(spark)
    val nodes = indexRead(spark, s"$indexPath/nodes").drop("ingest_batch")
    val edges = indexRead(spark, s"$indexPath/edges").drop("ingest_batch")
    val qn = graft.operators.Similarity.withBucket(
      graft.operators.Similarity.withNorm2(
        queries.select(col("query_id"), col("embedding"))))
      .select(col("query_id"), col("embedding").as("q_emb"),
        col("n2").as("qn2"), col("bucket").as("q_bucket"))
    graphSearchNodes(spark, nodes, edges, qn, k)
  }

  /** Fold both maintained graph tables' appended partitions into their
    * bootstrap partitions — nodes clustered by `bucket` (the entry
    * lookup key), edges by `src` (the walk's expansion key). Returns
    * the number of appended partitions folded across both tables. */
  def graphIndexCompact(spark: SparkSession, indexPath: String): Int =
    compactIngestPartitions(spark, s"$indexPath/nodes", Seq("bucket")) +
      compactIngestPartitions(spark, s"$indexPath/edges", Seq("src"))

  /** Graph-index RE-BUILD — the maintenance step [[graphDriftReport]]
    * schedules (insert-by-search keeps appends reachable but never
    * revisits old links, so graph quality drifts as the corpus
    * doubles): re-run the DEFAULT capped edge bootstrap over the
    * CURRENT node set (bootstrap + every appended batch) and publish
    * both tables folded to the bootstrap partition. This is exactly
    * where the capped build being schedulable matters — a rebuild
    * touches the whole corpus by construction, and the uncapped
    * Σ|bucket|² build would make the maintenance job the bottleneck
    * (PROBE_r12: 7.2× vs 141.6× at ×16). Planes re-derive from the
    * node count (the planesFor rule), so bucket occupancy — and edge
    * build pair volume per vector — stays constant as the lake grows.
    * Same stop-the-stream, [[publishRewrite]] protocol as compaction;
    * StreamingSpec pins post-rebuild reachability of every vector
    * (appended ones included) and the drift report's reset. */
  def graphIndexRebuild(spark: SparkSession, indexPath: String): Unit = {
    graft.plans.VecDotProduct.register(spark)
    // localCheckpoint: the rebuild's lineage must not lazily reference
    // the node/edge files the publish replaces
    val nodes = indexRead(spark, s"$indexPath/nodes")
      .select("vec_id", "embedding", "n2", "bucket").localCheckpoint()
    val edges = graft.operators.Similarity.knnEdgesCappedOver(spark,
      nodes.select("vec_id", "embedding", "n2"),
      graft.operators.Similarity.planesForCount(nodes.count()))
      .localCheckpoint()
    publishRewrite(spark, s"$indexPath/nodes",
      nodes.withColumn("ingest_batch", lit(-1L)).repartition(col("bucket")),
      Seq("ingest_batch"))
    publishRewrite(spark, s"$indexPath/edges",
      edges.withColumn("ingest_batch", lit(-1L)).repartition(col("src")),
      Seq("ingest_batch"))
  }

  /** Edge-quality drift report over the maintained graph index —
    * [[ivfDriftReport]]'s twin, the signal that schedules the periodic
    * full RE-BUILD the insert-by-search append path defers: per ingest
    * segment (bootstrap vs stream-appended), edge counts and the mean
    * src↔dst cosine. Insert-by-search links each new vector to its
    * walk-found nearest neighbors, so a healthy appended segment's
    * links are about as strong as the bootstrap kNN edges; a segment
    * whose mean falls well below bootstrap is inserting into a graph
    * that no longer routes well — `drifted` flags a 0.05 cosine gap.
    * Means are DECIMAL(38,12) sums over per-edge cosines
    * (partition-order independent, §4); one scan of the edge table
    * with two id-equijoins into the node table. */
  def graphDriftReport(spark: SparkSession, indexPath: String): DataFrame = {
    import graft.plans.VecDotProduct.vec_dot
    graft.plans.VecDotProduct.register(spark)
    val nodes = indexRead(spark, s"$indexPath/nodes")
      .select("vec_id", "embedding", "n2")
    val edges = indexRead(spark, s"$indexPath/edges")
    val cos = vec_dot(col("s_emb"), col("d_emb")) /
      (sqrt(col("s_n2")) * sqrt(col("d_n2")))
    // single-row conditional aggregates (the corpusIndexDriftReport
    // pattern): an absent segment — fresh bootstrap, fully compacted,
    // or just re-built — yields 0 edges / null mean instead of
    // dropping the report row entirely (the old per-segment crossJoin
    // produced ZERO rows the moment one side was empty)
    val isBase = col("ingest_batch") === -1L
    edges
      .join(nodes.select(col("vec_id").as("src"), col("embedding").as("s_emb"),
        col("n2").as("s_n2")), "src")
      .join(nodes.select(col("vec_id").as("dst"), col("embedding").as("d_emb"),
        col("n2").as("d_n2")), "dst")
      .agg(
        coalesce(sum(when(isBase, 1L)), lit(0L)).as("n_base"),
        sum(when(isBase, cos.cast(DecimalType(38, 12)))).as("cos_base"),
        coalesce(sum(when(!isBase, 1L)), lit(0L)).as("n_appended"),
        sum(when(!isBase, cos.cast(DecimalType(38, 12)))).as("cos_appended"))
      .select(col("n_base"), col("n_appended"),
        round6((col("cos_base") / col("n_base")).cast(DoubleType))
          .as("mean_cos_base"),
        round6((col("cos_appended") / col("n_appended")).cast(DoubleType))
          .as("mean_cos_appended"))
      .withColumn("drifted",
        coalesce(col("mean_cos_appended"), lit(1.0)) <
          coalesce(col("mean_cos_base"), lit(-1.0)) - 0.05)
  }

  /** LAKE-MODE recall report — the registry `ann_recall_report` audits
    * the MEMOIZED batch builds; after an append+compact cycle what
    * production serves is the maintained lakes, so the QA loop must
    * audit those. Same exact brute-force baseline, same row shape
    * (method, k, query_id, hits, recall_permil) via
    * [[graft.operators.Similarity.recallReportOver]], with methods
    * `graph_lake` (the maintained beam walk over nodes/edges) and
    * `ivf_lake` (the maintained posting search) — the two reports
    * union into one QA board. StreamingSpec pins lake rows == batch
    * rows on an append-free lake bootstrapped from the batch ops' own
    * builds (fixture edges for the graph), which proves the audit
    * measures the serve path and not a re-derivation; on a capped or
    * appended lake the rows show the REAL served recall, which is the
    * point. */
  def annRecallReportLake(spark: SparkSession, lakeDir: String,
      graphPath: String, ivfPath: String, bqPath: String = null,
      ivfpqPath: String = null): DataFrame = {
    import graft.operators.Similarity
    graft.plans.VecDotProduct.register(spark)
    val panel = Similarity.annPanelQueries(spark, lakeDir)
    val qn = Similarity.withNorm2(panel)
      .select(col("query_id"), col("embedding").as("q_emb"), col("n2").as("qn2"))
    val meta = graft.Tables.documents(spark, lakeDir)
      .select(col("doc_id").as("vec_id"), col("source"))
    // the filtered row measures what the PREDICATE costs against the
    // unfiltered exact top-k: hits are capped by how many true
    // neighbors share the query's source — low numbers here are the
    // filter speaking, not the index (the same-population comparison
    // is DedupSpec's filtered-exact recall pin)
    val qf = qn.join(
      meta.select(col("vec_id").as("query_id"), col("source").as("q_source")),
      "query_id")
    Similarity.recallReportOver(spark, lakeDir, Seq(
      ("graph_lake",
        graphIndexSearch(spark, graphPath, panel, Similarity.KnnK),
        Similarity.KnnK),
      ("ivf_lake",
        ivfIndexSearch(spark, ivfPath, qn, Similarity.RecallK),
        Similarity.RecallK),
      ("ivf_lake_filtered",
        ivfIndexFilteredSearch(spark, ivfPath, meta, qf, Similarity.RecallK),
        Similarity.RecallK)) ++
      // the signature lake joined the audit in round 13; older QA
      // boards (and the append-free bootstrap pin) run without it
      Option(bqPath).map(p => ("bq_lake",
        bqIndexSearch(spark, p, qn, Similarity.RecallK),
        Similarity.RecallK)).toSeq ++
      // the compressed lake joined in round 15 — its row prices the
      // ADC-only (no-rescore) serve tier against the same exact
      // baseline, the number a capacity-planning decision reads before
      // swapping full-precision postings for codes
      Option(ivfpqPath).map(p => ("ivfpq_lake",
        ivfpqIndexSearch(spark, p, qn, Similarity.RecallK),
        Similarity.RecallK)).toSeq)
  }

  // --- the INVERTED-INDEX lake: CorpusIndex's maintain leg --------------
  // The third maintained index family (after the IVF posting lake and
  // the kNN graph lake): the sparse-retrieval index that
  // [[graft.operators.CorpusIndex]] memoizes locally becomes four
  // ingest_batch-partitioned parquet tables with a streaming append
  // twin and manifest-committed compaction. `postings` (doc_id, word,
  // tf) and `doclens` (doc_id, dl) are per-document rows — disjoint
  // across batches, so appends are plain new partitions. `docfreq`
  // (word, df) and `stats` (n_docs, sum_dl) are ADDITIVE over disjoint
  // doc sets, so each partition carries that batch's PARTIAL and the
  // serve path sums partials — the mergeable-ledger pattern the
  // streaming datacard uses. A batch's increment is bounded by the
  // batch's vocabulary, never the corpus's, and serve-side merging is
  // a vocabulary-scale aggregate, not a corpus re-tokenize.

  private val CorpusIndexTables = Seq("postings", "doclens", "docfreq", "stats")

  /** Derive one doc slice's four index tables and land them in
    * `ingest_batch=batchId` partitions. Derivations are IDENTICAL to
    * [[graft.operators.CorpusIndex]]'s memoized build (same integer
    * tf/df/dl/n_docs; sum_dl stays a LONG partial so the serve-side
    * avgdl double reproduces the batch build's bit-for-bit). postings
    * and doclens are localCheckpoint'd: each feeds two consumers
    * (its own write + the derived partial) and AQE does not collapse
    * identical derivation branches (SURVEY §5). */
  private def landCorpusIndexSlice(docs: DataFrame, indexPath: String,
      batchId: Long, dynamic: Boolean): Unit = {
    val postings = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dl = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("dl"))
      .localCheckpoint()
    val dfreq = postings.groupBy("word").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    def land(df: DataFrame, table: String, subParts: Seq[String] = Nil): Unit = {
      val w = df.withColumn("ingest_batch", lit(batchId))
        .write.mode("overwrite")
      (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
        .partitionBy("ingest_batch" +: subParts: _*).parquet(s"$indexPath/$table")
    }
    // postings carry the word-bucket sub-partition (SURVEY §5): a term
    // read prunes to 1/B of the files in appended partitions too, not
    // just post-compaction row groups
    land(postings.withColumn("word_bucket",
        graft.operators.CorpusIndex.wordBucket(col("word"))),
      "postings", Seq("word_bucket"))
    land(dl, "doclens")
    land(dfreq, "docfreq"); land(stats, "stats")
  }

  /** Bootstrap the inverted-index lake from the base corpus (the BUILD
    * of the build/serve/maintain split): tokenize once, land all four
    * tables under `indexPath` in their `ingest_batch=-1` partitions. */
  def corpusIndexInit(spark: SparkSession, lakeDir: String,
      corpusPred: Column, indexPath: String): Unit =
    landCorpusIndexSlice(
      graft.Tables.documents(spark, lakeDir).filter(corpusPred),
      indexPath, -1L, dynamic = false)

  /** Streaming inverted-index maintenance: per micro-batch of incoming
    * (doc_id, text) rows, derive the batch's posting/length rows and
    * its df/stats PARTIALS and land each in the table's own
    * `ingest_batch=N` partition. Dynamic partition overwrite keyed by
    * batchId ⇒ a replayed batch rewrites its own rows (exactly-once);
    * on a snapshot-enabled table each land is committed as one
    * manifest PUT ([[indexAppendCommit]]). */
  def corpusIndexAppendStream(docs: DataFrame, indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val b = batch.select("doc_id", "text").localCheckpoint()
          landCorpusIndexSlice(b, indexPath, batchId, dynamic = true)
          CorpusIndexTables.foreach(t =>
            indexAppendCommit(s, s"$indexPath/$t", batchId))
          ()
        }
      }
      .start()

  /** The four index frames served from the maintained lake, in
    * [[graft.operators.CorpusIndex]]'s shapes: postings/doclens as the
    * union of bootstrap + appended partitions; docfreq and stats
    * MERGED from their per-partition partials (sum over disjoint doc
    * sets; avgdl = exact long total cast to double, the batch build's
    * own derivation). */
  def corpusIndexFrames(spark: SparkSession, indexPath: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // postings KEEP the word_bucket partition column: the serve paths
    // turn query terms into bucket filters (literal isin for bm25's
    // fixed terms, a broadcast semi-join on the partition column for
    // rrf's derived terms) so the scan prunes files before reading
    val postings = indexRead(spark, s"$indexPath/postings").drop("ingest_batch")
    val dl = indexRead(spark, s"$indexPath/doclens").drop("ingest_batch")
    val dfreq = indexRead(spark, s"$indexPath/docfreq")
      .groupBy("word").agg(sum("df").as("df"))
    val stats = indexRead(spark, s"$indexPath/stats")
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast(DoubleType) / col("n_docs"))
      .select("n_docs", "avgdl")
    (postings, dl, dfreq, stats)
  }

  /** BM25 top-50 served from the maintained lake — the same scoring
    * definition as the registry op ([[graft.operators.TextAnalysis
    * .bm25Over]]), so stream-appended search is definitionally the
    * batch search over the union corpus (StreamingSpec pins it). */
  def bm25IndexSearch(spark: SparkSession, indexPath: String): DataFrame = {
    val (p, dl, df, st) = corpusIndexFrames(spark, indexPath)
    // literal query terms ⇒ literal bucket set ⇒ STATIC partition
    // pruning on the lake scan (PlanSpec pins the pruned file count);
    // bm25Over's own word filter still decides exactly. Guarded on the
    // column so a lake written before the bucketed layout still serves
    // (unpruned) — same tolerance as rrf's prefilter.
    val pruned =
      if (p.columns.contains("word_bucket")) {
        val buckets = graft.operators.TextAnalysis.Bm25Terms
          .map(graft.operators.CorpusIndex.wordBucketOf).distinct
        p.filter(col("word_bucket").isin(buckets: _*)).drop("word_bucket")
      } else p
    graft.operators.TextAnalysis.bm25Over(pruned, dl, df, st)
  }

  /** Hybrid RRF retrieval served from the maintained lake — the dense
    * side reads the embeddings lake as usual; the sparse side reads
    * the four lake frames through the registry op's own definition
    * ([[graft.operators.Similarity.retrievalRrfOver]]). */
  def rrfIndexSearch(spark: SparkSession, lakeDir: String,
      indexPath: String): DataFrame = {
    val (p, dl, df, st) = corpusIndexFrames(spark, indexPath)
    graft.operators.Similarity.retrievalRrfOver(spark, lakeDir, p, dl, df, st)
  }

  /** Inverted-index lake compaction: fold every appended partition of
    * all four tables into the bootstrap partition (-1) — postings
    * clustered by `word` so each term's posting list lands contiguous
    * (the serve-side join key), doclens by `doc_id` — and MERGE the
    * df/stats partials down to one row per word / one row total, so
    * partial counts stop accumulating one row per stream batch. Same
    * commit protocol as [[ivfCompactPostings]] (manifest PUT on the
    * object-store model, staged rename swap otherwise). Returns the
    * max partitions folded across the four tables. */
  def corpusIndexCompact(spark: SparkSession, indexPath: String): Int = {
    // pre-bucketed-layout lakes (no word_bucket column) still compact —
    // flat, like before the layout change
    val postingSubParts =
      if (indexRead(spark, s"$indexPath/postings").columns
        .contains("word_bucket")) Seq("word_bucket")
      else Nil
    val p = compactIngestPartitions(spark, s"$indexPath/postings", Seq("word"),
      subPartCols = postingSubParts)
    val d = compactIngestPartitions(spark, s"$indexPath/doclens", Seq("doc_id"))
    val f = compactIngestPartitions(spark, s"$indexPath/docfreq", Seq("word"),
      _.groupBy("word").agg(sum("df").as("df")))
    val st = compactIngestPartitions(spark, s"$indexPath/stats", Nil,
      _.agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl")))
    Seq(p, d, f, st).max
  }

  /** Staleness report over the maintained inverted-index lake —
    * [[ivfDriftReport]]/[[graphDriftReport]]'s sparse-retrieval twin,
    * completing the drift story for all three index families. BM25
    * scores stay EXACT under appends (the serve path merges the
    * df/stats partials), so the honest staleness signals here are
    * physical and distributional, not score error:
    *  - `frag_partitions` — max live `ingest_batch` partitions across
    *    the four tables: every appended batch scatters each term's
    *    posting list over one more file and adds one more df partial
    *    per word, so this is the per-term serve fan-in and the
    *    compaction trigger (`compact_due` flags > 8).
    *  - `oov_share` — fraction of the appended vocabulary unseen in
    *    the bootstrap (from the df partials: vocabulary-scale, never
    *    a corpus re-tokenize). A high share means the appended corpus
    *    is lexically unlike the one any base-tuned relevance knobs
    *    (stopword lists, k1/b) were calibrated on — `drifted` flags
    *    > 0.25, the retrieval-relevant signal that schedules a
    *    re-calibration the way IVF's cosine gap schedules a re-train.
    *  - `avgdl_base` / `avgdl_appended` — document-length drift from
    *    the stats partials (BM25's length normalization pivots on
    *    avgdl, so a large shift changes how appended docs score).
    * One row; reads only partials + partition metadata —
    * maintenance-priced at any scale. Compaction folds everything
    * into the bootstrap partition, so a freshly compacted lake
    * reports frag 1 / appended 0 / not drifted: compaction resets
    * the staleness clock. */
  def corpusIndexDriftReport(spark: SparkSession, indexPath: String): DataFrame = {
    val frag = CorpusIndexTables.map { t =>
      indexRead(spark, s"$indexPath/$t")
        .select(col("ingest_batch").cast(LongType)).distinct().count()
    }.max
    val isBase = col("ingest_batch").cast(LongType) < 0L
    // single-row conditional aggregates: an absent segment (fresh
    // bootstrap, or everything folded by compaction) yields 0 docs /
    // null avgdl instead of dropping the report row
    val st = indexRead(spark, s"$indexPath/stats")
      .agg(
        coalesce(sum(when(isBase, col("n_docs"))), lit(0L)).as("n_docs_base"),
        sum(when(isBase, col("sum_dl"))).as("sum_dl_base"),
        coalesce(sum(when(!isBase, col("n_docs"))), lit(0L)).as("n_docs_appended"),
        sum(when(!isBase, col("sum_dl"))).as("sum_dl_appended"))
      .withColumn("avgdl_base", round6(
        col("sum_dl_base").cast(DoubleType) / col("n_docs_base")))
      .withColumn("avgdl_appended", round6(
        col("sum_dl_appended").cast(DoubleType) / col("n_docs_appended")))
    val oov = indexRead(spark, s"$indexPath/docfreq")
      .groupBy("word").agg(max(isBase).as("in_base"),
        max(!isBase).as("in_appended"))
      .filter(col("in_appended"))
      .agg(count(lit(1)).as("vocab_appended"),
        sum(when(!col("in_base"), 1L).otherwise(0L)).as("oov"))
      .select(col("vocab_appended"),
        round6(col("oov").cast(DoubleType) / col("vocab_appended")).as("oov_share"))
    st.crossJoin(oov)
      .select(
        lit(frag).as("frag_partitions"),
        col("n_docs_base"), col("n_docs_appended"),
        col("avgdl_base"), col("avgdl_appended"),
        col("vocab_appended"), col("oov_share"),
        (coalesce(col("oov_share"), lit(0.0)) > 0.25).as("drifted"),
        lit(frag > 8).as("compact_due"))
  }

  /** Streaming incremental view maintenance: each micro-batch is
    * appended to the snapshot-enabled lake (one new partition-dir
    * write + snapshot commit) and the materialized rollup is folded
    * forward through etl.IncrementalAgg — the delta aggregate reads
    * ONLY the files this batch added (a manifest diff), never the
    * lake's history. The full lakehouse loop — ingest → snapshot →
    * incremental rollup — kept live with per-batch cost proportional
    * to the batch, which is the property that makes a continuously
    * maintained 100 TB summary table affordable. Append-only contract
    * inherited from Snapshots/IncrementalAgg. */
  def incrementalAggStream(rows: DataFrame, lakePath: String, aggPath: String,
      spec: graft.etl.IncrementalAgg.AggSpec,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) landBatch(batch, lakePath, aggPath, spec, batchId)
      }
      .start()

  /** One micro-batch of the incremental-rollup loop, each step
    * idempotent so a crash-replayed batchId converges instead of
    * double-counting (foreachBatch replays the last uncommitted batch
    * after restart):
    *  - the batch lands in its own `batch=N` subdir ONLY if that dir's
    *    _SUCCESS marker is absent (a partial attempt is wiped and
    *    rewritten; a complete one is left byte-identical, preserving
    *    the append-only contract the snapshot diffs rely on),
    *  - Snapshots.commit of an unchanged lake produces an
    *    identical-content manifest, so the replayed refresh sees an
    *    EMPTY manifest diff and only advances its sync marker. */
  def landBatch(batch: Dataset[org.apache.spark.sql.Row], lakePath: String,
      aggPath: String, spec: graft.etl.IncrementalAgg.AggSpec, batchId: Long): Unit = {
    val s = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(s"$lakePath/batch=$batchId")
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
      if (fs.exists(dir)) fs.delete(dir, true) // partial previous attempt
      batch.localCheckpoint().write.mode("overwrite").parquet(dir.toString)
    }
    graft.etl.Snapshots.commit(s, lakePath)
    if (graft.etl.IncrementalAgg.syncedVersion(s, aggPath).isEmpty)
      graft.etl.IncrementalAgg.fullBuild(s, lakePath, aggPath, spec)
    else
      graft.etl.IncrementalAgg.refresh(s, lakePath, aggPath, spec)
    ()
  }

  /** Streaming sequence packing (token_pack's twin): keeps the
    * GPT-style concat-and-chunk mapping live as the corpus grows. Each
    * micro-batch runs the SAME distributed prefix sum as the batch op
    * ([[graft.operators.Curation.packedDocsOf]] — per-shard local
    * windows, shard totals broadcast back) for its WITHIN-batch
    * offsets, then adds the carried cross-batch base: the summed token
    * totals of every batch that ran before this one, read from a tiny
    * per-batch totals ledger (one row per batch — metadata-scale, like
    * the snapshot manifests). The base is DERIVED state judged at
    * `ingest_batch < N` (the near-dup gate's replay convention): a
    * crash-replayed batch N re-reads the same earlier ledger rows —
    * its own partial attempt is invisible — and both its writes are
    * dynamic partition overwrites of partition N, so replay rewrites
    * instead of duplicating and global offsets stay exactly-once.
    * Contract: the feed delivers corpus slices in corpus (doc_id)
    * order — the ingestion convention that makes "concatenated corpus"
    * well-defined — under which the unioned stream output is
    * cell-identical to batch token_pack over the whole corpus
    * (StreamingSpec pins it). */
  def packStream(docs: DataFrame, packPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val b = batch.localCheckpoint()
          val totalsPath = s"$packPath/totals"
          val fs = new org.apache.hadoop.fs.Path(totalsPath)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          // one-row driver read of the bounded ledger (CdcMerge's
          // metadata-collect footprint), absent before the first batch
          val base =
            if (!fs.exists(new org.apache.hadoop.fs.Path(totalsPath))) 0L
            else s.read.parquet(totalsPath)
              .filter(col("ingest_batch") < batchId)
              .agg(coalesce(sum("total_tokens"), lit(0L))).head().getLong(0)
          val local = graft.operators.Curation.packedDocsOf(b).localCheckpoint()
          val blk = graft.operators.Curation.PackBlock
          local
            .withColumn("token_offset", col("token_offset") + lit(base))
            .withColumn("start_block", expr(s"token_offset div $blk"))
            .withColumn("end_block", expr(s"(token_offset + n_tokens - 1) div $blk"))
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(s"$packPath/packed")
          local
            .agg(coalesce(sum(col("n_tokens").cast("long")), lit(0L)).as("total_tokens"))
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(totalsPath)
          ()
        }
      }
      .start()

  /** Streaming corpus datacard maintenance (corpus_datacard's twin —
    * the live corpus-health monitor): each micro-batch appends
    * per-(source, batch) MERGEABLE partials to a bounded ledger lake —
    * doc/token/language/short-doc counts and the token-length envelope
    * fold trivially; the one non-mergeable exact statistic, the
    * content-hash NDV behind the dup rate, is carried as its mergeable
    * KMV sketch state instead (the q17/q23 exact-below-capacity /
    * estimate-above contract). Replay-exact under the near-dup gate's
    * convention: per-batch dynamic partition overwrite keyed by
    * ingest_batch, so a crash-replayed micro-batch lands identically.
    * Ledger bounded at #sources × #batches rows × (capacity+7) longs.
    */
  def datacardLedgerStream(docs: DataFrame, ledgerDir: String,
      checkpointDir: String, capacity: Int = 256)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          graft.plans.KmvSketch.register(s)
          batch
            .select(col("source"), col("lang"),
              size(split(col("text"), " ")).as("n_toks"),
              h60(md5(lower(trim(col("text"))))).as("h"))
            .groupBy("source")
            .agg(count(lit(1)).as("n_docs"),
              sum("n_toks").as("n_tokens"),
              graft.plans.KmvSketch.kmv_sketch(col("h"), capacity).as("sketch"),
              sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
              sum(when(col("n_toks") < 50, 1L).otherwise(0L)).as("n_short"),
              min("n_toks").as("min_tokens"),
              max("n_toks").as("max_tokens"))
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(ledgerDir)
          ()
        }
      }
      .start()

  /** Folds the datacard ledger into the released card — the same
    * column set as batch corpus_datacard. Counts/sums/min/max merge
    * exactly; the KMV sketches merge by re-aggregating their union
    * (KMV merge ≡ k smallest of the union), so below capacity the
    * served dup_permil equals the batch op's EXACT rate — batch and
    * ledger count distincts over the SAME h60(md5(text)) domain, one
    * contract — and above capacity it degrades to the estimator. */
  def datacardServe(s: SparkSession, ledgerDir: String,
      capacity: Int = 256): DataFrame = {
    graft.plans.KmvSketch.register(s)
    val led = s.read.parquet(ledgerDir)
    val sums = led.groupBy("source").agg(
      sum("n_docs").as("n_docs"),
      sum("n_tokens").as("n_tokens"),
      sum("n_en").as("n_en"),
      sum("n_short").as("n_short"),
      min("min_tokens").as("min_tokens"),
      max("max_tokens").as("max_tokens"))
    val nd = led.select(col("source"), explode(col("sketch")).as("h"))
      .groupBy("source")
      .agg(graft.plans.KmvSketch.kmv_sketch(col("h"), capacity).as("sk"))
      .select(col("source"),
        when(size(col("sk")) < capacity, size(col("sk")).cast(LongType))
          // kth-smallest estimator over the h60 domain (2^60)
          .otherwise(round(lit((capacity - 1).toDouble * (1L << 60).toDouble)
            / element_at(col("sk"), capacity)).cast(LongType))
          .as("ndv_h"))
    sums.join(nd, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        ratio(col("n_tokens").cast(DoubleType), col("n_docs").cast(DoubleType))
          .as("mean_tokens"),
        col("min_tokens"), col("max_tokens"),
        expr("1000L * n_en div n_docs").as("en_permil"),
        expr("1000L * n_short div n_docs").as("short_permil"),
        expr("1000L * (n_docs - least(ndv_h, n_docs)) div n_docs").as("dup_permil"))
      .orderBy("source")
  }

  /** Bootstrap the maintained MIXTURE-STATS lake (corpus_doremi_mix's
    * streaming twin): `stats` = the (source, bucket, count)
    * hashed-unigram sufficient statistics of the base corpus —
    * [[graft.operators.Curation.doremiCountsOf]], the ONE definition
    * the batch op also derives from — landed at ingest_batch=-1.
    * Counts are ADDITIVE, so the lake is a pure count journal: append
    * lands each micro-batch's own counts in its own partition
    * (replay-exact dynamic overwrite like every lake), the serve sums
    * the journal and runs the UNCHANGED EG arithmetic
    * ([[graft.operators.Curation.doremiFromCounts]]) — the mixture
    * decision a 100 TB ingest reads stays current without ever
    * re-scanning the corpus, and retrain/rebuild legs don't exist
    * because there is no trained artifact to drift: the statistics
    * ARE the model. */
  def mixStatsInit(spark: SparkSession, lakeDir: String,
      indexPath: String): Unit =
    graft.operators.Curation.doremiCountsOf(
        graft.Tables.documents(spark, lakeDir))
      .withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .parquet(s"$indexPath/stats")

  /** Per micro-batch of (source, text) docs: land the batch's OWN
    * (source, bucket) counts in its ingest_batch partition. */
  def mixStatsAppendStream(docs: DataFrame, indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          graft.operators.Curation.doremiCountsOf(
              batch.select(col("source"), col("text")))
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(s"$indexPath/stats")
          indexAppendCommit(s, s"$indexPath/stats", batchId)
          ()
        }
      }
      .start()

  /** Serve the EG mixture trajectory from the maintained stats — sums
    * the count journal, then the batch op's own arithmetic
    * (StreamingSpec pins bit-equality with corpus_doremi_mix over the
    * union corpus). */
  def mixWeightsServe(spark: SparkSession, indexPath: String): DataFrame =
    graft.operators.Curation.doremiFromCounts(
      indexRead(spark, s"$indexPath/stats")
        .groupBy("source", "b").agg(sum("c").as("c")))

  /** Fold appended count partitions into the bootstrap — the merge is
    * a groupBy-SUM (additivity again), so the compacted lake is
    * row-minimal, not just file-minimal. */
  def mixStatsCompact(spark: SparkSession, indexPath: String): Int =
    compactIngestPartitions(spark, s"$indexPath/stats", Seq("source"),
      merge = df => df.groupBy("source", "b").agg(sum("c").as("c")))

  /** Bootstrap the maintained TOKENIZER-STATS lake — the SEVENTH
    * maintained artifact, giving the tokenizer family the same
    * lake treatment as the five index families and the mixture-stats
    * journal: the (w, wf) word-frequency table is the ADDITIVE
    * sufficient statistic every tokenizer trainer consumes
    * ([[graft.operators.TextAnalysis.wordCountsOf]] — the ONE
    * definition the batch trainers also derive from), so the lake is a
    * pure count journal. Append lands each micro-batch's own counts in
    * its own partition (replay-exact dynamic overwrite), serve sums
    * the journal, compaction is a row-minimal groupBy-SUM, and all
    * THREE retrain legs (BPE / unigram / WordPiece) train from the
    * summed journal without ever re-scanning the corpus — the
    * trainers' only corpus-touching pass IS the journaled statistic.
    * The drift leg prices the appended ingest's fertility under the
    * FROZEN unigram piece table against the bootstrap corpus's, again
    * from the journal alone — the retrain-cadence signal a production
    * tokenizer pipeline watches. */
  def vocabStatsInit(spark: SparkSession, lakeDir: String,
      indexPath: String,
      base: Column = lit(true)): Unit =
    graft.operators.TextAnalysis.wordCountsOf(
        graft.Tables.documents(spark, lakeDir).filter(base))
      .withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .parquet(s"$indexPath/wordcounts")

  /** Per micro-batch of (text) docs: land the batch's OWN word counts
    * in its ingest_batch partition. */
  def vocabStatsAppendStream(docs: DataFrame, indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          graft.operators.TextAnalysis.wordCountsOf(batch)
            .withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(s"$indexPath/wordcounts")
          indexAppendCommit(s, s"$indexPath/wordcounts", batchId)
          ()
        }
      }
      .start()

  /** The summed journal — the (w, wf) table of the corpus-so-far. */
  def vocabStatsServe(spark: SparkSession, indexPath: String): DataFrame =
    indexRead(spark, s"$indexPath/wordcounts")
      .groupBy("w").agg(sum("wf").as("wf"))

  /** Fold appended count partitions into the bootstrap — groupBy-SUM
    * (additivity), so the compacted lake is row-minimal. */
  def vocabStatsCompact(spark: SparkSession, indexPath: String): Int =
    compactIngestPartitions(spark, s"$indexPath/wordcounts", Seq("w"),
      merge = df => df.groupBy("w").agg(sum("wf").as("wf")))

  /** The three retrain legs: train each family from the summed
    * journal. Bit-identical to training over the union corpus
    * (StreamingSpec pins all three) because the trainers' docs paths
    * route through the same count-frame builds. */
  def unigramRetrainFromLake(spark: SparkSession, indexPath: String): DataFrame =
    graft.operators.TextAnalysis.unigramTrainOfWords(
      vocabStatsServe(spark, indexPath))

  def bpeRetrainFromLake(spark: SparkSession, indexPath: String): DataFrame =
    graft.operators.TextAnalysis.bpeTrainOfWords(
      vocabStatsServe(spark, indexPath))

  def wordpieceRetrainFromLake(spark: SparkSession, indexPath: String)
      : (Seq[(Int, String, String, Long, Long, Long, Long)], Seq[String], Seq[String]) =
    graft.operators.TextAnalysis.wpTrainOfWords(
      vocabStatsServe(spark, indexPath))

  /** Drift verdict from the journal alone: fertility (unigram pieces
    * per word, ppm) of the APPENDED ingest under the frozen `pieces`
    * table vs the BOOTSTRAP corpus's, PLUS WordPiece's UNK-word rate
    * under the frozen `ivoc`/`cvoc` tables — one row with the retrain
    * flag. Fertility trips at `tauPpm` RELATIVE drift;
    * out-of-vocabulary ingest prices as character segmentation (the
    * rollup's fallback), which is exactly the fertility blow-up that
    * trigger exists to catch. The UNK leg trips at `tauUnkPpm`
    * ABSOLUTE INCREASE in whole-word rejections (one-sided: UNK rate
    * falling means the vocab covers more, not a retrain need; and the
    * base rate can be 0, so a relative form would divide by zero) —
    * the r16 verdict's blind spot: a script shift that WordPiece
    * rejects outright while unigram fertility stays flat (short
    * unseen-charset words price near the corpus mean) must still
    * retrain. No corpus re-scan at any point: both statistics are
    * rollups over ONE chase each on the journal's distinct-word
    * union (segmentation is a function of the word, not its count). */
  def vocabDriftServe(spark: SparkSession, indexPath: String,
      pieces: Seq[(String, Double)],
      ivoc: Seq[String], cvoc: Seq[String],
      tauPpm: Long = 100000L,
      tauUnkPpm: Long = 10000L): DataFrame = {
    // one pass over the distinct-word UNION prices both sides
    val sides = indexRead(spark, s"$indexPath/wordcounts")
      .withColumn("side",
        when(col("ingest_batch") === -1L, "base").otherwise("new"))
      .groupBy("side", "w").agg(sum("wf").as("wf"))
      .transform(graft.functions.memoize) // two leg consumers
    // single-row conditional aggregate (the corpusIndexDriftReport
    // convention): an absent side - fresh bootstrap with no appends,
    // or everything folded to -1 by compaction - yields a null
    // fertility and retrain=false instead of dropping the report row
    val fert = graft.operators.TextAnalysis
      .unigramFertilityPpmByGroup(sides, "side", pieces)
      .agg(
        max(when(col("side") === "base", col("fertility_ppm")))
          .as("base_fertility_ppm"),
        max(when(col("side") === "new", col("fertility_ppm")))
          .as("new_fertility_ppm"))
    val unk = graft.operators.TextAnalysis
      .wpUnkPpmByGroup(sides, "side", ivoc, cvoc)
      .agg(
        max(when(col("side") === "base", col("wp_unk_ppm")))
          .as("base_wp_unk_ppm"),
        max(when(col("side") === "new", col("wp_unk_ppm")))
          .as("new_wp_unk_ppm"))
    fert.crossJoin(unk) // both single-row by construction
      .select(col("base_fertility_ppm"), col("new_fertility_ppm"),
        (col("new_fertility_ppm") - col("base_fertility_ppm")).as("drift_ppm"),
        col("base_wp_unk_ppm"), col("new_wp_unk_ppm"),
        (col("new_wp_unk_ppm") - col("base_wp_unk_ppm")).as("unk_drift_ppm"),
        (coalesce(
          abs(col("new_fertility_ppm") - col("base_fertility_ppm")) * 1000000L >
            lit(tauPpm) * col("base_fertility_ppm"),
          lit(false)) ||
        coalesce(
          col("new_wp_unk_ppm") - col("base_wp_unk_ppm") > lit(tauUnkPpm),
          lit(false))).as("retrain"))
  }

  /** Streaming BPE segmentation (tokenizer_bpe_apply's twin): the
    * tokenizer's serve path over a live ingest. The merge-rule table
    * is BUILD state — trained once on the reference corpus
    * (TextAnalysis.bpeRules, the memoized artifact the batch ops also
    * serve from) and passed in as plain driver values (K ≤ 6 rules);
    * each micro-batch then segments via the SAME fuse rounds as the
    * batch op, over the batch's own distinct-word table (vocab-scale
    * per batch). Stream-static, stateless across batches; per-batch
    * dynamic partition overwrite keeps replays exact. This is how a
    * training pipeline keeps token budgets live while docs stream in:
    * rules stay frozen between tokenizer retrains (a maintenance
    * job), segmentation rides the ingest. */
  def bpeSegmentStream(docs: DataFrame,
      rules: Seq[(Int, String, String, Long)], outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          // per-round persist + deterministic unpersist at batch end
          // (the contaminationGateStream convention): a long-lived
          // stream must not accumulate per-batch blocks, and
          // localCheckpoint blocks are reclaimed only when the driver
          // GCs the RDD references (ContextCleaner) — persist blocks
          // free the moment the batch's write has completed
          val persisted =
            scala.collection.mutable.ListBuffer[DataFrame]()
          try {
            graft.operators.TextAnalysis.bpeApplyWith(batch, rules,
                df => { val p = df.persist(); persisted += p
                        graft.functions.reroot(p) })
              .withColumn("ingest_batch", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("ingest_batch").parquet(outDir)
          } finally persisted.foreach(_.unpersist(false))
          ()
        }
      }
      .start()

  /** Streaming unigram segmentation (tokenizer_unigram_apply's twin,
    * the bpeSegmentStream convention for the OTHER tokenizer family):
    * the trained piece table is BUILD state — chars + 48 scored pieces
    * as plain driver values, frozen between tokenizer retrains — and
    * each micro-batch runs the SAME Viterbi rounds + per-doc rollup as
    * the batch op over the batch's own distinct-word table, with
    * persist-based memoization so a long-lived stream doesn't
    * accumulate checkpoint blocks. Per-batch dynamic partition
    * overwrite keeps replays exact. */
  def unigramSegmentStream(docs: DataFrame,
      pieces: Seq[(String, Double)], outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val persisted =
            scala.collection.mutable.ListBuffer[DataFrame]()
          try {
            // persist caches BLOCKS but never truncates the LOGICAL
            // plan; uniViterbi's round j joins rounds j-1..j-4, so an
            // un-cut plan tree grows tetranacci(20) — reroot() wraps
            // each memoized frame in a LogicalRDD leaf (served from
            // the cache) while the persisted original stays on the
            // unpersist ledger
            graft.operators.TextAnalysis.unigramApplyWith(batch, pieces,
                df => { val p = df.persist(); persisted += p
                        graft.functions.reroot(p) })
              .withColumn("ingest_batch", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("ingest_batch").parquet(outDir)
          } finally persisted.foreach(_.unpersist(false))
          ()
        }
      }
      .start()

  /** Streaming WordPiece segmentation (tokenizer_wordpiece_apply's
    * twin — the third tokenizer family's serve over a live ingest):
    * the two vocab tables (word-initial + continuation pieces) are
    * BUILD state carried as frozen driver values between retrains;
    * each micro-batch builds its own vocab-scale jump table and runs
    * the SAME greedy longest-match chase as the batch op, with
    * persist+reroot memoization (the unigram lesson: the chase rounds
    * chain 20 deep, so each memo must CUT the logical plan, not just
    * cache blocks). Per-batch dynamic partition overwrite keeps
    * replays exact. Unlike the batch run, a streamed document may
    * carry characters the frozen vocab never saw — those words map to
    * [UNK] exactly like production WordPiece, and n_unk_words reports
    * them per doc. */
  def wordpieceSegmentStream(docs: DataFrame,
      ivoc: Seq[String], cvoc: Seq[String], outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val persisted =
            scala.collection.mutable.ListBuffer[DataFrame]()
          try {
            graft.operators.TextAnalysis.wpApplyWith(batch, ivoc, cvoc,
                df => { val p = df.persist(); persisted += p
                        graft.functions.reroot(p) })
              .withColumn("ingest_batch", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("ingest_batch").parquet(outDir)
          } finally persisted.foreach(_.unpersist(false))
          ()
        }
      }
      .start()

  /** Streaming corpus curation: the Gopher-style quality gate applied
    * to a live document feed. The gate is stateless and narrow
    * (identical expressions to the batch text_quality_gopher), so it
    * needs no watermark or state store — each micro-batch is scored at
    * scan speed, which is how quality filtering runs inline with a
    * streaming ingest at any corpus size. */
  def qualityGateStream(docs: DataFrame): DataFrame =
    graft.operators.Curation.qualityMetrics(docs)

  /** Learned-quality admission gate: each micro-batch of the document
    * feed is scored by the TRAINED linear classifier — the broadcast
    * (bucket, w) weight table plus the one-row decision threshold,
    * build state trained batch-side by
    * [[graft.operators.Curation.qualityClassifierModelOf]] — and the
    * sink receives per-doc (q_score, q_pass) verdicts. The SIXTH
    * admission gate: the learned complement of the rule (gopher),
    * distributional (rarity), LM (perplexity), contamination and
    * near-dup gates. Stateless per row, exact per batch; the weight
    * table is bounded at QcBuckets rows by construction, so the join
    * is always a broadcast. */
  def classifierGateStream(docs: DataFrame, weights: DataFrame,
      tau: DataFrame)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val b = batch.localCheckpoint()
          sink(graft.operators.Curation.qualityClassifierApply(b, weights, tau))
        }
      }
      .start()

  /** Stream-static rarity scoring: each micro-batch of the live
    * document feed joins the STATIC corpus word-rank table (broadcast
    * stream-static join — the feed side stays narrow, the table is
    * vocabulary-bounded) and aggregates per document inside the batch.
    * Documents arrive whole (the feed contract), so scoring is exact
    * per batch with no cross-batch state — the shape for enriching an
    * ingest stream against lake-derived reference data. */
  def rarityStream(docs: DataFrame, ranks: DataFrame)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          // the scoring join is inner (the rank table must cover the
          // feed's vocabulary); a stale reference table would silently
          // skew scores or drop docs — fail the batch loudly instead
          val b = batch.localCheckpoint()
          val oov = b
            .select(explode(split(col("text"), " ")).as("word"))
            .join(broadcast(ranks), Seq("word"), "left_anti")
            .count()
          require(oov == 0,
            s"rarityStream: $oov feed tokens missing from the rank table — " +
              "refresh the reference before scoring")
          sink(graft.operators.Curation.rarityScores(b, ranks))
        }
      }
      .start()

  /** Stream-static anomaly surveillance: each micro-batch of the live
    * trade feed joins the STATIC per-symbol (mean, σ) reference table
    * (broadcast, symbol-bounded — computed from the lake by
    * MarketQueries.anomalyStats) and flags |z| > 3 rows — the
    * continuous twin of batch q21_anomaly, stateless per row, no
    * watermark or state store. The same lake-derived-reference shape
    * as rarityStream: batch analytics computes the table, the stream
    * applies it at scan speed. */
  def anomalyStream(trades: DataFrame, stats: DataFrame): DataFrame =
    graft.operators.MarketQueries.anomalyFlag(trades, stats)

  /** Streaming PII/denylist redaction: the same stateless narrow
    * expressions as `text_pii_redact`, applied to a live document feed
    * — no watermark or state store, every micro-batch redacts at scan
    * speed (the shape a compliance gate needs between ingest and the
    * training lake). */
  def redactStream(docs: DataFrame): DataFrame =
    graft.operators.Curation.redactionReport(docs)

  case class FunnelState(t1: Long, t2: Long, t3: Long) // µs; -1 = not reached

  case class FunnelOut(user_id: Long, stage_ord: Int, ts: java.sql.Timestamp)

  private val FunnelWindowUs = 24L * 3600 * 1000000L

  /** Streaming conversion funnel: the q19_funnel stage machine (view →
    * click within 24 h → purchase within 24 h of the click) evaluated
    * live, one row emitted per user per stage REACHED — downstream, the
    * stage counts are a trivial aggregate of this change stream.
    *
    * State is one 3-slot record per user (the stage timestamps), the
    * minimal state a funnel can carry — |active users| rows at any
    * corpus size, with the same event-time-ordered-feed contract as
    * [[asofJoin]] (within a batch, rows are sorted; stage checks use
    * the batch operator's strict-inequality window rules, so a replayed
    * prefix advances the machine identically). A state timeout, when
    * passed, EVICTS an idle user's journey — the funnel forgets them
    * (bounded state buys a conversion horizon); the synchronous-test
    * default is NoTimeout. StreamingSpec pins stage-count equivalence
    * with batch q19 across a multi-batch feed. */
  def funnelStream(events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption.getOrElse(FunnelState(-1, -1, -1))
            val out = Seq.newBuilder[FunnelOut]
            sorted.foreach { e =>
              val t = micros(e.ts)
              e.event_type match {
                case "view" if st.t1 < 0 =>
                  st = st.copy(t1 = t); out += FunnelOut(userId, 1, e.ts)
                case "click" if st.t1 >= 0 && st.t2 < 0 &&
                    t > st.t1 && t <= st.t1 + FunnelWindowUs =>
                  st = st.copy(t2 = t); out += FunnelOut(userId, 2, e.ts)
                case "purchase" if st.t2 >= 0 && st.t3 < 0 &&
                    t > st.t2 && t <= st.t2 + FunnelWindowUs =>
                  st = st.copy(t3 = t); out += FunnelOut(userId, 3, e.ts)
                case _ => () // other types (or already-passed stages) don't move the machine
              }
            }
            state.update(st)
            out.result().iterator
          }
        })
  }

  private val GapMs = 30L * 60 * 1000

  /** Gap-based sessionization with explicit state: one SessionState per
    * active user, closed (emitted) when a gap over 30 minutes arrives
    * or the state times out. Production feeds pass
    * `ProcessingTimeTimeout` so idle users flush; synchronous tests use
    * `NoTimeout` (a processing-time timeout keeps re-arming batches
    * under `processAllAvailable`). */
  def sessionize(events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(st => SessionOut(userId,
              new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.end), st.n, st.total))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t - st.end <= GapMs =>
                  cur = Some(st.copy(end = t, n = st.n + 1, total = st.total + e.value))
                case Some(st) =>
                  closed += SessionOut(userId, new java.sql.Timestamp(st.start),
                    new java.sql.Timestamp(st.end), st.n, st.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach(state.update)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration("1 hour")
            closed.result().iterator
          }
        })
  }
}
