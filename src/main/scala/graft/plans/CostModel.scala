package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

import graft.etl.TableStats

/** Plan-time cost-based decisions fed by the shared ANALYZE ledger
  * ([[graft.etl.TableStats]]).
  *
  * Spark's own CBO (`spark.sql.cbo.enabled`) only fires for catalog
  * tables with `ANALYZE TABLE` statistics — path-based parquet reads
  * (this engine's lake layout, and the reference's Athena external
  * tables) never get plan-time row counts, so the optimizer falls
  * back to size-on-disk heuristics and AQE. AQE fixes the join
  * strategy only AFTER the first shuffle stages materialize; a
  * plan-time choice from the stats ledger avoids ever planning the
  * shuffle. This object is that missing plan-time path: the same
  * memoized statistic that sizes a derived capacity (bloom buckets,
  * IVF k, LSH planes) also drives the join-side decision, so one
  * ANALYZE pass per lake feeds every consumer and the decisions can
  * never disagree about what the lake looks like.
  */
object CostModel {

  /** Row-count ceiling for a stats-driven broadcast. A conservative
    * proxy for the 10 MB `autoBroadcastJoinThreshold` given the
    * narrow (2-3 column, ≤ ~16 B/row) build projections this engine
    * broadcasts: 1M rows ≈ 16 MB serialized, the upper edge of what a
    * 1000-executor broadcast tolerates. Above it the join degrades to
    * a shuffle join — the correct plan for a build side that grew. */
  val BroadcastRowLimit: Long = 1L << 20

  /** True iff a build side with `buildRows` rows should be broadcast. */
  def broadcastable(buildRows: Long, limit: Long = BroadcastRowLimit): Boolean =
    buildRows <= limit

  /** Equi-join with the build-side strategy chosen from the ANALYZE
    * ledger: broadcast `build` iff the memoized statistic under
    * `buildStatKey` says it fits, else a plain join (shuffle, or
    * whatever AQE picks at runtime). The statistic is computed once
    * per (application, key) — re-ANALYZE via
    * [[TableStats.invalidate]] flips the decision on the next plan
    * build, which is exactly how a catalog CBO reacts to a dimension
    * that grew. */
  def statsJoin(s: SparkSession, fact: DataFrame, build: DataFrame,
      buildStatKey: String, cond: Column, joinType: String = "inner",
      limit: Long = BroadcastRowLimit)(buildCount: => Long): DataFrame = {
    val n = TableStats.rowCount(s, buildStatKey)(buildCount)
    if (broadcastable(n, limit)) fact.join(broadcast(build), cond, joinType)
    else fact.join(build, cond, joinType)
  }

  /** [[statsJoin]] for USING-column joins (the join key appears once
    * in the output) — same ledger-driven build-side decision. */
  def statsJoinUsing(s: SparkSession, fact: DataFrame, build: DataFrame,
      buildStatKey: String, usingCols: Seq[String], joinType: String = "inner",
      limit: Long = BroadcastRowLimit)(buildCount: => Long): DataFrame = {
    val n = TableStats.rowCount(s, buildStatKey)(buildCount)
    if (broadcastable(n, limit)) fact.join(broadcast(build), usingCols, joinType)
    else fact.join(build, usingCols, joinType)
  }
}
