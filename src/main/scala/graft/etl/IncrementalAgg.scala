package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental materialized-aggregate maintenance: keep a rollup table
  * (group keys → count + exact decimal sums) in sync with an
  * append-only snapshot-enabled lake by aggregating ONLY the files new
  * since the last refresh and merging the partials into the
  * materialized state — never re-scanning history.
  *
  * This is the lakehouse "incremental view maintenance" primitive: a
  * daily-summary table over a 100 TB lake refreshes by reading one
  * day's files ([[Snapshots.readAdded]] — an explicit manifest-diff
  * file list, no directory scan) plus the old rollup (sized by group
  * cardinality, not history). The algebra makes it exact: counts and
  * DECIMAL sums are associative partials, so merge order — and how
  * many refreshes it took to get here — can't leak into the result
  * (the same argument as `dsum`, SURVEY §4). Contract: append-style
  * evolution only, inherited from Snapshots; a rewrite (compaction,
  * CDC) invalidates the base snapshots and [[refresh]] fails loudly
  * with them rather than silently double-counting.
  */
object IncrementalAgg {

  /** A maintainable aggregate: group keys + (alias → measure column)
    * exact decimal sums; row count is always maintained. */
  final case class AggSpec(keys: Seq[String], sums: Seq[(String, String)])

  private def stateFile(aggPath: String) = new Path(aggPath, "_state/version.txt")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Snapshot version the materialized table was last synced to. */
  def syncedVersion(spark: SparkSession, aggPath: String): Option[Int] = {
    val p = stateFile(aggPath)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text = new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      in.close()
      Some(text.trim.toInt)
    }
  }

  private def writeState(spark: SparkSession, aggPath: String, v: Int): Unit = {
    val p = stateFile(aggPath)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    out.write(v.toString.getBytes("UTF-8")); out.close()
  }

  /** Mergeable partials of `df` under `spec`: count + exact decimal
    * sums per key. Applied both to new files (delta) and — because the
    * columns are already partials — to the union of state and delta. */
  private def partials(df: DataFrame, spec: AggSpec): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
      spec.sums.map { case (alias, measure) =>
        sum(col(measure).cast(DecimalType(38, 6))).as(s"sum_$alias")
      }
    df.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Re-merge already-aggregated partial rows (state ∪ delta). */
  private def remerge(df: DataFrame, spec: AggSpec): DataFrame = {
    val aggs: Seq[Column] = sum(col("n_rows")).as("n_rows") +:
      spec.sums.map { case (alias, _) =>
        sum(col(s"sum_$alias")).as(s"sum_$alias")
      }
    df.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Builds the materialized table from the lake's LATEST snapshot
    * (commits one if the lake has no snapshot history yet) and records
    * the sync point. Returns the synced version. */
  def fullBuild(spark: SparkSession, lakePath: String, aggPath: String,
      spec: AggSpec): Int = {
    val v = Snapshots.versions(spark, lakePath).lastOption
      .getOrElse(Snapshots.commit(spark, lakePath))
    partials(Snapshots.readVersion(spark, lakePath, v), spec)
      .write.mode("overwrite").parquet(aggPath)
    writeState(spark, aggPath, v)
    v
  }

  /** Folds everything the lake appended since the last sync into the
    * materialized table: one aggregate over the manifest-diff file
    * list, one merge with the old state (localCheckpoint'd — the merge
    * reads the files it replaces, the CdcMerge rule). The overwrite
    * wipes the version marker along with the old state and the new
    * marker is written only after the new state lands, so a crash
    * mid-refresh leaves NO marker — syncedVersion() reports unsynced
    * and recovery is a (correct, conservative) fullBuild, never a
    * silent double-count. Returns the new synced version; no-op when
    * the lake hasn't moved. */
  def refresh(spark: SparkSession, lakePath: String, aggPath: String,
      spec: AggSpec): Int = {
    val have = syncedVersion(spark, aggPath).getOrElse(
      throw new IllegalStateException(
        s"no materialized aggregate at $aggPath — run fullBuild first"))
    val latest = Snapshots.versions(spark, lakePath).lastOption.getOrElse(
      throw new IllegalStateException(s"$lakePath has no snapshots"))
    require(latest >= have,
      s"materialized state at v$have is AHEAD of the lake's v$latest — " +
      "the lake was rolled back; rebuild with fullBuild")
    if (latest == have) return have
    val addedPaths = Snapshots.addedFiles(spark, lakePath, have, latest)
    if (addedPaths.isEmpty) { writeState(spark, aggPath, latest); return latest }
    val delta = partials(Snapshots.readAdded(spark, lakePath, have, latest), spec)
    val merged = remerge(
      spark.read.parquet(aggPath).unionByName(delta), spec).localCheckpoint()
    merged.write.mode("overwrite").parquet(aggPath)
    writeState(spark, aggPath, latest)
    latest
  }
}
