package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-style CDC apply over the partitioned lake.
  *
  * A change batch (rows tagged insert/update/delete with a sequence
  * number) is merged into the lake with latest-wins semantics per key:
  * the newest change for a key replaces the stored row ('I'/'U') or
  * removes it ('D'). The reference lake has no in-place merge (Athena
  * over immutable S3 parquet — updates mean rewriting objects); this
  * is that rewrite done surgically.
  *
  * Scale design: only partitions named by the change batch are read or
  * rewritten — the partition filter is pushed into the scan (partition
  * pruning, no full-lake read), the merge itself is one anti-join plus
  * a union, and the write uses dynamic partition overwrite so
  * untouched partitions keep their files byte-for-byte. Change batches
  * are small relative to the lake, so the affected-partition list
  * broadcasts. Re-applying the same batch is a no-op by construction
  * (latest-wins is idempotent).
  *
  * Contract: a key's partition columns are stable across changes (true
  * for trades — trade_id never moves symbol/day); a partition-moving
  * update must be modeled as D + I.
  */
object CdcMerge {

  private val partCols = Seq("year", "month", "day", "symbol")

  /** Latest change per key — the state a key converges to no matter
    * how many times the batch replays. The max_by order key is the
    * full value struct led by seq: two changes with equal seq resolve
    * by comparing the remaining fields, so replay is deterministic
    * even on malformed batches that reuse a sequence number (a bare
    * seq key would let ties resolve by partition order and break the
    * idempotent-replay guarantee). */
  private def latestChanges(changes: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val valueCols = changes.columns.filterNot(c => keyCols.contains(c))
    val orderCols = col(seqCol) +: valueCols.filterNot(_ == seqCol).map(col)
    changes.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*), struct(orderCols: _*)).as("v"))
      .select(keyCols.map(col) ++ valueCols.map(c => col(s"v.$c")): _*)
  }

  /** Planning-time partition predicate for the affected partitions —
    * this reaches the scan as a PartitionFilters entry, so unaffected
    * partitions are never read. */
  private def partitionPredicate(parts: Array[org.apache.spark.sql.Row]): Column =
    parts.map { r =>
      partCols.zipWithIndex.map { case (c, i) => col(c) === lit(r.get(i)) }
        .reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))

  /** Applies `changes` to the lake at `lakePath`. `changes` must carry
    * the lake's columns plus `op` ('I'|'U'|'D') and a monotone `seq`.
    * Returns (upserted, deleted) row counts. */
  def apply(spark: SparkSession, lakePath: String, changes: DataFrame,
      keyCols: Seq[String], seqCol: String = "seq"): (Long, Long) = {
    val latest = latestChanges(changes, keyCols, seqCol).cache()
    val affected = latest.select(partCols.map(col): _*).distinct().collect()
    val current = spark.read.parquet(lakePath)
      .filter(partitionPredicate(affected))
    val upserts = latest.filter(col("op") =!= "D").drop("op", seqCol)
    val merged = current
      .join(broadcast(latest.select(keyCols.map(col): _*)), keyCols, "left_anti")
      .unionByName(upserts.select(current.columns.map(col): _*))
      .repartition(partCols.map(col): _*)
      // materialize BEFORE the overwrite: the rewrite reads the same
      // files it replaces, so the merged rows must leave the source
      // lineage first (this also lifts Spark's read-write-conflict ban)
      .localCheckpoint()
    merged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(lakePath)
    // dynamic overwrite only replaces partitions present in the output:
    // a partition whose every row was deleted emits nothing and must be
    // dropped explicitly
    val remaining = merged.select(partCols.map(col): _*).distinct()
      .collect().map(_.toSeq).toSet
    val emptied = affected.filterNot(r => remaining(r.toSeq))
    if (emptied.nonEmpty) {
      val root = new org.apache.hadoop.fs.Path(lakePath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { r =>
        val dir = partCols.zip(r.toSeq).map { case (c, v) => s"$c=$v" }.mkString("/")
        fs.delete(new org.apache.hadoop.fs.Path(root, dir), true)
      }
    }
    val counts = (upserts.count(), latest.filter(col("op") === "D").count())
    latest.unpersist()
    // the merge rewrote files: expire the snapshots it invalidated and
    // commit the new layout, exactly as compaction/retention do
    Snapshots.reSnapshot(spark, lakePath)
    counts
  }
}
