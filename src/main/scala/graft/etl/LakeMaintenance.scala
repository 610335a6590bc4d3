package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lake lifecycle maintenance: compaction and retention.
  *
  * The reference encodes lifecycle in infra (terraform lifecycle
  * policies, README: "archive raw/ after 90 days") — here the same
  * policies are Spark jobs over the partitioned lake itself, so any
  * deployment has them without cloud-provider hooks.
  *
  * Scale notes: compaction reads only the partitions it rewrites
  * (partition-pruned scan, dynamic partition overwrite), never the
  * whole lake; the file census is a driver-side listing of partition
  * directories (bounded by partition count, not data size — the same
  * listing every query's split planning already does). Retention is a
  * metadata-only directory delete, no data scan at all.
  */
object LakeMaintenance {

  /** One row per leaf partition directory: path + file count + bytes.
    * Hive-style `k=v` layout (the MarketEtl sink's contract). */
  def partitionCensus(spark: SparkSession, lakeRoot: String): Seq[(String, Int, Long)] = {
    val root = new Path(lakeRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: Path): Seq[Path] = {
      val kids = fs.listStatus(p).filter(s => !s.getPath.getName.startsWith("_"))
      val dirs = kids.filter(_.isDirectory)
      if (dirs.isEmpty) Seq(p)
      else dirs.toSeq.flatMap(d => leaves(d.getPath))
    }
    leaves(root).filter(_ != root).map { p =>
      val files = fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      (p.toString, files.length, files.map(_.getLen).sum)
    }
  }

  /** Rewrites every partition holding more than `maxFiles` data files
    * into one file per partition (small-file compaction). Only the
    * fragmented partitions are read or touched; results are
    * byte-equivalent to the originals. Returns the number of
    * partitions compacted.
    *
    * Work proceeds in passes of at most `partitionsPerPass` partition
    * dirs: each pass materializes its rows (localCheckpoint — the
    * rewrite reads the files it replaces, so rows must leave the
    * source lineage before the overwrite; relying on the
    * dynamic-overwrite committer deferring deletion is fragile against
    * committer changes) and each pass is itself a complete, durable
    * compaction. Bounding the pass size bounds the materialized
    * footprint — compacting a 100 TB lake's worth of fragmented
    * partitions in one checkpoint would be the scale hazard the
    * batching avoids — and a crash between passes loses nothing. */
  def compact(spark: SparkSession, lakeRoot: String, maxFiles: Int = 1,
      partitionsPerPass: Int = 64): Int =
    DataSkipping.sidecarParams(spark, lakeRoot) match {
      case Some((cols, bits, k)) =>
        compactFromStats(spark, lakeRoot, maxFiles, partitionsPerPass, cols, bits, k)
      case None =>
        compactFromListing(spark, lakeRoot, maxFiles, partitionsPerPass)
    }

  /** Sidecar-aware compaction (round 9): fragmentation targets come
    * from [[DataSkipping.fragmentedDirs]] — the sidecar's per-file
    * rows, one small-parquet read — instead of a whole-lake listing,
    * and the sidecar is folded forward DELTA-wise around each pass
    * (the [[CdcMerge]] lifecycle: drop the doomed files' rows before
    * the rewrite, describe the new files after), so post-compaction
    * pruning works immediately without a full re-ANALYZE. At 100 TB
    * both halves matter: the listing of every partition is itself a
    * large job, and a re-ANALYZE after every maintenance pass would
    * read the whole lake to describe a few new files. */
  private def compactFromStats(spark: SparkSession, lakeRoot: String,
      maxFiles: Int, partitionsPerPass: Int,
      cols: Seq[String], bits: Int, k: Int): Int = {
    val targets = DataSkipping.fragmentedDirs(spark, lakeRoot, maxFiles)
    if (targets.isEmpty) return 0
    val root = new Path(lakeRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // partition columns from the target dirs' own k=v segments — the
    // sidecar paths carry the layout, no listing needed
    val partCols = targets.head._1.split("/")
      .filter(_.contains("=")).map(_.split("=")(0)).toSeq
    targets.grouped(partitionsPerPass).foreach { batch =>
      // step 1 (CdcMerge's lifecycle): the sidecar stops claiming the
      // files about to be rewritten BEFORE the overwrite commits — a
      // crash leaves the surviving files untracked (read
      // conservatively), never wrongly described
      DataSkipping.refresh(spark, lakeRoot,
        removed = batch.flatMap(_._2), added = Seq.empty)
      spark.read
        .option("basePath", lakeRoot)
        .parquet(batch.map(_._1): _*)
        .repartition(partCols.map(col): _*)
        .localCheckpoint()
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCols: _*)
        .parquet(lakeRoot)
      // step 2: describe the rewritten layout — a listing of just this
      // pass's partition dirs (bounded by the pass width, not the lake)
      val added = batch.map(_._1).flatMap { d =>
        val dir = new Path(d)
        if (!fs.exists(dir)) Seq.empty[String]
        else fs.listStatus(dir).filter { s =>
          val n = s.getPath.getName
          s.isFile && !n.startsWith("_") && !n.startsWith(".")
        }.map(s => fs.makeQualified(s.getPath).toString).toSeq
      }
      DataSkipping.describe(spark, lakeRoot, added, cols, bits, k)
    }
    Snapshots.reSnapshot(spark, lakeRoot)
    targets.size
  }

  /** Listing-driven fallback when no sidecar describes the lake; the
    * rewrite invalidates nothing (there is no sidecar) beyond the
    * snapshot chain. */
  private def compactFromListing(spark: SparkSession, lakeRoot: String,
      maxFiles: Int, partitionsPerPass: Int): Int = {
    val fragmented = partitionCensus(spark, lakeRoot).filter(_._2 > maxFiles)
    if (fragmented.isEmpty) return 0
    val partCols = partitionColumns(spark, lakeRoot)
    fragmented.grouped(partitionsPerPass).foreach { batch =>
      // one pruned read over just this pass's partition dirs; base
      // path keeps the partition columns in the schema
      spark.read
        .option("basePath", lakeRoot)
        .parquet(batch.map(_._1): _*)
        .repartition(partCols.map(col): _*)
        .localCheckpoint()
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCols: _*)
        .parquet(lakeRoot)
    }
    reSnapshot(spark, lakeRoot)
    fragmented.size
  }

  /** A rewrite invalidates any snapshot referencing the old files
    * (expire + fresh snapshot, VACUUM semantics — see
    * Snapshots.reSnapshot) and any data-skipping sidecar (its stats
    * rows point at the replaced files; re-ANALYZE is part of the
    * maintenance job, like re-snapshotting). */
  private def reSnapshot(spark: SparkSession, lakeRoot: String): Unit = {
    Snapshots.reSnapshot(spark, lakeRoot)
    DataSkipping.invalidate(spark, lakeRoot)
  }

  /** Morton (Z-order) key: interleaves the low `bits` bits of each
    * already-normalized integer column — bit j of column i lands at
    * position j*n + i, so a range of keys is a compact rectangle in
    * every dimension at once. Pure codegen'd shift/mask arithmetic. */
  def mortonKey(cols: Seq[org.apache.spark.sql.Column], bits: Int): org.apache.spark.sql.Column = {
    // JVM shift amounts wrap mod 64: bits*n > 63 would silently fold
    // high interleaved bits onto positions owned by other (j,i) pairs
    // and corrupt the key — fail loudly instead
    require(bits * cols.size <= 63,
      s"mortonKey: $bits bits x ${cols.size} cols exceeds a 64-bit key")
    val n = cols.size
    (0 until bits).flatMap { j =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Partition columns inferred from the first leaf directory's
    * Hive-style `k=v` segments, with the lake root fs-qualified so the
    * prefix strip is exact (partitionCensus returns qualified paths —
    * an unqualified relative root would make stripPrefix a no-op and
    * misread any ancestor directory containing '='). Shared by every
    * rewrite job. */
  private def partitionColumns(spark: SparkSession, lakeRoot: String): Seq[String] = {
    val root = new Path(lakeRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(root).toString
    partitionCensus(spark, lakeRoot).headOption.toSeq
      .flatMap(_._1.stripPrefix(qualified).split("/")
        .filter(_.contains("=")).map(_.split("=")(0)))
  }

  /** Multi-dimensional clustering (the lakehouse OPTIMIZE ZORDER): a
    * Hive partition layout can only prune its own prefix dimensions —
    * predicates on anything else scan every file. This rewrite makes
    * each data file cover a compact rectangle in the space of `zCols`
    * (numeric, non-partition columns): per-column global min/max (one
    * tiny aggregate), bit-normalize each value into 2^`bits` buckets,
    * interleave into the Morton key, then range-repartition + local
    * sort by (partition cols, z) and rewrite. File/row-group min-max
    * stats then skip on ALL `zCols` simultaneously. Everything except
    * the one-row stats collect is distributed; `outFiles` bounds the
    * target file count (at 100 TB you'd size it to the data / target
    * file size, exactly like compaction's pass width). */
  def zorderCluster(spark: SparkSession, lakeRoot: String, zCols: Seq[String],
      outFiles: Int = 8, bits: Int = 12): Unit = {
    val df = spark.read.parquet(lakeRoot)
    val partCols = partitionColumns(spark, lakeRoot)
    val statCols = zCols.map(c => min(col(c).cast("double")).as(s"mn_$c")) ++
      zCols.map(c => max(col(c).cast("double")).as(s"mx_$c"))
    val stats = df.agg(statCols.head, statCols.tail: _*).head()
    val maxCode = (1L << bits) - 1
    val normed = zCols.map { c =>
      // all-null column or zero-row lake: min/max are null — treat the
      // dimension as constant instead of NPEing mid-rewrite
      if (stats.isNullAt(stats.fieldIndex(s"mn_$c")) ||
          stats.isNullAt(stats.fieldIndex(s"mx_$c"))) lit(0L)
      else {
      val mn = stats.getAs[Double](s"mn_$c")
      val mx = stats.getAs[Double](s"mx_$c")
      if (mx > mn)
        least(lit(maxCode), greatest(lit(0L),
          ((col(c).cast("double") - mn) / (mx - mn) * maxCode).cast("long")))
      else lit(0L)
      }
    }
    val keys = partCols.map(col) :+ col("__z")
    val clustered = df.withColumn("__z", mortonKey(normed, bits))
      .repartitionByRange(outFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop("__z")
      .localCheckpoint() // the rewrite reads the files it replaces
    val writer = clustered.write.mode(SaveMode.Overwrite)
    if (partCols.nonEmpty)
      writer.option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCols: _*).parquet(lakeRoot)
    else writer.parquet(lakeRoot)
    reSnapshot(spark, lakeRoot)
  }

  /** Age-based retention for a lake partitioned by year/month/day:
    * drops (deletes) every partition strictly older than the cutoff
    * date. Pure metadata operation — directory deletes, no scan.
    * Returns the number of dropped partition directories. */
  def retention(spark: SparkSession, lakeRoot: String,
      cutoff: java.time.LocalDate): Int = {
    val root = new Path(lakeRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def kv(p: Path, k: String): Option[Int] = {
      val seg = p.toString.split("/").find(_.startsWith(s"$k="))
      seg.map(_.split("=")(1).toInt)
    }
    // walk only to day-depth (year=/month=/day=), never into leaves
    def dayDirs(p: Path): Seq[Path] = {
      val kids = fs.listStatus(p).filter(s =>
        s.isDirectory && !s.getPath.getName.startsWith("_"))
      kids.toSeq.flatMap { d =>
        if (d.getPath.getName.startsWith("day=")) Seq(d.getPath)
        else dayDirs(d.getPath)
      }
    }
    val expired = dayDirs(root).filter { p =>
      (kv(p, "year"), kv(p, "month"), kv(p, "day")) match {
        case (Some(y), Some(m), Some(d)) =>
          java.time.LocalDate.of(y, m, d).isBefore(cutoff)
        case _ => false
      }
    }
    expired.foreach(fs.delete(_, true))
    if (expired.nonEmpty) reSnapshot(spark, lakeRoot)
    expired.size
  }
}
