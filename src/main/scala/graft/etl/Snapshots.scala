package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal table-format layer over the parquet lake: versioned
  * file-manifest snapshots with time-travel reads and rollback.
  *
  * What Iceberg/Delta call a snapshot is, at its core, a manifest of
  * the data files visible at a version. This records exactly that —
  * `_snapshots/v{N}.manifest`, one relative path + length per line —
  * giving the lake the three operations the immutable-append workflow
  * needs: `commit` after a load, `readVersion` to query any past
  * snapshot, `rollback` to discard files added since one.
  *
  * Scale notes: a manifest is one driver-side listing (bounded by file
  * count, the same listing split planning does) and snapshot reads
  * pass the explicit file list to the parquet source — no directory
  * scan at all, and partition columns still parse from the paths via
  * `basePath`. Contract: append-style evolution (ingestion, CDC
  * inserts of new partitions) commits via the walking [[commit]];
  * rewrites (index compaction) VERSION THEMSELVES via
  * [[commitEntries]] — stage new files, PUT one manifest object
  * naming exactly them, vacuum the superseded files after — which is
  * the object-store committer contract (atomic single-object PUT,
  * never a rename; see StreamingJobs.compactIngestPartitions). A
  * rewrite that bypasses commitEntries invalidates older snapshots,
  * enforced by `rollback`/`readVersion` failing loudly when a
  * manifest file is gone.
  */
object Snapshots {

  private def snapDir(lakeRoot: String) = new Path(lakeRoot, "_snapshots")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(spark: SparkSession, lakeRoot: String): Seq[(String, Long)] = {
    val root = new Path(lakeRoot)
    val f = fs(spark, root)
    val rootUri = f.makeQualified(root).toString
    def walk(p: Path): Seq[(String, Long)] =
      f.listStatus(p).filter(!_.getPath.getName.startsWith("_")).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq((f.makeQualified(s.getPath).toString.stripPrefix(rootUri + "/"), s.getLen))
      }
    walk(root)
  }

  def versions(spark: SparkSession, lakeRoot: String): Seq[Int] = {
    val d = snapDir(lakeRoot)
    val f = fs(spark, d)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toInt }
      .toSeq.sorted
  }

  /** Highest version number ever used, live or expired — version
    * numbers are never reused. */
  private def maxEverVersion(spark: SparkSession, lakeRoot: String): Int = {
    val d = snapDir(lakeRoot)
    val f = fs(spark, d)
    if (!f.exists(d)) 0
    else f.listStatus(d).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.contains(".manifest") =>
        n.stripPrefix("v").takeWhile(_.isDigit).toInt }
      .foldLeft(0)(math.max)
  }

  /** Records the current file set as the next snapshot version and
    * returns its number. */
  def commit(spark: SparkSession, lakeRoot: String): Int =
    commitEntries(spark, lakeRoot, dataFiles(spark, lakeRoot))

  /** Records an EXPLICIT file set as the next snapshot version — the
    * single-object-PUT commit of a staged rewrite (index compaction)
    * or of a streaming append on the object-store model, where the
    * committed set must differ from "whatever a directory walk sees"
    * (staged-but-uncommitted files stay invisible to every manifest
    * reader until this one object lands). Paths are relative to
    * `lakeRoot`. Returns the new version. */
  def commitEntries(spark: SparkSession, lakeRoot: String,
      entries: Seq[(String, Long)]): Int = {
    val v = maxEverVersion(spark, lakeRoot) + 1
    val manifest = entries
      .map { case (p, len) => s"$p\t$len" }.sorted.mkString("\n")
    val d = snapDir(lakeRoot)
    val f = fs(spark, d)
    f.mkdirs(d)
    val out = f.create(new Path(d, s"v$v.manifest"), true)
    out.write(manifest.getBytes("UTF-8")); out.close()
    v
  }

  /** Relative (path, length) listing of one subtree — how a staged
    * rewrite or a just-written append partition enumerates exactly its
    * OWN output for [[commitEntries]] (a writer-side bounded listing
    * of files it created, never a read-path scan of the table). */
  def filesUnder(spark: SparkSession, lakeRoot: String,
      subdir: String): Seq[(String, Long)] = {
    val root = new Path(lakeRoot)
    val f = fs(spark, root)
    val rootUri = f.makeQualified(root).toString
    val sub = new Path(root, subdir)
    if (!f.exists(sub)) return Seq.empty
    def walk(p: Path): Seq[(String, Long)] =
      f.listStatus(p).filter(!_.getPath.getName.startsWith("_")).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq((f.makeQualified(s.getPath).toString.stripPrefix(rootUri + "/"), s.getLen))
      }
    walk(sub)
  }

  /** The version number the NEXT commit will use (never reuses live or
    * expired numbers) — lets a staged rewrite name its staging dir
    * after the version it is about to commit. */
  def nextVersion(spark: SparkSession, lakeRoot: String): Int =
    maxEverVersion(spark, lakeRoot) + 1

  def manifest(spark: SparkSession, lakeRoot: String, version: Int): Seq[(String, Long)] = {
    val p = new Path(snapDir(lakeRoot), s"v$version.manifest")
    val f = fs(spark, p)
    require(f.exists(p), s"no snapshot v$version under $lakeRoot")
    val in = f.open(p)
    val text = new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    text.linesIterator.filter(_.nonEmpty).map { l =>
      val Array(path, len) = l.split("\t"); (path, len.toLong)
    }.toSeq
  }

  /** Explicit-file-list read whose partition parsing tolerates MIXED
    * directory depths. After an index compaction the live manifest can
    * reference both `gen{v}/ingest_batch=-1/...` staged files and
    * root-level `ingest_batch=N/...` stream appends; Spark's partition
    * inference requires every file to share ONE base after stripping
    * trailing k=v segments, so a single read over such a union fails
    * with CONFLICTING_DIRECTORY_STRUCTURES regardless of basePath.
    * Group the files by their partition-stripped base, read each group
    * with its own basePath (partition values still parse), and union
    * by name. */
  private def readFileList(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "readFileList: empty file list — nothing to read")
    def base(p: String): String = {
      val dirs = p.split('/').dropRight(1) // drop the filename
      val partRun = dirs.reverse.takeWhile(_.contains("=")).length
      dirs.dropRight(partRun).mkString("/")
    }
    val groups = paths.groupBy(base).toSeq.sortBy(_._1).map { case (b, ps) =>
      (b, spark.read.option("basePath", b).parquet(ps: _*))
    }
    // loud failure over a confusing union error: a manifest mixing
    // partitioned (k=v dirs) and unpartitioned files yields groups
    // whose parsed schemas disagree on the partition columns
    val cols0 = groups.head._2.columns.toSet
    groups.foreach { case (b, df) =>
      require(df.columns.toSet == cols0,
        s"readFileList: file groups disagree on columns — group '$b' " +
        s"parses [${df.columns.sorted.mkString(",")}] vs " +
        s"[${cols0.toSeq.sorted.mkString(",")}]; a manifest must not mix " +
        "partitioned and unpartitioned files of one table")
    }
    groups.map(_._2).reduce(_.unionByName(_))
  }

  /** Time-travel read: exactly the files of `version`, as of commit
    * time. Fails loudly if a manifest file was rewritten away. */
  def readVersion(spark: SparkSession, lakeRoot: String, version: Int): DataFrame = {
    val root = new Path(lakeRoot)
    val f = fs(spark, root)
    val qualified = f.makeQualified(root).toString
    val paths = manifest(spark, lakeRoot, version).map { case (p, _) => s"$qualified/$p" }
    paths.foreach(p => require(f.exists(new Path(p)),
      s"snapshot v$version references rewritten/deleted file $p — " +
      "snapshots only survive append-style evolution (see Snapshots doc)"))
    readFileList(spark, paths)
  }

  /** The incremental read set: files present in `toVersion` but not
    * `fromVersion`. With append-style loads this is exactly the new
    * data between the two commits — the primitive an incremental
    * downstream job consumes instead of re-scanning the lake. */
  def addedFiles(spark: SparkSession, lakeRoot: String,
      fromVersion: Int, toVersion: Int): Seq[String] = {
    val before = manifest(spark, lakeRoot, fromVersion).map(_._1).toSet
    manifest(spark, lakeRoot, toVersion).map(_._1).filterNot(before)
  }

  /** Reads only the rows added between two snapshots (explicit
    * file-list scan; partition columns still parse via basePath). */
  def readAdded(spark: SparkSession, lakeRoot: String,
      fromVersion: Int, toVersion: Int): DataFrame = {
    val root = new Path(lakeRoot)
    val qualified = fs(spark, root).makeQualified(root).toString
    val paths = addedFiles(spark, lakeRoot, fromVersion, toVersion)
      .map(p => s"$qualified/$p")
    require(paths.nonEmpty,
      s"no files added between v$fromVersion and v$toVersion")
    readFileList(spark, paths)
  }

  /** Drops every snapshot whose manifest references a file that no
    * longer exists — the aftermath of a rewrite (compaction,
    * retention, CDC). Table-format VACUUM semantics: maintenance
    * trades old time travel for layout. Returns the expired versions.
    * Callers that rewrite should follow with [[commit]] so the new
    * layout is itself a snapshot (LakeMaintenance does both). */
  def expireInvalid(spark: SparkSession, lakeRoot: String): Seq[Int] = {
    val root = new Path(lakeRoot)
    val f = fs(spark, root)
    versions(spark, lakeRoot).filter { v =>
      manifest(spark, lakeRoot, v).exists { case (p, _) => !f.exists(new Path(root, p)) }
    }.map { v =>
      // rename, don't delete: keeps the audit trail and keeps version
      // numbers monotone (commit never reuses an expired number)
      f.rename(new Path(snapDir(lakeRoot), s"v$v.manifest"),
        new Path(snapDir(lakeRoot), s"v$v.manifest.expired")); v
    }
  }

  /** True when the lake has any snapshot history. */
  def enabled(spark: SparkSession, lakeRoot: String): Boolean =
    versions(spark, lakeRoot).nonEmpty

  /** Post-rewrite housekeeping for snapshot-enabled lakes: expire the
    * snapshots the rewrite invalidated and commit the new layout. A
    * no-op on lakes without snapshot history. Every job that rewrites
    * files (compaction, retention, CDC merge) must call this, or all
    * prior snapshots dangle until readVersion/rollback fail loudly. */
  def reSnapshot(spark: SparkSession, lakeRoot: String): Unit =
    if (enabled(spark, lakeRoot)) {
      expireInvalid(spark, lakeRoot)
      commit(spark, lakeRoot)
    }

  /** Deletes every data file not in `version`'s manifest (and any
    * now-empty partition dirs), restoring the lake to that snapshot.
    * Returns the number of files removed. */
  def rollback(spark: SparkSession, lakeRoot: String, version: Int): Int = {
    val keep = manifest(spark, lakeRoot, version).map(_._1).toSet
    val root = new Path(lakeRoot)
    val f = fs(spark, root)
    keep.foreach(p => require(f.exists(new Path(root, p)),
      s"cannot roll back to v$version: file $p was rewritten/deleted"))
    val doomed = dataFiles(spark, lakeRoot).map(_._1).filterNot(keep)
    doomed.foreach(p => f.delete(new Path(root, p), false))
    // prune data-free partition dirs left behind. Marker entries
    // (_SUCCESS etc.) don't keep a dir alive — a vacuumed staged
    // generation holding only its write marker must go too — so the
    // delete is recursive (it removes exactly those markers; any real
    // data file would have made `remaining` non-zero).
    def prune(p: Path): Boolean = { // returns true if p ends up data-free and deleted
      if (!f.getFileStatus(p).isDirectory) return false
      val kids = f.listStatus(p)
      val remaining = kids.count { k =>
        if (k.getPath.getName.startsWith("_")) false
        else if (k.isDirectory) !prune(k.getPath)
        else true
      }
      if (remaining == 0 && p != root) { f.delete(p, true); true } else false
    }
    f.listStatus(root).filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .foreach(s => prune(s.getPath))
    doomed.size
  }
}
