package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal copy-on-write table format with a commit log — the transactional
  * read surface the merge_upsert family's "version swap" stands in for
  * (the mechanism a Delta/Iceberg-class table provides):
  *
  *  - every commit writes NEW immutable data files under `data/v<N>/` and
  *    then publishes a manifest `_commits/v<N>.manifest` listing exactly
  *    the files that make up version N (one absolute path per line);
  *  - the manifest is published with write-temp-then-ATOMIC_MOVE, so the
  *    rename IS the commit point: a reader either sees the complete
  *    version or not at all — never a half-written file list;
  *  - readers resolve a version to its frozen file list ONCE
  *    (`readVersion`), so a snapshot-isolated scan is pinned to immutable
  *    files and is untouched by any later commit (VersionedTableSpec
  *    proves a v1 reader across a concurrent v2 MERGE commit);
  *  - `VERSION AS OF` time travel is just `readVersion(root, v)` for any
  *    retained version.
  *
  * Multi-writer safety (r6): the manifest is published with an
  * atomic-exclusive hard link (`Files.createLink` — EEXIST if the version
  * was taken), so publishing IS a compare-and-swap on the version number:
  * a concurrent writer that loses the race gets FileAlreadyExistsException,
  * reloads `latestVersion`, and retries on N+1 — its data files are
  * version-independent (uuid-named directories), so nothing is rewritten
  * on retry (VersionedTableSpec stages a taken version and proves the
  * retry lands after it without touching the winner's manifest). At
  * 100 TB the manifest lists thousands of files but stays KBs-to-MBs of
  * metadata — reading it is driver-side and O(files), never a data scan;
  * data files are immutable so commits and reads never contend on
  * content.
  */
object VersionedTable {

  /** Commit `df` as the next version of the table at `root`; returns the
    * committed version number. Copy-on-write: only writes new files, once
    * — on a lost publish race only the (cheap, metadata-only) publish
    * retries, never the data write. */
  def commit(df: DataFrame, root: String): Int = {
    val dataDir = s"$root/data/${java.util.UUID.randomUUID()}"
    df.write.parquet(dataDir)
    val files = listParquet(dataDir)
    var v = latestVersion(root) + 1
    while (!publish(root, v, files)) v = latestVersion(root) + 1
    v
  }

  /** CAS publish of manifest vN: temp-write, then atomic-exclusive hard
    * link as the commit point. Returns false if version N was taken by a
    * concurrent writer (caller retries with a fresh version). */
  private def publish(root: String, v: Int, files: Seq[String]): Boolean = {
    val commits = Paths.get(s"$root/_commits")
    Files.createDirectories(commits)
    val tmp = commits.resolve(
      s".tmp-v$v-${ProcessHandle.current().pid()}-${Thread.currentThread().getId}")
    Files.write(tmp, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    try {
      Files.createLink(commits.resolve(s"v$v.manifest"), tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Directory listing of the parquet files just written. The stream is
    * closed eagerly (Using) — commit() runs per micro-batch in
    * streamMergeUpsert, and an unclosed Files.list leaks a directory fd
    * until GC on every call. */
  private def listParquet(dir: String): Seq[String] =
    Using.resource(Files.list(Paths.get(dir))) { st =>
      st.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(_.toAbsolutePath.toString)
        .toSeq.sorted
    }

  /** Highest published version, 0 if the table has no commits yet. */
  def latestVersion(root: String): Int = {
    val commits = Paths.get(s"$root/_commits")
    if (!Files.isDirectory(commits)) return 0
    // eager-closed for the same reason as listParquet: commit's CAS retry
    // loop calls this repeatedly under contention
    val vs = Using.resource(Files.list(commits)) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
          s.stripPrefix("v").stripSuffix(".manifest").toInt }
        .toSeq
    }
    if (vs.isEmpty) 0 else vs.max
  }

  /** The frozen file list of version v. */
  def manifest(root: String, v: Int): Seq[String] = {
    val p: Path = Paths.get(s"$root/_commits/v$v.manifest")
    require(Files.exists(p), s"version $v not committed at $root")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Snapshot-isolated `VERSION AS OF v` read: the scan is pinned to the
    * manifest's immutable files — later commits are invisible. */
  def readVersion(s: SparkSession, root: String, v: Int): DataFrame =
    s.read.parquet(manifest(root, v): _*)

  /** Latest-version read (what an unpinned reader sees). */
  def readLatest(s: SparkSession, root: String): DataFrame =
    readVersion(s, root, latestVersion(root))

  /** OPTIMIZE: bin-pack the current version's files into ~targetBytes
    * outputs and commit the rewrite as a NEW version. Row-set identity is
    * the contract (asserted by spec + the sink_compact oracle); older
    * versions keep their manifests and files, so time travel still works
    * across a compaction (retention/VACUUM would prune them by age).
    * Topology: one read of the fragmented files + `coalesce` (no shuffle
    * — partitions are concatenated, never re-keyed) + one write; at
    * 100 TB this runs per-partition-directory with the same plan. */
  def compact(s: SparkSession, root: String, targetBytes: Long): Int = {
    val v = latestVersion(root)
    val files = manifest(root, v)
    val totalBytes = files.map(f => Files.size(Paths.get(f))).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    commit(readVersion(s, root, v).coalesce(n), root)
  }

  /** VACUUM: retain the newest `keepVersions` versions, delete older
    * manifests and every data file referenced ONLY by them (files shared
    * with a retained version — possible in formats that re-manifest
    * unchanged files — survive). Returns the deleted file paths. After a
    * vacuum, time travel to a pruned version fails fast at manifest
    * resolution; the latest read is untouched. Production note: age-based
    * retention (`older than N days`) is the same walk keyed on manifest
    * mtime; the spec exercises the count-based form. */
  def vacuum(root: String, keepVersions: Int): Seq[String] = {
    require(keepVersions >= 1, "must retain at least the latest version")
    val latest = latestVersion(root)
    val cutoff = latest - keepVersions // prune versions <= cutoff
    if (cutoff < 1) return Seq.empty
    val keepFiles = ((cutoff + 1) to latest)
      .flatMap(v => manifest(root, v)).toSet
    val pruned = (1 to cutoff).flatMap { v =>
      val doomed = manifest(root, v).filterNot(keepFiles.contains)
      doomed.foreach(f => Files.deleteIfExists(Paths.get(f)))
      Files.delete(Paths.get(s"$root/_commits/v$v.manifest"))
      doomed
    }
    // emptied data/<uuid> directories hold no files after the prune —
    // drop them too so vacuum leaves no empty-shell dirs behind (r7)
    pruned.map(f => Paths.get(f).getParent).distinct.foreach { d =>
      if (d != null && Files.isDirectory(d) &&
          Using.resource(Files.list(d))(st => !st.iterator().hasNext)) {
        Files.deleteIfExists(d)
      }
    }
    pruned
  }
}
