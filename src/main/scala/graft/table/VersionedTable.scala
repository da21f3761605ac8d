package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

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
  * Single-writer by design (the scheduler's posture in the reference
  * pipeline): multi-writer needs the same manifest-rename as a
  * compare-and-swap — ATOMIC_MOVE fails if v<N> exists, the loser reloads
  * `latestVersion` and retries on N+1. At 100 TB the manifest lists
  * thousands of files but stays KBs-to-MBs of metadata — reading it is
  * driver-side and O(files), never a data scan; data files are immutable
  * so commits and reads never contend on content.
  */
object VersionedTable {

  /** Commit `df` as the next version of the table at `root`; returns the
    * committed version number. Copy-on-write: only writes new files. */
  def commit(df: DataFrame, root: String): Int = {
    val v = latestVersion(root) + 1
    val dataDir = s"$root/data/v$v"
    df.write.parquet(dataDir)
    val files = Files.list(Paths.get(dataDir)).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(_.toAbsolutePath.toString)
      .toSeq.sorted
    publish(root, v, files)
    v
  }

  /** Publish manifest vN via temp-write + atomic rename (the commit point). */
  private def publish(root: String, v: Int, files: Seq[String]): Unit = {
    val commits = Paths.get(s"$root/_commits")
    Files.createDirectories(commits)
    val tmp = commits.resolve(s".tmp-v$v-${Thread.currentThread().getId}")
    Files.write(tmp, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, commits.resolve(s"v$v.manifest"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Highest published version, 0 if the table has no commits yet. */
  def latestVersion(root: String): Int = {
    val commits = Paths.get(s"$root/_commits")
    if (!Files.isDirectory(commits)) return 0
    val vs = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt }
      .toSeq
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
}
