package graft.table

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The transactional claims the oracle hash can't state: a reader pinned
  * to v1 is unaffected by a concurrent MERGE commit, the manifest rename
  * is the commit point, and compaction changes layout but not content. */
class VersionedTableSpec extends SparkSpec {

  private def freshRoot(): String = {
    val p = Files.createTempDirectory("graft_vt_spec")
    p.toString
  }

  private def base() = {
    import spark.implicits._
    (1L to 1000L).map(k => (k, s"s${k % 5}", k * 1.5)).toDF("key", "status", "total")
  }

  test("a v1-pinned reader is snapshot-isolated across a concurrent commit") {
    val root = freshRoot()
    assert(VersionedTable.commit(base(), root) == 1)
    // pin the reader BEFORE the second commit (the plan resolves v1's
    // frozen file list now)
    val pinned = VersionedTable.readVersion(spark, root, 1)
    val before = pinned.agg(count(lit(1)), sum(col("total"))).collect()(0)
    // concurrent writer: MERGE-style rewrite committed as v2
    val merged = base().filter(col("key") % 2 === 0)
      .withColumn("total", col("total") * 2)
    assert(VersionedTable.commit(merged, root) == 2)
    // the pinned reader re-executes and still sees exactly v1
    val after = pinned.agg(count(lit(1)), sum(col("total"))).collect()(0)
    assert(before == after, "v1 reader changed under a concurrent v2 commit")
    assert(pinned.count() == 1000)
    // a FRESH time-travel read of v1 also matches, while latest is v2
    assert(VersionedTable.readVersion(spark, root, 1).count() == 1000)
    assert(VersionedTable.latestVersion(root) == 2)
    assert(VersionedTable.readLatest(spark, root).count() == 500)
  }

  test("manifest lists only complete committed files; versions are immutable") {
    val root = freshRoot()
    VersionedTable.commit(base().repartition(4), root)
    val m1 = VersionedTable.manifest(root, 1)
    assert(m1.size == 4)
    assert(m1.forall(f => Files.exists(Paths.get(f))), "manifest points at missing files")
    VersionedTable.commit(base(), root)
    // v1's manifest is byte-identical after the v2 commit
    assert(VersionedTable.manifest(root, 1) == m1)
  }

  test("compact reduces file count, preserves the exact row set, keeps history") {
    val root = freshRoot()
    VersionedTable.commit(base().repartition(32), root)
    assert(VersionedTable.manifest(root, 1).size == 32)
    val v2 = VersionedTable.compact(spark, root, targetBytes = 64L << 20)
    assert(v2 == 2)
    val filesAfter = VersionedTable.manifest(root, 2).size
    assert(filesAfter < 32, s"compaction did not reduce files: $filesAfter")
    // row-set identity: md5 over every row, order-independent set compare
    def rowHashes(v: Int): Set[String] =
      VersionedTable.readVersion(spark, root, v)
        .select(md5(concat_ws("",
          col("key"), col("status"), col("total"))).as("h"))
        .collect().map(_.getString(0)).toSet
    assert(rowHashes(1) == rowHashes(2), "compaction changed the row set")
    // time travel still resolves the pre-compaction layout
    assert(VersionedTable.manifest(root, 1).size == 32)
    assert(VersionedTable.readVersion(spark, root, 1).count() == 1000)
  }

  test("a lost publish race retries past the winner without touching it") {
    val root = freshRoot()
    VersionedTable.commit(base(), root)
    // simulate a concurrent writer winning version 2: plant its manifest
    // before our commit computes the next version
    val commits = Paths.get(s"$root/_commits")
    val winner = commits.resolve("v2.manifest")
    Files.write(winner, "winner-placeholder".getBytes("UTF-8"))
    val winnerBytes = Files.readAllBytes(winner).toSeq
    // our commit must CAS-fail on v2 and land on v3
    val v = VersionedTable.commit(base().filter(col("key") <= 10), root)
    assert(v == 3, s"loser must retry past the taken version, landed on $v")
    assert(Files.readAllBytes(winner).toSeq == winnerBytes,
      "the winner's manifest was overwritten — publish is not a CAS")
    assert(VersionedTable.readVersion(spark, root, 3).count() == 10)
  }

  test("vacuum prunes old versions' files; latest read unaffected") {
    val root = freshRoot()
    VersionedTable.commit(base().repartition(16), root)
    val v1Files = VersionedTable.manifest(root, 1)
    VersionedTable.compact(spark, root, targetBytes = 64L << 20)
    val deleted = VersionedTable.vacuum(root, keepVersions = 1)
    // v1's files are really gone from disk, and its manifest with them
    assert(deleted.toSet == v1Files.toSet)
    assert(v1Files.forall(f => !Files.exists(Paths.get(f))))
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, root, 1)
    }
    // the retained latest is intact
    assert(VersionedTable.latestVersion(root) == 2)
    assert(VersionedTable.readLatest(spark, root).count() == 1000)
  }
}
