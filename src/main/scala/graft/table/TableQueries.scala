package graft.table

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.PipelineOps

/** Oracle-checked keys for the versioned-table surface (VersionedTable):
  * time travel across a MERGE commit, and the OPTIMIZE small-file
  * compaction rewrite. Each key stages a table under a per-invocation
  * unique root (pid + counter — concurrent sessions never collide),
  * commits through the manifest log, and reads back THROUGH the log, so
  * the oracle checks the whole commit/read path, not just the transform.
  */
object TableQueries {

  type Q = (SparkSession, String) => DataFrame

  private val runId = new AtomicInteger(0)

  /** All staged roots for THIS JVM live under one pid-scoped namespace, and
    * a shutdown hook removes the whole namespace when the JVM exits (r7):
    * the returned DataFrames are lazy, so a per-key eager delete would pull
    * the files out from under the driver's later materialization — the
    * hook runs after every action has completed. Other pids' namespaces
    * are untouched, so concurrent sessions never delete each other's
    * staged tables. */
  private lazy val tmpNamespace: String = {
    val ns = s"${sys.props("java.io.tmpdir")}/graft_table/" +
      s"p${ProcessHandle.current().pid()}"
    sys.addShutdownHook(graft.sink.Sinks.deleteDir(ns))
    ns
  }

  private def freshRoot(kind: String): String =
    s"$tmpNamespace/$kind-${runId.incrementAndGet()}"

  private def ordersBase(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("total"))

  // ---- table_time_travel ----------------------------------------------------
  // VERSION AS OF across a MERGE: commit the orders snapshot as v1, apply
  // the merge_upsert changeset and commit as v2 (copy-on-write — v1's
  // files are untouched), then read BOTH versions back through the
  // manifest log. v1 must still be the pre-merge table even though v2 is
  // the latest commit — the read surface a user pins a reproducible
  // training run or an audit query to. The oracle restates both relations
  // from the raw table.
  def tableTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("tt")
    VersionedTable.commit(ordersBase(s, dir), root) // v1: the snapshot
    VersionedTable.commit(
      PipelineOps.mergeUpsert(s, dir).drop("last_op"), root) // v2: MERGE
    val v1 = VersionedTable.readVersion(s, root, 1)
      .select(lit("v1").as("version"), col("key"), col("status"), col("total"))
    val v2 = VersionedTable.readVersion(s, root, 2)
      .select(lit("v2").as("version"), col("key"), col("status"), col("total"))
    v1.unionAll(v2).orderBy(col("version"), col("key"))
  }

  private val tableTimeTravelOracle =
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status, o_totalprice AS total
      |  FROM orders),
      |changes AS (
      |  SELECT key, 'D' AS op, CAST(NULL AS VARCHAR) AS new_status,
      |         CAST(NULL AS DOUBLE) AS new_total
      |  FROM base WHERE key % 13 = 0
      |  UNION ALL
      |  SELECT key, 'U', 'X',
      |         CAST(ROUND(CAST(total * 1.1 AS DECIMAL(18,4)), 2) AS DOUBLE)
      |  FROM base WHERE key % 10 = 0 AND key % 13 <> 0
      |  UNION ALL
      |  SELECT -key, 'I', 'N', total
      |  FROM base WHERE key % 97 = 0 AND key > 0),
      |merged AS (
      |  SELECT COALESCE(b.key, c.key) AS key,
      |         CASE WHEN c.op IS NOT NULL THEN c.new_status ELSE b.status END AS status,
      |         CASE WHEN c.op IS NOT NULL THEN c.new_total ELSE b.total END AS total
      |  FROM base b FULL OUTER JOIN changes c ON c.key = b.key
      |  WHERE c.op IS NULL OR c.op <> 'D')
      |SELECT 'v1' AS version, key, status, total FROM base
      |UNION ALL
      |SELECT 'v2' AS version, key, status, total FROM merged
      |ORDER BY version, key""".stripMargin

  // ---- sink_compact ---------------------------------------------------------
  // OPTIMIZE: v1 is the orders snapshot deliberately fragmented into 64
  // small files (what a per-trigger streaming sink leaves behind); compact
  // bin-packs them into ~targetBytes outputs (coalesce — a file-level
  // concatenation, no shuffle) and commits the rewrite as v2. The key
  // reads v2 back through the log; the oracle is the IDENTITY relation —
  // compaction must change the file layout and nothing else.
  def sinkCompact(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("opt")
    VersionedTable.commit(ordersBase(s, dir).repartition(64), root)
    val v2 = VersionedTable.compact(s, root, targetBytes = 8L << 20)
    VersionedTable.readVersion(s, root, v2).orderBy(col("key"))
  }

  private val sinkCompactOracle =
    """SELECT o_orderkey AS key, o_orderstatus AS status, o_totalprice AS total
      |FROM orders ORDER BY key""".stripMargin

  // ---- table_incremental_read -----------------------------------------------
  // Change-data-feed between two commits: the generic version diff — a
  // single full-outer join of the v1 and v2 snapshots on the key, emitting
  // delete rows (in v1 only, preimage values), insert rows (in v2 only),
  // and update pre/post image pairs (both sides, any column differing) —
  // the relation `table_changes(v1, v2)` returns on a CDF-enabled Delta
  // table. With a changeset-carrying commit log the same feed is
  // metadata-only; the snapshot diff is the fallback that works on ANY
  // pair of versions and costs one key-shuffle join of each side (or zero
  // co-bucketed). The oracle re-derives the identical feed from the raw
  // table and the deterministic changeset.
  def tableIncrementalRead(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("cdf")
    VersionedTable.commit(ordersBase(s, dir), root)
    VersionedTable.commit(
      PipelineOps.mergeUpsert(s, dir).drop("last_op"), root)
    // presence markers, not value-null checks — robust to nullable columns
    val v1 = VersionedTable.readVersion(s, root, 1)
      .select(col("key"), col("status").as("s1"), col("total").as("t1"),
        lit(true).as("m1"))
    val v2 = VersionedTable.readVersion(s, root, 2)
      .select(col("key"), col("status").as("s2"), col("total").as("t2"),
        lit(true).as("m2"))
    val diff = v1.join(v2, Seq("key"), "full_outer")
      .withColumn("in1", col("m1").isNotNull)
      .withColumn("in2", col("m2").isNotNull)
    val deletes = diff.filter(col("in1") && !col("in2"))
      .select(col("key"), col("s1").as("status"), col("t1").as("total"),
        lit("delete").as("change"))
    val inserts = diff.filter(!col("in1") && col("in2"))
      .select(col("key"), col("s2").as("status"), col("t2").as("total"),
        lit("insert").as("change"))
    val updated = diff.filter(col("in1") && col("in2") &&
      (col("s1") =!= col("s2") || col("t1") =!= col("t2")))
    val pre = updated.select(col("key"), col("s1").as("status"),
      col("t1").as("total"), lit("update_pre").as("change"))
    val post = updated.select(col("key"), col("s2").as("status"),
      col("t2").as("total"), lit("update_post").as("change"))
    deletes.unionAll(inserts).unionAll(pre).unionAll(post)
      .orderBy(col("key"), col("change"))
  }

  private val tableIncrementalReadOracle =
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status, o_totalprice AS total
      |  FROM orders)
      |SELECT key, status, total, 'delete' AS change
      |FROM base WHERE key % 13 = 0
      |UNION ALL
      |SELECT -key, 'N', total, 'insert'
      |FROM base WHERE key % 97 = 0 AND key > 0
      |UNION ALL
      |SELECT key, status, total, 'update_pre'
      |FROM base WHERE key % 10 = 0 AND key % 13 <> 0
      |UNION ALL
      |SELECT key, 'X',
      |       CAST(ROUND(CAST(total * 1.1 AS DECIMAL(18,4)), 2) AS DOUBLE),
      |       'update_post'
      |FROM base WHERE key % 10 = 0 AND key % 13 <> 0
      |ORDER BY key, change""".stripMargin

  // ---- table_vacuum ---------------------------------------------------------
  // Retention: fragment v1, compact to v2, VACUUM retaining only the
  // newest version — v1's manifest and its (now-unreferenced) data files
  // are deleted, and the LATEST read must be byte-for-byte unaffected
  // (the identity oracle). The spec additionally proves the pruned
  // version is gone from disk and fails fast on time travel.
  def tableVacuum(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("vac")
    VersionedTable.commit(ordersBase(s, dir).repartition(64), root)
    val v2 = VersionedTable.compact(s, root, targetBytes = 8L << 20)
    VersionedTable.vacuum(root, keepVersions = 1)
    VersionedTable.readVersion(s, root, v2).orderBy(col("key"))
  }

  val queries: Map[String, Q] = Map[String, Q](
    "table_time_travel" -> (tableTimeTravel _),
    "sink_compact" -> (sinkCompact _),
    "table_incremental_read" -> (tableIncrementalRead _),
    "table_vacuum" -> (tableVacuum _))

  val oracles: Map[String, String] = Map(
    "table_time_travel" -> tableTimeTravelOracle,
    "sink_compact" -> sinkCompactOracle,
    "table_incremental_read" -> tableIncrementalReadOracle,
    "table_vacuum" -> sinkCompactOracle)
}
