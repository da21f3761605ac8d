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
  private def freshRoot(kind: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_table/" +
      s"$kind-${ProcessHandle.current().pid()}-${runId.incrementAndGet()}"

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
      |  FROM base WHERE key % 97 = 0),
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

  val queries: Map[String, Q] = Map[String, Q](
    "table_time_travel" -> (tableTimeTravel _),
    "sink_compact" -> (sinkCompact _))

  val oracles: Map[String, String] = Map(
    "table_time_travel" -> tableTimeTravelOracle,
    "sink_compact" -> sinkCompactOracle)
}
