package graft.table

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.catalog.GraftCatalog

/** The SQL-catalog claims the oracle hash can't state: a `VERSION AS OF`
  * read through `graft.<db>.<table>` compiles the SAME pruned parquet
  * scan as the `readVersion` API — identical file set, identical rows —
  * and the guards refuse the versions a bare scan would serve wrong. */
class GraftCatalogSpec extends SparkSpec {

  private lazy val wh: String = {
    val p = Files.createTempDirectory("graft_cat_spec").toString
    spark.conf.set("spark.sql.catalog.cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cat.warehouse", p)
    p
  }

  /** Rewrite version v's durable commit instant (the manifest `T`
    * record) — the test analog of a commit published at `millis`. */
  private def setCommitInstant(root: String, v: Int, millis: Long): Unit = {
    val p = Paths.get(s"$root/_commits/v$v.manifest")
    val kept = new String(Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.filterNot(_.startsWith("T\t"))
    Files.write(p, (kept :+ s"T\t$millis").mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** inputFiles returns file: URIs; the manifest stores raw paths. */
  private def norm(f: String): String =
    if (f.startsWith("file:")) new java.net.URI(f).getPath else f

  private def base() = {
    import spark.implicits._
    (1L to 1000L).map(k => (k, s"s${k % 5}", k * 3L)).toDF("key", "status", "cents")
  }

  test("VERSION AS OF resolves through the manifest: same files, same rows as readVersion") {
    val root = s"$wh/db/orders"
    VersionedTable.commit(base().filter(col("key") <= 600).repartition(3), root)
    VersionedTable.commit(base().repartition(5), root)

    for (v <- Seq(1, 2)) {
      val sql = spark.sql(s"SELECT * FROM cat.db.orders VERSION AS OF $v")
      val api = VersionedTable.readVersion(spark, root, v)
      // file-set identity: the SQL scan opens EXACTLY the manifest's
      // frozen files — no second code path, no re-listing, no extras
      assert(sql.inputFiles.map(norm).toSet == VersionedTable.manifest(root, v).toSet,
        s"v$v SQL scan file set diverges from the manifest")
      // bit-identical rows
      assert(sql.orderBy("key").collect().toSeq ==
        api.orderBy("key").collect().toSeq, s"v$v SQL rows differ from API")
    }
    // the two versions genuinely differ (no vacuous pass)
    assert(spark.sql("SELECT * FROM cat.db.orders VERSION AS OF 1").count() == 600)
    assert(spark.sql("SELECT * FROM cat.db.orders VERSION AS OF 2").count() == 1000)
    // bare name serves the latest
    assert(spark.sql("SELECT * FROM cat.db.orders").inputFiles.map(norm).toSet ==
      VersionedTable.manifest(root, 2).toSet)
    // catalyst pushdown reaches the catalog's parquet scan: the filter is
    // pushed, and pruning keeps only the requested column in ReadSchema
    val plan = spark.sql(
      "SELECT status FROM cat.db.orders WHERE key = 7 AND status = 's2'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), s"expected a DSv2 BatchScan:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(key), IsNotNull(status)") ||
      plan.contains("EqualTo(key,7)"), s"filter not pushed to the scan:\n$plan")
  }

  test("out-of-range versions and missing tables fail as NoSuchTable; bad literals loudly") {
    val root = s"$wh/db2/t"
    VersionedTable.commit(base(), root)
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM cat.db2.t VERSION AS OF 9").collect()
    }
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM cat.db2.nope").collect()
    }
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM cat.db2.t VERSION AS OF 'v-latest'").collect()
    }
    assert(e.getMessage.contains("integers"), s"wrong error: ${e.getMessage}")
  }

  test("merge-on-read and renamed versions refuse a bare SQL scan (fail fast, never wrong rows)") {
    import spark.implicits._
    val root = s"$wh/db3/mor"
    VersionedTable.commit(base(), root)
    VersionedTable.commitDeletes(Seq(1L, 2L).toDF("key"), root, "key") // v2: E records
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM cat.db3.mor VERSION AS OF 2").collect()
    }
    assert(e.getMessage.contains("compact first"), s"wrong guard: ${e.getMessage}")
    // v1 (pre-delete) still serves
    assert(spark.sql("SELECT * FROM cat.db3.mor VERSION AS OF 1").count() == 1000)

    val root2 = s"$wh/db3/ren"
    VersionedTable.commit(base(), root2)
    VersionedTable.commitRename(root2, Map("cents" -> "amount")) // v2: R record
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM cat.db3.ren").collect()
    }
    assert(e2.getMessage.contains("rename"), s"wrong guard: ${e2.getMessage}")
  }

  test("TIMESTAMP AS OF resolves to the newest version published at or before the instant") {
    val root = s"$wh/db4/ts"
    VersionedTable.commit(base().filter(col("key") <= 100), root)
    // separate the two manifests' publish clocks via the durable T
    // record — the commit metadata TIMESTAMP AS OF actually resolves from
    setCommitInstant(root, 1, 1700000000000L)
    VersionedTable.commit(base(), root)
    setCommitInstant(root, 2, 1700000100000L)
    // a warehouse copy/restore rewrites mtimes; resolution must not care
    // — set BOTH manifests' mtimes to "now" and expect identical answers
    Seq(1, 2).foreach { v =>
      Files.setLastModifiedTime(Paths.get(s"$root/_commits/v$v.manifest"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    }
    def at(ms: Long) = spark.sql(
      s"SELECT * FROM cat.db4.ts TIMESTAMP AS OF " +
        s"timestamp_millis(${ms}L)").count()
    assert(at(1700000050000L) == 100, "instant between commits must pin v1")
    assert(at(1700000200000L) == 1000, "instant after v2 must pin v2")
    intercept[AnalysisException] { at(1600000000000L) } // before v1
  }

  test("catalog surface: exists/list/drop are manifest-backed; DDL mutation refuses") {
    val root = s"$wh/db5/a"
    VersionedTable.commit(base(), root)
    spark.sql("SHOW TABLES IN cat.db5").collect() // resolves via listTables
    assert(spark.sql("SHOW TABLES IN cat.db5").collect()
      .map(_.getString(1)).toSet == Set("a"))
    intercept[UnsupportedOperationException] {
      spark.sessionState.catalogManager.catalog("cat")
        .asInstanceOf[GraftCatalog]
        .createTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array("db5"), "b"), base().schema, Array.empty,
          java.util.Collections.emptyMap[String, String]())
    }
    assert(spark.sql("DROP TABLE cat.db5.a").collect().isEmpty)
    intercept[AnalysisException] {
      spark.sql("SELECT * FROM cat.db5.a").collect()
    }
  }
}
