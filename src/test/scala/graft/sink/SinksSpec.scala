package graft.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.flatten.Flatten

/** Write-pattern round-trips (SURVEY.md §2.8 incremental semantics). */
class SinksSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_sink_spec/$name"
    Sinks.deleteDir(d)
    d
  }

  test("truncate write replaces previous contents") {
    val path = freshDir("truncate")
    val all = Flatten.personnel(spark)
    Sinks.writeTruncate(all, path)
    Sinks.writeTruncate(all.limit(5), path)
    assert(spark.read.parquet(path).count() == 5)
  }

  test("historical append is at-least-once: a re-run doubles the snapshot " +
    "(the reference's observed 184/1610 double-append)") {
    val path = freshDir("append")
    val all = Flatten.personnel(spark)
    val day = all.filter(col("extraction_date") === "2025-06-25")
    val n = day.count()
    assert(n > 0)
    Sinks.appendHistorical(day, path)
    Sinks.appendHistorical(day, path)  // the cron re-run
    val readBack = spark.read.parquet(path)
    assert(readBack.count() == 2 * n)
    // the duplicates monitor is the compensating control
    val dupKeys = readBack.groupBy(col("cost_id"), col("extraction_date"))
      .count().filter(col("count") > 1).count()
    assert(dupKeys == n)
  }

  test("dynamic partition overwrite makes re-runs exactly-once") {
    val path = freshDir("exactly_once")
    val all = Flatten.personnel(spark)
    Sinks.appendSnapshotExactlyOnce(all, path)
    val n27 = all.filter(col("extraction_date") === "2025-06-27").count()
    // re-run the last day only: replaces its partition, total unchanged
    Sinks.appendSnapshotExactlyOnce(
      all.filter(col("extraction_date") === "2025-06-27"), path)
    val readBack = spark.read.parquet(path)
    assert(readBack.count() == all.count())
    assert(readBack.filter(col("extraction_date") === "2025-06-27").count() == n27)
  }

  test("dual-write: current replaced, historical appended") {
    val cur = freshDir("dual_current")
    val hist = freshDir("dual_hist")
    val all = Flatten.travel(spark)
    val d1 = all.filter(col("extraction_date") === "2025-06-23")
    val d2 = all.filter(col("extraction_date") === "2025-06-24")
    Sinks.dualWrite(d1, cur, hist)
    Sinks.dualWrite(d2, cur, hist)
    assert(spark.read.parquet(cur).count() == d2.count(), "current = latest only")
    assert(spark.read.parquet(hist).count() == d1.count() + d2.count(),
      "historical = all snapshots")
  }

  test("partitioned historical layout prunes to one snapshot directory") {
    val path = freshDir("pruning")
    Sinks.appendHistorical(Flatten.suppliers(spark), path)
    val plan = spark.read.parquet(path)
      .filter(col("extraction_date") === "2025-06-24")
      .queryExecution.executedPlan.toString
    // partition filter present, and only 1 of 4 date partitions selected
    assert(plan.contains("PartitionFilters"))
    val scanned = spark.read.parquet(path)
      .filter(col("extraction_date") === "2025-06-24")
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("extraction_date=2025-06-24")))
  }
}
