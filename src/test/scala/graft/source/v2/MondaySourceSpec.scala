package graft.source.v2

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.flatten.Flatten

/** DSv2 connector behaviors: per-page partitions, limit pushdown, column
  * pruning, and agreement with the driver-side pagination client. */
class MondaySourceSpec extends SparkSpec {

  private def root = Flatten.fixtureRoot
  private val pageOpts =
    s"$root/projects/2025-06-27_p1.json,$root/projects/2025-06-27_p2.json"

  private def read = spark.read.format("monday").option("pages", pageOpts).load()

  test("reads all items across pages, one input partition per page") {
    val df = read
    assert(df.rdd.getNumPartitions == 2, "one InputPartition per page")
    val viaClient = graft.source.SourceQueries.srcPagination(spark, sfDir).count()
    assert(df.count() == viaClient,
      "DSv2 scan and driver-side pagination client must agree")
  }

  test("column pruning reaches the scan") {
    val df = read.select("item_id")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadColumns=[item_id]"), scan)
  }

  test("limit pushdown reaches the scan and caps partition output") {
    val df = read.limit(3)
    val desc = df.queryExecution.optimizedPlan.toString
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanDesc.contains("PushedLimit=3"), s"$desc\n$scanDesc")
    assert(df.count() == 3)
  }

  test("fields parse correctly including column_values arity") {
    val r = read.filter(col("item_id") === "903").head()
    assert(r.getAs[String]("item_name") == "Edge subitems")
    assert(r.getAs[Int]("n_column_values") == 1)
    assert(r.getAs[String]("board_id") == "8113598675")
  }
}
