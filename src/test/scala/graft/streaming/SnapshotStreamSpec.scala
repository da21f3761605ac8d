package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.flatten.Flatten
import graft.sink.Sinks

/** End-to-end Structured Streaming over the partitioned historical table:
  * write snapshots as batches → stream them with Trigger.AvailableNow →
  * tumbling-day aggregates match the batch computation exactly. */
class SnapshotStreamSpec extends SparkSpec {

  test("streamed tumbling-day aggregates equal the batch aggregates") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_stream_spec"
    Sinks.deleteDir(base)
    val hist = s"$base/hist"

    val all = Flatten.personnel(spark)
    Sinks.appendHistorical(all, hist)

    val schema = spark.read.parquet(hist).schema
    val agg = SnapshotStream.dailyAggregates(
      SnapshotStream.snapshotStream(spark, hist, schema), "amount")

    val alerts = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = SnapshotStream.runAvailableNow(agg, s"$base/ckpt",
      alertMinRows = 10L)(as => as.foreach(alerts.add))
    assert(!q.isActive, "AvailableNow must terminate after draining")

    // batch twin of the same aggregate
    val expect = all
      .groupBy(to_date(col("extraction_timestamp")).as("snapshot_day"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("amount").cast("decimal(18,4)")), 2).cast("double")
          .as("total_value"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
      .toSet

    // runAvailableNow's foreachBatch (update mode) only kept alerts; assert
    // the aggregate itself against a fresh complete-mode run into a memory
    // sink, compared with the batch twin:
    val streamed = SnapshotStream.dailyAggregates(
      SnapshotStream.snapshotStream(spark, hist, schema), "amount")
    // run once more into an in-memory table for direct comparison
    val q2 = streamed.writeStream.outputMode("complete")
      .option("checkpointLocation", s"$base/ckpt2")
      .format("memory").queryName("daily_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val got = spark.table("daily_stream")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == expect, s"stream vs batch mismatch:\n$got\nvs\n$expect")
    assert(alerts.isEmpty, "every fixture snapshot has >= 10 personnel rows")
  }

  test("a snapshot smaller than the alert threshold triggers foreachBatch alerts") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_stream_spec2"
    Sinks.deleteDir(base)
    val hist = s"$base/hist"
    val all = Flatten.personnel(spark)
    Sinks.appendHistorical(all.limit(3), hist)  // one tiny batch

    val schema = spark.read.parquet(hist).schema
    val agg = SnapshotStream.dailyAggregates(
      SnapshotStream.snapshotStream(spark, hist, schema), "amount")
    val alerts = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    SnapshotStream.runAvailableNow(agg, s"$base/ckpt", alertMinRows = 10L)(
      as => as.foreach(alerts.add))
    assert(!alerts.isEmpty, "3-row snapshot must trip the low_rows alert")
    assert(alerts.peek().startsWith("low_rows:"))
  }
}
