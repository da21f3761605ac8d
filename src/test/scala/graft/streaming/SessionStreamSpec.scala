package graft.streaming

import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.model.Tables

/** The custom-state sessionizer must CONVERGE to the batch operator: two
  * time-ordered arrival waves stream through `flatMapGroupsWithState`, and
  * the emitted (append-mode) sessions must be exactly the batch
  * `window_session` rows that the final watermark sealed — proving the
  * state transitions (merge across micro-batches, watermark-driven seal,
  * event-time timeout) implement the same semantics, not a single-batch
  * replay.
  */
class SessionStreamSpec extends SparkSpec {

  test("streamed sessions equal the batch sessions sealed by the watermark") {
    import spark.implicits._
    val base = s"${sys.props("java.io.tmpdir")}/graft_sess_${ProcessHandle.current().pid()}"
    graft.sink.Sinks.deleteDir(base)
    val src = s"$base/src"

    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("value"))
    // two arrival waves split on the time axis (no late data): the second
    // micro-batch must EXTEND and SEAL state built by the first
    ev.filter(col("ts") < "2024-01-16").coalesce(1).write.parquet(src)
    ev.filter(col("ts") >= "2024-01-16").coalesce(1)
      .write.mode("append").parquet(src)

    val streamed = spark.readStream.schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .as[SessionStream.SessionEvent]
    val q = SessionStream.sessionize(spark, streamed)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .format("memory").queryName("sess_conv")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected at least two data micro-batches")
    val wmUs = Instant.parse(
      q.lastProgress.eventTime.get("watermark")).toEpochMilli * 1000
    assert(wmUs > 0, "no watermark reported")

    val got = spark.table("sess_conv")
    val want = SessionStream.sealedBatchSessions(spark, sfDir, wmUs)
    assert(got.count() > 0, "no sessions sealed")
    assert(got.exceptAll(want).isEmpty, "streamed a session batch doesn't have")
    assert(want.exceptAll(got).isEmpty, "batch sealed a session the stream missed")
    // and some sessions must still be OPEN (unemitted) — otherwise the
    // seal rule is vacuous on this fixture
    val total = graft.operators.PipelineOps.windowSession(spark, sfDir).count()
    assert(got.count() < total, "every session sealed — seal rule untested")
  }

  test("sessionizer converges identically on the RocksDB state store") {
    import spark.implicits._
    // the 100 TB state story names RocksDB (SessionStream.scala scale
    // topology) — run the SAME two-wave convergence on the actual store:
    // state survives micro-batch boundaries in RocksDB, timeouts fire, and
    // the sealed set matches the batch prediction exactly
    val base =
      s"${sys.props("java.io.tmpdir")}/graft_sess_rocks_${ProcessHandle.current().pid()}"
    graft.sink.Sinks.deleteDir(base)
    val src = s"$base/src"

    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("value"))
    ev.filter(col("ts") < "2024-01-16").coalesce(1).write.parquet(src)
    ev.filter(col("ts") >= "2024-01-16").coalesce(1)
      .write.mode("append").parquet(src)

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .as[SessionStream.SessionEvent]
      val q = SessionStream.sessionize(spark, streamed)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .format("memory").queryName("sess_rocks")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "expected at least two data micro-batches")
      // prove RocksDB actually served the state: its provider reports
      // rocksdb* custom metrics that the default HDFS-backed store never has
      val metrics = q.recentProgress.flatMap(_.stateOperators)
        .flatMap { so =>
          import scala.jdk.CollectionConverters._
          so.customMetrics.keySet.asScala.toSeq
        }
      assert(metrics.exists(_.startsWith("rocksdb")),
        s"no rocksdb state metrics — provider not in effect: ${metrics.distinct.mkString(",")}")

      val wmUs = Instant.parse(
        q.lastProgress.eventTime.get("watermark")).toEpochMilli * 1000
      val got = spark.table("sess_rocks")
      val want = SessionStream.sealedBatchSessions(spark, sfDir, wmUs)
      assert(got.count() > 0, "no sessions sealed")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "RocksDB-backed sessionizer diverged from the batch prediction")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
