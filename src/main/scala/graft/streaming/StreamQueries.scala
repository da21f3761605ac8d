package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.Tables
import graft.sink.Sinks

/** Oracle-checked key that runs REAL Structured Streaming (SURVEY.md §2.8):
  * the events table is staged as a file source, streamed with
  * Trigger.AvailableNow through a 1-day tumbling-window aggregate with a
  * watermark, and the streamed result must hash-match the DuckDB batch
  * aggregation of the same rows — exactly-once micro-batch execution
  * producing the batch answer.
  */
object StreamQueries {

  type Q = (SparkSession, String) => DataFrame

  private val runId = new AtomicInteger(0)

  def streamMicroBatch(s: SparkSession, dir: String): DataFrame = {
    val id = runId.incrementAndGet()
    val base = s"${sys.props("java.io.tmpdir")}/graft_stream_q/$id"
    Sinks.deleteDir(base)
    val src = s"$base/src"
    val events = Tables.load(s, dir, "events")
      .select(col("event_id"), col("ts"), col("value"))
    events.write.parquet(src)

    val streamed = s.readStream.schema(s.read.parquet(src).schema).parquet(src)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,4)")), 2).cast("double")
          .as("total_value"))
      .select(to_date(col("w.start")).as("day"),
        col("n_events"), col("total_value"))

    val table = s"stream_micro_batch_$id"
    val q = streamed.writeStream.outputMode("complete")
      .option("checkpointLocation", s"$base/ckpt")
      .format("memory").queryName(table)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(table).orderBy(col("day"))
  }

  private val streamMicroBatchOracle =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n_events,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  val queries: Map[String, Q] = Map[String, Q](
    "stream_micro_batch" -> (streamMicroBatch _))

  val oracles: Map[String, String] = Map(
    "stream_micro_batch" -> streamMicroBatchOracle)
}
