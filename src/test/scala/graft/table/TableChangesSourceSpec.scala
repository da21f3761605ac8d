package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming-CDF claims the oracle hash can't state: offsets are
  * version numbers, a commit arriving MID-STREAM lands as its own
  * micro-batch with exactly its changeset's rows, and commits that
  * recorded no changes contribute nothing. */
class TableChangesSourceSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_cdf_spec").toString

  private def base() = {
    import spark.implicits._
    (1L to 100L).map(k => (k, s"s${k % 5}", k * 1.5))
      .toDF("key", "status", "total")
  }

  private def feed(tag: String, keys: Range) = {
    import spark.implicits._
    keys.map(k => (k.toLong, tag, k * 1.0, "insert"))
      .toDF("key", "status", "total", "change")
  }

  test("a commit mid-stream produces its own micro-batch with exactly its changeset (r8)") {
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("graft_cdf_ckpt").toString
    VersionedTable.commit(base(), root) // v1: no CDF — contributes nothing
    VersionedTable.commit(base(), root,
      changes = Some(feed("a", 1 to 40)), statsColumns = Nil) // v2
    val table = "cdf_midstream"
    val q = spark.readStream.format("graft-cdf").option("root", root).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(table)
      .start() // default processing-time trigger: the stream stays LIVE
    try {
      q.processAllAvailable()
      assert(spark.table(table).count() == 40, "first batch must be v2's feed")
      val off1 = q.lastProgress.sources(0).endOffset
      assert(off1.trim == "2", s"offset should be version 2, got $off1")
      // v3 commits while the query is running — THE mid-stream case
      VersionedTable.commit(base(), root,
        changes = Some(feed("b", 101 to 130)), statsColumns = Nil)
      q.processAllAvailable()
      val all = spark.table(table)
      assert(all.count() == 70, "second batch must append v3's 30 rows")
      assert(all.filter(col("status") === "b").count() == 30)
      assert(q.lastProgress.sources(0).endOffset.trim == "3")
      // the v3 rows arrived in a SEPARATE micro-batch (not a re-read):
      // some progress after the first shows exactly 30 input rows
      assert(q.recentProgress.exists(p =>
        p.numInputRows == 30 && p.sources(0).endOffset.trim == "3"),
        s"v3 should land as its own 30-row micro-batch: " +
          q.recentProgress.map(p => (p.numInputRows, p.sources(0).endOffset))
            .mkString(","))
    } finally q.stop()
    // the batch read of the same source equals the streamed union
    val batch = spark.read.format("graft-cdf").option("root", root).load()
    assert(batch.count() == 70)
    // startVersion skips already-consumed history
    val tail = spark.read.format("graft-cdf").option("root", root)
      .option("startVersion", "2").load()
    assert(tail.count() == 30)
    assert(tail.filter(col("status") =!= "b").count() == 0)
  }

  test("checkpointed restart resumes from the last committed version, not the log start (r8)") {
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("graft_cdf_ckpt2").toString
    val out = Files.createTempDirectory("graft_cdf_out").toString
    VersionedTable.commit(base(), root,
      changes = Some(feed("a", 1 to 25)), statsColumns = Nil) // v1
    // file sink (the memory sink cannot recover a checkpoint): both runs
    // append to one output dir, so a replay would show up as extra rows
    def drain(): Unit = {
      val q = spark.readStream.format("graft-cdf").option("root", root).load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() == 25)
    VersionedTable.commit(base(), root,
      changes = Some(feed("b", 26 to 35)), statsColumns = Nil) // v2
    drain()
    // the restarted query appended ONLY v2's rows — version offsets
    // persisted in the checkpoint; a log-start replay would yield 60
    val all = spark.read.parquet(out)
    assert(all.count() == 35,
      s"restart must resume after v1, got ${all.count()} rows")
    assert(all.filter(col("status") === "a").count() == 25)
    assert(all.filter(col("status") === "b").count() == 10)
  }
}
