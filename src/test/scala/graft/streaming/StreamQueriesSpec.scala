package graft.streaming

import graft.SparkSpec
import graft.llm.Dedup

/** The streaming ingest dedup must converge to the batch dedup AND must
  * actually have accumulated state across micro-batches (not replayed
  * everything in one). */
class StreamQueriesSpec extends SparkSpec {

  test("stream ingest dedup equals batch dedup across >= 2 micro-batches") {
    val streamed = StreamQueries.streamDedupIngest(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Dedup.dedupExact(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"stream state must converge to the batch dedup (${streamed.size} vs ${batch.size})")

    // the checkpoint's offsets log records one entry per micro-batch; with
    // two staged files and maxFilesPerTrigger=1 there must be at least two.
    // Inspect the run we just made (exposed base), never a guessed dir.
    val offsets = new java.io.File(
      s"${StreamQueries.lastDedupBase}/ckpt/offsets")
      .list().filterNot(_.endsWith(".crc"))
    assert(offsets.length >= 2,
      s"expected >= 2 micro-batches, checkpoint has offsets ${offsets.toSeq}")
  }
}
