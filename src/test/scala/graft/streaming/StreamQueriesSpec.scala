package graft.streaming

import org.apache.spark.sql.functions.col

import graft.{SparkEntry, SparkSpec}
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

  // the 100 TB state story for both dedup keys names RocksDB (corpus-keyed
  // fingerprint state resp. watermark-expiring key state): run the SAME
  // production code path on the actual store and prove it served the state
  // (rocksdb* custom metrics never exist on the default HDFS-backed store)

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def onRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  private def rocksMetrics(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    StreamQueries.lastDedupQuery.recentProgress.toSeq
      .flatMap(_.stateOperators)
      .flatMap(_.customMetrics.keySet.asScala.toSeq)
  }

  test("stream ingest dedup converges identically on RocksDB, metrics prove it") {
    val streamed = onRocksDb {
      StreamQueries.streamDedupIngest(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    val metrics = rocksMetrics()
    assert(metrics.exists(_.startsWith("rocksdb")),
      s"no rocksdb state metrics — provider not in effect: ${metrics.distinct.take(8).mkString(",")}")
    val batch = Dedup.dedupExact(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      "RocksDB-backed ingest dedup diverged from the batch dedup")
  }

  test("incremental agg maintenance: every maintained version equals a recompute (r8)") {
    import org.apache.spark.sql.functions._
    import graft.table.VersionedTable
    val (tableRoot, aggRoot) = StreamQueries.streamIncrementalAggStaged(spark, sfDir)
    val nAgg = VersionedTable.latestVersion(aggRoot)
    assert(nAgg >= 2, s"want backfill + at least one delta commit, got $nAgg")
    def recompute(sourceV: Int) =
      VersionedTable.readVersion(spark, tableRoot, sourceV)
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("total").cast("decimal(28,2)")).as("sum_total"))
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("status"), col("n_orders"),
        col("sum_total").cast("decimal(38,2)"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    // backfill v1 ≡ recompute of source v1; final agg ≡ recompute of the
    // converged source — increment must be indistinguishable from recompute
    assert(snap(VersionedTable.readVersion(spark, aggRoot, 1)) ==
      snap(recompute(1)), "backfill must equal the v1 recompute")
    val sourceLatest = VersionedTable.latestVersion(tableRoot)
    assert(snap(VersionedTable.readVersion(spark, aggRoot, nAgg)) ==
      snap(recompute(sourceLatest)),
      "maintained aggregate diverged from the recompute of the converged source")
    // the feed's group-CHANGING updates actually moved mass: the update
    // target group exists now and some original group shrank
    val before = snap(VersionedTable.readVersion(spark, aggRoot, 1))
      .map(t => t._1 -> t._2).toMap
    val after = snap(VersionedTable.readVersion(spark, aggRoot, nAgg))
      .map(t => t._1 -> t._2).toMap
    assert(after.getOrElse("X", 0L) > 0L, "updates must create the 'X' group")
    assert(before.exists { case (g, n) => after.getOrElse(g, 0L) < n },
      "deletes/updates must shrink some original group")
  }

  test("streaming index ingest: one version per wave, converges to the batch assignment (r8)") {
    import org.apache.spark.sql.functions._
    import graft.table.VersionedTable
    val root = StreamQueries.streamIndexIngestStaged(spark, sfDir)
    val n = VersionedTable.latestVersion(root)
    assert(n == 2, s"two arrival waves must commit two index versions, got $n")
    val v1 = VersionedTable.readVersion(spark, root, 1).count()
    val v2 = VersionedTable.readVersion(spark, root, 2).count()
    assert(v1 > 0 && v1 < v2, s"index must GROW across waves: $v1 -> $v2")
    // ingest order cannot leak into the index: the converged postings
    // equal the batch assignment (dedup_semantic's cell column is the
    // same guarded argmin over the same quantizer)
    val streamed = VersionedTable.readVersion(spark, root, 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"))).toSet
    val batch = graft.llm.Similarity.dedupSemantic(spark, sfDir)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"))).toSet
    assert(streamed == batch, "streamed index diverged from the batch assignment")
  }

  test("watermark drop-dup converges identically on RocksDB, metrics prove it") {
    val streamed = onRocksDb {
      StreamQueries.streamDropDupWatermark(spark, sfDir)
        .select("event_id").collect().map(_.getLong(0)).toSeq
    }
    val metrics = rocksMetrics()
    assert(metrics.exists(_.startsWith("rocksdb")),
      s"no rocksdb state metrics — provider not in effect: ${metrics.distinct.take(8).mkString(",")}")
    // wave 2 is byte-identical to wave 1: output = the distinct base table
    val want = graft.model.Tables.load(spark, sfDir, "events")
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(streamed.sorted == want.sorted,
      s"RocksDB-backed drop-dup diverged (${streamed.size} vs ${want.size})")
  }

  test("sliding windows: every event lands in exactly size/slide windows (r9)") {
    import org.apache.spark.sql.functions._
    val out = StreamQueries.streamSlidingWindow(spark, sfDir).collect()
    val events = graft.model.Tables.load(spark, sfDir, "events")
    // 2-day windows sliding 1 day: each event counted exactly twice
    assert(out.map(_.getAs[Long]("n_events")).sum == 2 * events.count(),
      "an event was assigned to the wrong number of overlapping windows")
    // consecutive windows overlap: starts step by 1 day, each spans 2
    val starts = out.map(_.getAs[java.sql.Date]("win_start").toLocalDate).sorted
    assert(starts.zip(starts.tail).forall { case (a, b) =>
      java.time.temporal.ChronoUnit.DAYS.between(a, b) == 1 })
    assert(out.forall(r => java.time.temporal.ChronoUnit.DAYS.between(
      r.getAs[java.sql.Date]("win_start").toLocalDate,
      r.getAs[java.sql.Date]("win_end").toLocalDate) == 2))
  }

  test("quarantine: conservation, per-batch routing, idempotent batch dirs (r9)") {
    val out = StreamQueries.queries("stream_quarantine")(spark, sfDir).collect()
    val bySide = out.map(r => r.getAs[String]("side") ->
      r.getAs[Long]("n_events")).toMap
    val corpus = graft.model.Tables.load(spark, sfDir, "events").count()
    // nothing dropped on the floor: the two sides partition the corpus
    assert(bySide("ok") + bySide("quarantine") == corpus,
      s"rows lost in routing: $bySide vs corpus $corpus")
    assert(bySide("quarantine") > 0 && bySide("ok") > bySide("quarantine"))
    // both waves routed both sides: batchId-keyed dirs b0 and b1 exist
    // under each sink (the overwrite-by-batchId idempotence layout)
    val base = StreamQueries.lastQuarantineBase
    for (side <- Seq("ok", "quarantine"); b <- Seq("b0", "b1"))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/$side/$b")),
        s"missing $side/$b — a micro-batch skipped a sink")
  }

  test("stream_session_native: disjoint gap-ruled sessions, corpus conserved (r9)") {
    val out = StreamQueries.streamSessionNative(spark, sfDir).collect()
    assert(out.nonEmpty)
    val corpus = graft.model.Tables.load(spark, sfDir, "events").count()
    assert(out.map(_.getLong(3)).sum == corpus, "events lost in sessionization")
    assert(out.exists(_.getLong(3) > 1), "no session ever merged two events")
    out.groupBy(_.getLong(0)).foreach { case (u, ss) =>
      val ordered = ss.sortBy(_.getTimestamp(1).getTime)
      ordered.foreach { r =>
        assert(r.getTimestamp(2).getTime - r.getTimestamp(1).getTime >=
          2L * 3600 * 1000, "end must be at least start + gap")
      }
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(2).getTime <= b.getTimestamp(1).getTime,
            s"user $u sessions overlap: ${a.getTimestamp(2)} > ${b.getTimestamp(1)}")
        case _ => ()
      }
    }
  }

  test("stream_semi_join: existence semantics — once each, no pair blowup (r9)") {
    val out = StreamQueries.streamSemiJoin(spark, sfDir).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(1))
    assert(ids.distinct.length == ids.length,
      "semi join emitted an impression more than once")
    // exactly the matched-left ids of the inner interval join
    val innerLeft = StreamQueries.streamStreamJoin(spark, sfDir)
      .select(col("a_id")).collect().map(_.getLong(0)).toSet
    assert(ids.toSet == innerLeft,
      "semi-join id set diverges from the inner join's distinct left side")
  }

  test("stream_full_outer_join: both sides' unmatched flush, both conserved (r9)") {
    val out = StreamQueries.streamFullOuterJoin(spark, sfDir).collect()
    assert(out.nonEmpty)
    val iA = out.head.fieldIndex("a_id")
    val iB = out.head.fieldIndex("b_id")
    val leftOnly = out.count(r => !r.isNullAt(iA) && r.isNullAt(iB))
    val rightOnly = out.count(r => r.isNullAt(iA) && !r.isNullAt(iB))
    assert(leftOnly > 0, "no unconverted impressions surfaced")
    assert(rightOnly > 0, "no orphan conversions surfaced")
    // conservation on BOTH sides: every even and every odd event appears
    val ev = graft.model.Tables.load(spark, sfDir, "events")
    val evens = ev.filter(col("event_id") % 2 === 0).count()
    val odds = ev.filter(col("event_id") % 2 === 1).count()
    val aIds = out.filter(!_.isNullAt(iA)).map(_.getLong(iA)).distinct.length
    val bIds = out.filter(!_.isNullAt(iB)).map(_.getLong(iB)).distinct.length
    assert(aIds == evens, s"left side not conserved: $aIds vs $evens")
    assert(bIds == odds, s"right side not conserved: $bIds vs $odds")
  }

  test("stream_outer_join: unmatched lefts flush null-padded, once each (r9)") {
    val out = StreamQueries.streamOuterJoin(spark, sfDir).collect()
    assert(out.nonEmpty)
    val iB = out.head.fieldIndex("b_id")
    val (unmatched, matched) = out.partition(_.isNullAt(iB))
    // the outer semantics actually fired: the watermark-driven eviction
    // emitted impressions with no conversion inside their window
    assert(unmatched.nonEmpty, "no null-padded rows — eviction never flushed")
    assert(matched.nonEmpty, "no matched pairs at all")
    // every unmatched left appears exactly once, and never ALSO matched
    val unmatchedIds = unmatched.map(_.getLong(out.head.fieldIndex("a_id")))
    assert(unmatchedIds.distinct.length == unmatchedIds.length,
      "an unmatched left row was emitted twice")
    val matchedIds = matched.map(_.getLong(out.head.fieldIndex("a_id"))).toSet
    assert(!unmatchedIds.exists(matchedIds), "a left row is both matched and null-padded")
    // sentinel rows never leak
    assert(out.forall(_.getLong(out.head.fieldIndex("a_id")) >= 0))
    // conservation: every even event surfaces at least once
    val evens = graft.model.Tables.load(spark, sfDir, "events")
      .filter(col("event_id") % 2 === 0).count()
    assert((unmatchedIds.length + matchedIds.size) == evens,
      "left side not conserved through the outer join")
  }

  test("stream_wap_ingest: red audit quarantines the batch, green publishes, readers never regress (r11)") {
    val out = StreamQueries.queries("stream_wap_ingest")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // the clean batch audits green and fast-forwards main to v2
    assert(out(("batch_0", "n_violations")) == 0L)
    assert(out(("batch_0", "main_version")) == 2L)
    // the poisoned batch audits red and main DOES NOT move — the bad rows
    // lived only on the abandoned staging branch
    assert(out(("batch_1", "n_violations")) > 0L)
    assert(out(("batch_1", "main_version")) == 2L)
    // the published table = base plus exactly the clean batch
    val orders = graft.model.Tables.load(spark, sfDir, "orders")
    val nBase = orders.count()
    val nGood = orders
      .filter(col("o_orderkey") % 97 === 0 && col("o_orderkey") > 0).count()
    assert(out(("final", "n_rows")) == nBase + nGood)
    assert(out(("final", "n_new_rows")) == nGood)
    // violation count equals the poisoned slice exactly (all its totals
    // were flipped negative; no duplicate keys anywhere)
    val nBad = orders
      .filter(col("o_orderkey") % 89 === 0 && col("o_orderkey") > 0).count()
    assert(out(("batch_1", "n_violations")) == nBad)
  }

  test("stream_late_metrics: planted late rows rejected and counted, admitted rows exact (r11)") {
    val rows = StreamQueries.queries("stream_late_metrics")(spark, sfDir)
      .collect()
    // admitted stream == original events, at day grain (oracle semantics)
    val want = graft.model.Tables.load(spark, sfDir, "events")
      .groupBy(org.apache.spark.sql.functions.to_date(col("ts")).as("day"))
      .count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(rows.length == want.size)
    rows.foreach(r => assert(r.getLong(1) == want(r.getDate(0).toString),
      s"admitted count diverged on ${r.get(0)}"))
    // the mechanism: every planted late copy was rejected AT ADMISSION and
    // the rejection is visible in the stream's own metrics — the
    // observability contract this key exists for
    assert(StreamQueries.lastLatePlanted > 0, "fixture planted nothing")
    val progress = StreamQueries.lastLateQuery.recentProgress
    val dropped = progress.flatMap(_.stateOperators)
      .map(_.numRowsDroppedByWatermark).sum
    assert(dropped == StreamQueries.lastLatePlanted,
      s"dropped $dropped != planted ${StreamQueries.lastLatePlanted}")
    // three data batches: establish -> arm (the one-batch watermark lag,
    // measured in this repo) -> reject
    assert(progress.count(_.numInputRows > 0) == 3,
      "expected exactly three data micro-batches")
  }

  test("stream_backfill_catchup: rate-limited drain in >=4 bounded batches, exactly-once totals (r11)") {
    import org.apache.spark.sql.functions.{count, lit, round, sum}
    val rows = StreamQueries.queries("stream_backfill_catchup")(spark, sfDir)
      .collect()
    // the accumulated state equals the one-shot batch aggregate
    val events = graft.model.Tables.load(spark, sfDir, "events")
    val want = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")), 2).cast("double")
          .as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (n, t) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getDouble(2) == t,
        s"catchup total diverged for ${r.getString(0)}")
    }
    // the mechanism: the 8-file backlog drained under maxFilesPerTrigger=2
    // — at least 4 data batches, and NO batch saw the whole backlog
    val total = events.count()
    val progress = StreamQueries.lastBackfillQuery.recentProgress
      .filter(_.numInputRows > 0)
    assert(progress.length >= 4,
      s"expected >= 4 bounded micro-batches, saw ${progress.length}")
    progress.foreach(p => assert(p.numInputRows < total,
      "a single batch swallowed the whole backlog — rate limit ignored"))
    assert(progress.map(_.numInputRows).sum == total,
      "drain must cover the backlog exactly once")
  }

  test("micro-batch meter: per-key batch counts are non-zero and deterministic (r13)") {
    // the bench records each streaming key's executed micro-batch count in
    // BENCH_LOCAL.json (the plan_fp move for streams); that is only a
    // drift attributor if the count is a pure function of the key + fixture
    // — two runs of the same key must report the identical count
    def countOf(key: String): Long = {
      StreamQueries.drainBatchCount()
      SparkEntry.queries(key)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      StreamQueries.drainBatchCount()
    }
    for (key <- Seq("stream_micro_batch", "stream_sliding_window",
        "stream_incremental_agg")) {
      val first = countOf(key)
      val second = countOf(key)
      assert(first > 0, s"$key executed no counted micro-batches")
      assert(first == second,
        s"$key batch count not deterministic: $first vs $second")
    }
  }
}
