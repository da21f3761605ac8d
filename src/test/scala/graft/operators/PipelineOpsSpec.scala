package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic + plan-shape checks for the r4 pipeline operators. The DuckDB
  * oracle already hash-checks every key end to end; these tests pin the
  * INVARIANTS that make the operators correct-by-construction (session
  * boundaries, interval chaining, bloom algebra, split determinism) and the
  * plan shapes that make them scale (single data shuffle for the window
  * family).
  */
class PipelineOpsSpec extends SparkSpec {

  private val gapUs = 12L * 3600 * 1000000

  test("window_session: sessions partition the event stream exactly") {
    val sessions = PipelineOps.windowSession(spark, sfDir).cache()
    val nEvents = graft.model.Tables.load(spark, sfDir, "events").count()
    // every event lands in exactly one session
    assert(sessions.agg(sum("n_events")).head.getLong(0) == nEvents)
    // sessions are well-formed intervals
    assert(sessions.filter(col("session_start") > col("session_end")).isEmpty)
    // consecutive sessions of one user are separated by MORE than the gap
    // (otherwise they would have been one session)
    val gaps = sessions
      .withColumn("next_start", lead(unix_micros(col("session_start")), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("session_seq")))
      .filter(col("next_start").isNotNull &&
        col("next_start") - unix_micros(col("session_end")) <= gapUs)
    assert(gaps.isEmpty, "adjacent sessions closer than the gap")
    sessions.unpersist()
  }

  test("scd2_intervals: intervals chain, one current row per user") {
    val iv = PipelineOps.scd2Intervals(spark, sfDir).cache()
    // exactly one open-ended (current) interval per user
    val users = iv.select("user_id").distinct().count()
    assert(iv.filter(col("is_current")).count() == users)
    // consecutive intervals never repeat a state (the compression worked)
    // and valid_to chains to the next interval's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from")
    val chained = iv
      .withColumn("next_state", lead(col("state"), 1).over(w))
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
    assert(chained.filter(col("next_state").isNotNull &&
      col("state") === col("next_state")).isEmpty, "uncompressed repeat state")
    assert(chained.filter(col("next_from").isNotNull &&
      col("valid_to") =!= col("next_from")).isEmpty, "valid_to gap in chain")
    iv.unpersist()
  }

  test("window family shuffles once on user_id (plus the output sort)") {
    Seq(PipelineOps.windowSession(spark, sfDir),
      PipelineOps.scd2Intervals(spark, sfDir)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      // 1 data shuffle shared by both windows AND the session aggregate
      // (hash(user_id) clusters every downstream key), + 1 range exchange
      // for the presentation ORDER BY — anything more means a window or
      // aggregate re-shuffled and the single-pass topology is broken
      assert(plan.split("Exchange").length - 1 <= 2, plan)
    }
  }

  test("bloom prefilter actually prunes fact rows (not vacuously pass-all)") {
    import graft.model.Tables.load
    // the equality test below would also pass for a mightContain that
    // returns true for everything — prove the sketch rejects most
    // non-matching custkeys at the configured fpp
    val cust = load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bloom = cust.stat.bloomFilter("c_custkey",
      math.max(cust.count(), 1L), 0.01)
    val mc = graft.expressions.BloomSupport.mightContain(bloom, col("o_custkey"))
    val orders = load(spark, sfDir, "orders")
    val total = orders.count()
    val passed = orders.filter(mc).count()
    val trueMatches = orders.join(cust,
      col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(passed >= trueMatches, "bloom dropped a true match")
    // ~20% of customers are BUILDING; fpp=1% ⇒ passed ≈ matches + 1% of rest
    assert(passed < total * 0.5,
      s"bloom passed $passed of $total — not actually pruning")
  }

  test("bloom prefilter runs inside whole-stage codegen (no UDF stage break)") {
    val df = PipelineOps.joinBloomPrefilter(spark, sfDir)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val plan = df.queryExecution.executedPlan.toString
    // the membership test must be the native might_contain expression...
    assert(plan.contains("might_contain"), plan)
    // ...sitting in a codegen'd Filter (the `*(n)` prefix marks codegen),
    // not a BatchEvalPython/ScalaUDF stage break ahead of the fact scan
    assert("""\*\(\d+\) Filter .*might_contain""".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("UDF("), plan)
  }

  test("join_bloom_prefilter equals the plain join (bloom is sound)") {
    import graft.model.Tables.load
    val plain = load(spark, sfDir, "orders")
      .join(load(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")), 2).cast("double")
          .as("total_price"))
    val pruned = PipelineOps.joinBloomPrefilter(spark, sfDir)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("sample_split_hash is deterministic and partition-invariant") {
    val a = PipelineOps.sampleSplitHash(spark, sfDir)
    // re-derive under a different physical layout — a rand()-style split
    // would diverge here; the hash split must not
    val b = graft.model.Tables.load(spark, sfDir, "documents").repartition(7)
      .select(col("doc_id"),
        when(conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int") < 230, "train").otherwise("holdout").as("split"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // split sizes are in the designed neighborhood (230/256 ≈ 89.8%)
    val frac = a.filter(col("split") === "train").count().toDouble /
      a.count().toDouble
    assert(frac > 0.8 && frac < 0.97, s"train fraction $frac")
  }

  test("pivot/unpivot reshape reconciles with the straight aggregates") {
    import graft.model.Tables.load
    val pivoted = PipelineOps.aggPivot(spark, sfDir)
    assert(pivoted.columns.toSeq == Seq("o_orderpriority", "F", "O", "P"))
    // row-wise sum of the pivot cells == unpivoted group totals
    val cellTotal = pivoted
      .select((coalesce(col("F"), lit(0.0)) + coalesce(col("O"), lit(0.0)) +
        coalesce(col("P"), lit(0.0))).as("t"))
      .agg(round(sum(col("t").cast("decimal(18,4)")), 2)).head.getDecimal(0)
    val straight = load(spark, sfDir, "orders")
      .agg(round(sum(round(col("o_totalprice").cast("decimal(18,4)"), 2)), 2))
      .head.getDecimal(0)
    // cells are per-(priority,status) rounded sums; compare at cell grain:
    // recompute the same rounded-cell total directly
    val cells = load(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(round(sum(col("o_totalprice").cast("decimal(18,4)")), 2).as("c"))
      .agg(round(sum(col("c")), 2)).head.getDecimal(0)
    assert(cellTotal.compareTo(cells) == 0, s"$cellTotal vs $cells ($straight)")
    assert(PipelineOps.aggUnpivot(spark, sfDir).count() == 3)
  }

  test("graph_pagerank: ranks cover every vertex and discriminate") {
    val r = GraphOps.graphPagerank(spark, sfDir).cache()
    val nVerts = graft.model.Tables.load(spark, sfDir, "lineitem")
      .select("l_suppkey").distinct().count()
    // the co-supply graph reaches every supplier on this fixture
    assert(r.count() == nVerts)
    // the damping floor holds
    assert(r.filter(col("rank_micros") < 150000L).isEmpty)
    // ranks must discriminate exactly when degrees do: at sf0.001 the
    // co-supply graph is COMPLETE (every supplier co-occurs with every
    // other, all degrees equal), so uniform ranks are the correct answer —
    // a regular graph with non-uniform ranks, or an irregular one with
    // uniform ranks, is the bug
    val pairs = graft.model.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
    val nDegs = pairs.as("a").join(pairs.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") =!= col("b.sk"))
      .select(col("a.sk").as("src"), col("b.sk").as("dst")).distinct()
      .groupBy("src").count()
      .select("count").distinct().count()
    assert((r.select("rank_micros").distinct().count() > 1) == (nDegs > 1))
    r.unpersist()
  }

  test("join_scd2_asof: every event matches exactly one dimension interval") {
    val ev = graft.model.Tables.load(spark, sfDir, "events")
    val total = ev.count()
    val out = PipelineOps.joinScd2Asof(spark, sfDir).cache()
    // intervals tile each user's timeline: the AS-OF join conserves rows
    assert(out.agg(sum(col("n_events"))).head.getLong(0) == total,
      "AS-OF join dropped or duplicated events — intervals don't tile")
    // states come from the event_type domain and counts are positive
    assert(out.filter(col("n_events") <= 0 || col("n_users") <= 0).isEmpty)
    out.unpersist()
  }

  test("merge_upsert: row accounting and op semantics hold exactly") {
    val base = graft.model.Tables.load(spark, sfDir, "orders")
    val n = base.count()
    val nDel = base.filter(col("o_orderkey") % 13 === 0).count()
    val nUpd = base.filter(col("o_orderkey") % 10 === 0 &&
      col("o_orderkey") % 13 =!= 0).count()
    val nIns = base.filter(col("o_orderkey") % 97 === 0 &&
      col("o_orderkey") > 0).count()
    val m = PipelineOps.mergeUpsert(spark, sfDir).cache()
    // deletes remove, inserts add, updates/keeps preserve cardinality
    assert(m.count() == n - nDel + nIns)
    assert(m.filter(col("last_op") === "U").count() == nUpd)
    assert(m.filter(col("last_op") === "I").count() == nIns)
    assert(m.filter(col("last_op") === "D").isEmpty)
    // every deleted key is gone (base keys are positive; inserts negated);
    // every updated row carries the new status
    assert(m.filter(col("key") % 13 === 0 && col("key") > 0).isEmpty)
    assert(m.filter(col("last_op") === "U" && col("status") =!= "X").isEmpty)
    // keys stay unique after the merge (MERGE must never duplicate)
    assert(m.select("key").distinct().count() == m.count())
    m.unpersist()
  }

  test("join_full_outer_diff: class counts reconcile with the planted mutations (r10)") {
    import org.apache.spark.sql.functions.col
    val out = PipelineOps.joinFullOuterDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("added", "removed", "changed", "unchanged"))
    val keys = graft.model.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val removed = keys.count(_ % 97 == 0)
    val added = keys.count(_ % 101 == 0)
    val changed = keys.count(k => k % 89 == 0 && k % 97 != 0)
    assert(out("removed").getAs[Long]("n") == removed)
    assert(out("added").getAs[Long]("n") == added)
    assert(out("changed").getAs[Long]("n") == changed)
    assert(out("unchanged").getAs[Long]("n") ==
      keys.length - removed - changed)
    // removed rows subtract their full value; added keys are negative
    assert(out("removed").getAs[Long]("delta_cents") < 0)
    assert(out("added").getAs[Long]("max_key") < 0)
    assert(out("unchanged").getAs[Long]("delta_cents") == 0L)
  }

  test("sample_time_split: clean temporal boundary + exact leakage audit (r10)") {
    import org.apache.spark.sql.functions.col
    val out = PipelineOps.sampleTimeSplit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("train", "test"))
    val ev = graft.model.Tables.load(spark, sfDir, "events")
      .select(col("ts"), col("user_id")).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate,
        r.getLong(1)))
    assert(out("train").getAs[Long]("n_events") +
      out("test").getAs[Long]("n_events") == ev.length,
      "splits must conserve the corpus")
    // the boundary is clean: every train day strictly precedes every test day
    val trainLast = out("train").getAs[Date]("last_day").toLocalDate
    val testFirst = out("test").getAs[Date]("first_day").toLocalDate
    assert(trainLast.isBefore(testFirst), s"$trainLast !< $testFirst")
    // leakage = users active on both sides of that boundary
    val cutoff = testFirst
    val trainU = ev.filter(_._1.isBefore(cutoff)).map(_._2).toSet
    val testU = ev.filterNot(_._1.isBefore(cutoff)).map(_._2).toSet
    val leak = (trainU & testU).size
    assert(out("train").getAs[Long]("n_leak_users") == leak)
    assert(out("test").getAs[Long]("n_leak_users") == leak)
  }

  test("join_spatial_grid: equals brute force within radius, stays an equi-join (r10)") {
    import org.apache.spark.sql.functions.col
    val out = PipelineOps.joinSpatialGrid(spark, sfDir)
    // blocking must not degrade to an all-pairs plan
    val plan = out.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"spatial join must block on the cell, not cross:\n$plan")
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same md5-derived coordinates
    def hex4(h: String, off: Int): Long =
      java.lang.Long.parseLong(h.substring(off, off + 4), 16)
    val pts = graft.model.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .map { id =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (id, hex4(h, 0), hex4(h, 4))
      }
    val r2 = 1024L * 1024L
    val want = (for {
      (a, xa, ya) <- pts; (b, xb, yb) <- pts if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= r2
    } yield (a, b, d2)).toSet
    assert(got == want,
      s"grid blocking missed/invented pairs: got ${got.size}, want ${want.size}")
  }

  test("sample_group_holdout: sides partition users exactly, zero leakage, corpus conserved (r11)") {
    val out = PipelineOps.queries("sample_group_holdout")(spark, sfDir).collect()
    assert(out.length == 2, "both sides must be non-empty on the fixture")
    assert(out.forall(_.getLong(4) == 0L), "leak audit must report zero users on both sides")
    val ev = graft.model.Tables.load(spark, sfDir, "events").collect()
    assert(out.map(_.getLong(2)).sum == ev.length, "every event lands on exactly one side")
    // driver recompute of the per-user coin: the engine's side assignment
    // must equal the md5-of-group-key rule for every user
    val md = java.security.MessageDigest.getInstance("MD5")
    def side(u: Long): String = {
      val h = md.digest(u.toString.getBytes("UTF-8"))
      if (((h(0) & 0xff)) < 230) "train" else "holdout"
    }
    val users = ev.map(_.getAs[Long]("user_id")).distinct
    val wantUsers = users.groupBy(side).map { case (k, v) => k -> v.length.toLong }
    out.foreach { r =>
      assert(r.getLong(1) == wantUsers(r.getString(0)),
        s"${r.getString(0)}: user count disagrees with the driver-side coin")
    }
  }

  test("join_interval_overlap: set-equal to brute force, one emission per pair, equi-join plan (r11)") {
    val df = PipelineOps.queries("join_interval_overlap")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // structural: parity split, genuine overlap, bounded overlap length
    rows.foreach { r =>
      assert(r.getAs[Long]("a") % 2 == 0 && r.getAs[Long]("b") % 2 == 1)
      val sa = r.getAs[java.sql.Date]("s_a").toLocalDate
      val ea = r.getAs[java.sql.Date]("e_a").toLocalDate
      val sb = r.getAs[java.sql.Date]("s_b").toLocalDate
      val eb = r.getAs[java.sql.Date]("e_b").toLocalDate
      assert(!sa.isAfter(eb) && !sb.isAfter(ea), "emitted pair must overlap")
      val od = r.getAs[Int]("overlap_days")
      assert(od >= 1 && od <= 4, s"overlap of a 4-day and a 5-day window is 1..4, got $od")
    }
    // the first-shared-bucket credit must emit each pair EXACTLY once
    val pairs = rows.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(pairs.length == pairs.distinct.length, "duplicate pair emissions")
    // exact set equality with an independent driver brute force
    val os = graft.model.Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.sql.Date](2).toLocalDate))
    val byUser = os.groupBy(_._1)
    val want = byUser.values.flatMap { us =>
      val as = us.filter(_._2 % 2 == 0)
      val bs = us.filter(_._2 % 2 == 1)
      as.flatMap { case (_, ka, da) =>
        bs.collect { case (_, kb, dbb)
          if !da.isAfter(dbb.plusDays(4)) && !dbb.isAfter(da.plusDays(3)) =>
          (ka, kb)
        }
      }
    }.toSet
    assert(pairs.toSet == want, "pair set must equal the brute-force overlap join")
    // plan: bucket-and-credit compiles to an EQUI join — never a
    // cartesian/nested-loop over the interval sides
    val phys = df.queryExecution.sparkPlan.toString
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoopJoin"),
      s"interval overlap must stay an equi join:\n$phys")
  }

  test("waterfall allocation: conservation, prefix monotonicity, status consistency (r12)") {
    import org.apache.spark.sql.functions._
    val out = PipelineOps.windowWaterfallAlloc(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byUser = out.groupBy(_.getLong(0))
    byUser.foreach { case (u, rows) =>
      val ordered = rows.sortBy(r =>
        (r.getDate(2).toLocalDate.toEpochDay, r.getLong(1)))
      // conservation: total allocated = min(pool, total invoiced). The pool
      // is not in the output; recover it as Σalloc and check the waterfall
      // SHAPE instead: allocations are a prefix — fully-paid invoices, at
      // most one partial, then only unpaid
      val statuses = ordered.map(_.getString(6))
      val firstNotPaid = statuses.indexWhere(_ != "paid")
      if (firstNotPaid >= 0) {
        assert(statuses.drop(firstNotPaid + 1).forall(_ == "unpaid"),
          s"user $u: allocation is not a prefix: ${statuses.mkString(",")}")
        assert(statuses.count(_ == "partial") <= 1,
          s"user $u: more than one partial invoice")
      }
      ordered.foreach { r =>
        val (amt, alloc, outst) = (r.getLong(3), r.getLong(4), r.getLong(5))
        assert(alloc >= 0 && alloc <= amt, s"user $u: alloc outside [0, amount]")
        assert(outst == amt - alloc, s"user $u: outstanding mismatch")
        assert((r.getString(6) == "paid") == (outst == 0L), s"user $u: paid flag")
        assert((r.getString(6) == "unpaid") == (alloc == 0L && outst > 0),
          s"user $u: unpaid flag")
      }
    }
    // non-vacuity: the fixture must exercise all three statuses somewhere
    val all = out.map(_.getString(6)).toSet
    assert(all == Set("paid", "partial", "unpaid"),
      s"fixture exercises only $all — waterfall degenerate")
  }
}
