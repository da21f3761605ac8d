package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-E invariants: weighted-median recompute, distribution-window
  * bounds, classifier-score recompute, BFS level structure. */
class DataProfileSpec extends SparkSpec {

  test("agg_weighted_median: equals a driver-side recompute per group") {
    val rows = DataProfile.aggWeightedMedian(spark, sfDir).collect()
    assert(rows.length == 3)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("yc"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qw"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val flag = r.getString(0)
      val grp = li.filter(_._1 == flag).sortBy(_._2)
      val tot = grp.map(_._3).sum
      var cum = 0L
      val wmed = grp.find { case (_, _, w) => cum += w; cum * 2 >= tot }.get._2
      assert(r.getLong(1) == wmed, s"$flag: ${r.getLong(1)} != recompute $wmed")
      assert(r.getLong(2) == tot)
    }
  }

  test("window_cume_dist: bounds, monotonicity along each class") {
    val rows = DataProfile.windowCumeDist(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pr, cd) = (r.getDouble(2), r.getDouble(3))
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
      assert(pr <= cd + 1e-12, s"percent_rank $pr must not exceed cume_dist $cd")
    }
  }

  test("curate_classifier_score: engine scores equal a driver md5 recompute") {
    val out = graft.llm.Curation.curateClassifierScore(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.exists(_.getBoolean(3)) && out.exists(!_.getBoolean(3)),
      "threshold must actually split the corpus")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .orderBy(col("doc_id")).limit(3)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.filter(_._2 != null).foreach { case (id, text) =>
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (toks.nonEmpty) {
        val ws = toks.map { t =>
          val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
          java.lang.Long.parseLong(hex.substring(0, 4), 16) % 2001L - 1000L
        }
        val want = ws.sum / toks.length // JVM division truncates like div
        val got = out.find(_.getLong(0) == id).get
        assert(got.getLong(1) == toks.length)
        assert(got.getLong(2) == want, s"doc $id: ${got.getLong(2)} != $want")
      }
    }
  }

  test("window_topn_pergroup: WindowGroupLimit in plan, k-bounded contiguous ranks") {
    val df = DataProfile.windowTopnPergroup(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "rank<=k filter did not lower to WindowGroupLimit")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (ok, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.length) && ranks.length <= 3,
        s"order $ok ranks $ranks")
      val prices = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(prices.sameElements(prices.sortBy(-(_: Double))),
        s"order $ok not price-descending")
    }
  }

  test("join_dpp_prune: dynamic pruning reaches the fact scan, one partition read") {
    val df = DataProfile.queries("join_dpp_prune")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getString(0) == "O")
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      "fact scan has no dynamic-pruning partition filter")
    // runtime proof the pruning FIRED: after execution the fact scan's
    // partition-count metric must be 1 (of the 3 status partitions)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect { case s: FileSourceScanExec => s } ++
        (p.collect { case a: AdaptiveSparkPlanExec => a }
          .flatMap(a => scans(a.executedPlan)))
    val factScan = scans(df.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("fact")))
    factScan.foreach { sc =>
      val parts = sc.metrics.get("numPartitions").map(_.value)
      parts.foreach(n => assert(n == 1, s"fact scan read $n partitions, not 1"))
    }
  }

  test("join_asof_tolerance: bound holds, nulls exist, agrees with untolerated as-of") {
    val tol = Analytics.queries("join_asof_tolerance")(spark, sfDir).collect()
    val iKey = tol.head.fieldIndex("prev_orderkey_tol")
    val iGap = tol.head.fieldIndex("gap_days")
    assert(tol.exists(_.isNullAt(iKey)), "tolerance never voided a match")
    assert(tol.exists(!_.isNullAt(iKey)), "tolerance voided every match")
    tol.filter(!_.isNullAt(iGap)).foreach(r =>
      assert(r.getInt(iGap) >= 1 && r.getInt(iGap) <= 180))
    // wherever the tolerated key is non-null it must equal the plain
    // backward as-of match (tolerance only FILTERS, never re-matches)
    val plain = Analytics.queries("join_asof_prev")(spark, sfDir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    tol.filter(!_.isNullAt(iKey)).foreach(r =>
      assert(plain(r.getLong(0)).contains(r.getLong(iKey))))
  }

  test("join_asof_forward: strictly-later match, last order per user is null (r12)") {
    val fwd = Analytics.queries("join_asof_forward")(spark, sfDir).collect()
    val iNext = fwd.head.fieldIndex("next_orderkey")
    val iGap = fwd.head.fieldIndex("gap_days")
    // every match is strictly later (gap >= 1 — a same-day reference must
    // never match, the forward-vs-backward boundary semantics)
    fwd.filter(!_.isNullAt(iGap)).foreach(r =>
      assert(r.getInt(iGap) >= 1, s"non-positive forward gap: $r"))
    // each user's LAST order day has nothing later — exactly one null per user
    val byUser = fwd.groupBy(_.getLong(1))
    byUser.foreach { case (u, rows) =>
      assert(rows.count(_.isNullAt(iNext)) == 1,
        s"user $u: expected exactly one unmatched (final) order day")
      val last = rows.maxBy(_.getDate(2).toLocalDate.toEpochDay)
      assert(last.isNullAt(iNext), s"user $u: the null is not the final day")
    }
    assert(fwd.exists(!_.isNullAt(iNext)), "no forward match anywhere")
  }

  test("agg_collect_set: rendered sets are sorted and match the count") {
    val rows = DataProfile.aggCollectSet(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getString(1).split(",").toSeq
      assert(parts == parts.sorted && parts.distinct == parts)
      assert(parts.length == r.getLong(2))
    }
  }

  test("sink_dynamic_overwrite: static mode WOULD clobber untouched partitions") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_dynover_spec").toString + "/t"
    val df = Seq((1L, "A"), (2L, "B")).toDF("k", "p")
    df.write.partitionBy("p").parquet(path)
    // static overwrite with only partition A present → B is gone: the
    // failure mode the dynamic key exists to prevent
    df.filter($"p" === "A").write.mode("overwrite")
      .partitionBy("p").parquet(path)
    assert(spark.read.parquet(path).select("p").distinct().count() == 1,
      "static overwrite kept untouched partitions — contrast premise broken")
  }

  test("graph_bfs_distance: seeds at zero, contiguous levels, all reached ring") {
    val rows = GraphOps.queries("graph_bfs_distance")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byNode = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    byNode.filter(_._1 % 7 == 0).values.foreach(d => assert(d == 0))
    assert(byNode.exists(_._2 > 0), "BFS never left the seed set")
    val levels = byNode.values.toSeq.distinct.sorted
    assert(levels == (0 to levels.max), s"levels must be contiguous: $levels")
  }

  test("agg_bitmap_distinct: exact per-day distincts, masks merge by OR across slices (r10)") {
    import org.apache.spark.sql.functions.{col, countDistinct, to_date}
    val out = DataProfile.aggBitmapDistinct(spark, sfDir).collect()
      .map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Long]("n_distinct_users")).toMap
    // the bitmap count must equal exact countDistinct — this mode is EXACT
    val exact = graft.model.Tables.load(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("nd")).collect()
      .map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Long]("nd")).toMap
    assert(out == exact, "bitmap distinct must equal exact countDistinct")
    // mergeability: per-bucket masks of two disjoint event slices OR into
    // the whole-corpus masks (the property HLL only approximates)
    val e = graft.model.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def masks(rows: Array[(Long, Long)]): Map[Long, Long] =
      rows.groupBy(_._2 / 64).map { case (b, us) =>
        b -> us.map(u => 1L << (u._2 % 64)).reduce(_ | _)
      }
    val whole = masks(e)
    val a = masks(e.filter(_._1 % 2 == 0))
    val b = masks(e.filter(_._1 % 2 == 1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) | b.getOrElse(k, 0L))).toMap
    assert(merged == whole, "slice masks must OR-merge to the corpus masks")
  }

  test("agg_gini: bounds + equals a driver-side rank recompute (r10)") {
    import org.apache.spark.sql.functions.{col, expr, sum}
    val r = DataProfile.aggGini(spark, sfDir).collect().head
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0, s"gini $g out of [0, 1)")
    val totals = graft.model.Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("tot"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(x => (x._2, x._1)).map(_._2)
    val n = totals.length.toDouble
    val sx = totals.sum.toDouble
    val ix = totals.zipWithIndex.map { case (x, i0) => (i0 + 1).toDouble * x }.sum
    val want = (2.0 * ix - (n + 1.0) * sx) / (n * sx)
    assert(math.abs(g - want) < 1e-6, s"gini $g vs recompute $want")
    assert(r.getAs[Long]("n_customers") == totals.length)
  }

  test("rank-window trio: no fact-grain window on a low-cardinality partition key (r11)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // The r10 scale flag: a rank/cumulative window whose partition key has
    // 3-5 distinct values sorts a fact-table-sized partition in ONE task at
    // 100x. The de-weaked plans must keep every window input either
    // (a) bucketed — partition spec includes RankedOver's quantile bucket —
    // or (b) grain-collapsed — an Aggregate sits between the window and the
    // scan, so the window sorts value/bucket-grain rows, not fact rows.
    def windowsOf(df: org.apache.spark.sql.DataFrame): Seq[LWindow] =
      df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    def bucketedOrCollapsed(w: LWindow): Boolean =
      w.partitionSpec.exists(_.toString.contains("__bkt")) ||
        w.child.collect { case a: Aggregate => a }.nonEmpty

    val cume = DataProfile.windowCumeDist(spark, sfDir)
    val cumeWs = windowsOf(cume)
    assert(cumeWs.nonEmpty)
    cumeWs.foreach(w => assert(bucketedOrCollapsed(w),
      s"window over raw fact rows on a low-card key:\n$w"))
    // the rank-bearing window must be the bucketed one
    assert(cumeWs.exists(_.partitionSpec.exists(_.toString.contains("__bkt"))))

    val gini = DataProfile.aggGini(spark, sfDir)
    val giniWs = windowsOf(gini)
    assert(giniWs.nonEmpty)
    giniWs.foreach(w => assert(bucketedOrCollapsed(w),
      s"unpartitioned customer-grain window survived:\n$w"))
    assert(giniWs.exists(_.partitionSpec.exists(_.toString.contains("__bkt"))))

    val wmed = DataProfile.aggWeightedMedian(spark, sfDir)
    val wmedWs = windowsOf(wmed)
    assert(wmedWs.nonEmpty)
    // every window input must be the value-grain collapse, never raw lineitem
    wmedWs.foreach { w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        s"weighted-median window runs over raw fact rows:\n$w")
    }

    // agg_median: same value-grain-collapse contract as weighted median
    val med = graft.operators.Analytics.queries("agg_median")(spark, sfDir)
    val medWs = windowsOf(med)
    assert(medWs.nonEmpty)
    medWs.foreach { w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        s"exact-percentile window runs over raw fact rows:\n$w")
    }

    // super-aggregates: the Expand (one input copy per grouping set) must
    // multiply the PRE-COLLAPSED group grain, never the fact scan
    import org.apache.spark.sql.catalyst.plans.logical.Expand
    Seq("agg_rollup", "agg_cube", "agg_grouping_sets").foreach { k =>
      val df = graft.operators.Analytics.queries(k)(spark, sfDir)
      val expands = df.queryExecution.optimizedPlan.collect { case e: Expand => e }
      assert(expands.nonEmpty, s"$k: no Expand — not a super-aggregate plan?")
      expands.foreach { e =>
        assert(e.child.collect { case a: Aggregate => a }.nonEmpty,
          s"$k: Expand multiplies the raw fact scan:\n$e")
      }
    }

    // fn_null_safe_eq: the global lag must be the bucketed two-pass form
    val nse = DataProfile.fnNullSafeEq(spark, sfDir)
    val nseWs = windowsOf(nse)
    assert(nseWs.nonEmpty)
    nseWs.foreach(w => assert(bucketedOrCollapsed(w),
      s"unpartitioned event-grain lag window survived:\n$w"))
    assert(nseWs.exists(_.partitionSpec.exists(_.toString.contains("__bkt"))))

    // corpus rank keys: per-source / per-length-bucket sequences must ride
    // the bucketed two-pass rank, never a low-card single window
    Seq(
      graft.llm.Curation.queries("curate_mix_domains"),
      graft.llm.PipelinePrep.queries("pack_length_buckets")
    ).foreach { q =>
      val ws = windowsOf(q(spark, sfDir))
      assert(ws.nonEmpty)
      ws.foreach(w => assert(bucketedOrCollapsed(w),
        s"corpus-grain window on a low-card key survived:\n$w"))
      assert(ws.exists(_.partitionSpec.exists(_.toString.contains("__bkt"))))
    }
  }

  test("agg_diversity: simpson identities + exact driver recompute (r11)") {
    val out = DataProfile.queries("agg_diversity")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val simpson = r.getDouble(3)
      val gini = r.getDouble(4)
      val eff = r.getDouble(5)
      assert(simpson > 0.0 && simpson <= 1.0, s"simpson out of range: $simpson")
      assert(gini == 1.0 - simpson, "gini-simpson must be the exact complement")
      assert(eff == 1.0 / simpson || math.abs(eff * simpson - 1.0) < 1e-12,
        s"effective sources must invert simpson: $eff * $simpson")
      assert(eff >= 1.0, s"effective source count below 1: $eff")
    }
    // exact recompute for every lang from raw (lang, source) counts —
    // integer numerator/denominator, one division, same as the engine
    val counts = graft.model.Tables.load(spark, sfDir, "documents")
      .groupBy(col("lang"), col("source")).count().collect()
      .groupBy(_.getString(0))
    out.foreach { r =>
      val lang = r.getString(0)
      val ns = counts(lang).map(_.getLong(2))
      val n = ns.sum
      val num = ns.map(c => BigInt(c) * (c - 1)).sum
      val den = BigInt(n) * (n - 1)
      assert(r.getLong(1) == n && r.getLong(2) == ns.length.toLong)
      assert(r.getDouble(3) == num.toDouble / den.toDouble,
        s"$lang: simpson mismatch vs exact recompute")
    }
  }

  test("Benford audit: exact per-mille table, conservation, the uniform fixture flags (r11)") {
    val out = DataProfile.queries("agg_benford_check")(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 9L))
    val total = out.map(_.getLong(1)).sum
    // every order lands in exactly one digit bucket
    val nOrders = graft.model.Tables.load(spark, sfDir, "orders").count()
    assert(total == nOrders)
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) * 1000 / total, "observed_pm identity")
      assert(r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3)), "dev_pm identity")
    }
    // the Benford table itself: floor(log10(1+1/d)*1000)
    out.foreach { r =>
      val d = r.getLong(0).toDouble
      assert(r.getLong(3) == math.floor(math.log10(1.0 + 1.0 / d) * 1000).toLong)
    }
    // the fixture's uniform totals MUST flag: that non-conformance is the
    // audit's purpose, and it proves the key can't silently pass anything
    assert(out.map(_.getLong(4)).max >= 30L,
      "uniform synthetic totals should deviate visibly from Benford")
  }

  test("A/B z-test: exact rational z2 identity, arm conservation (r11)") {
    val r = DataProfile.queries("agg_ab_ztest")(spark, sfDir).collect().head
    val (na, xa, nb, xb, z2, sig) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
    // arms partition the purchaser universe
    val nUsers = graft.model.Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(na + nb == nUsers)
    assert(xa <= na && xb <= nb && xa + xb > 0 && xa + xb < na + nb,
      "conversion must vary (the above-average definition guarantees it)")
    // exact identity: z2_micro = (x1 n2 - x2 n1)^2 N 1e6 / (n1 n2 x (N-x))
    val num = BigInt(xa * nb - xb * na).pow(2) * (na + nb) * 1000000
    val den = BigInt(na) * nb * (xa + xb) * (na + nb - xa - xb)
    assert(BigInt(z2) == num / den, s"z2_micro $z2 != ${num / den}")
    assert(sig == (z2 > 3841459L), "the 95% verdict must follow chi2(1)")
  }

  test("profile_drift: bucket bounds, count conservation, TVD fold (r12)") {
    val out = DataProfile.profileDrift(spark, sfDir).collect()
    val (summary, buckets) = out.partition(_.getLong(0) == -1L)
    assert(summary.length == 1, "exactly one summary row expected")
    assert(buckets.nonEmpty && buckets.forall { r =>
      val b = r.getLong(0); b >= 0 && b < 16
    }, "bucket ids must sit in [0, 16)")
    val s0 = summary.head
    // conservation: summary counts are the bucket sums, and they cover the
    // events table exactly
    assert(s0.getLong(1) == buckets.map(_.getLong(1)).sum &&
      s0.getLong(2) == buckets.map(_.getLong(2)).sum,
      "summary counts != bucket sums")
    val nEvents = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(s0.getLong(1) + s0.getLong(2) == nEvents,
      "baseline + latest-day rows must cover every event")
    // truncating ppm shares: each side sums to 1e6 minus at most one
    // truncation unit per bucket
    Seq(3, 4).foreach { i =>
      val tot = s0.getLong(i)
      assert(tot <= 1000000L && tot > 1000000L - buckets.length,
        s"ppm column $i sums to $tot — shares are not truncating millionths")
    }
    // the headline TVD is the |diff| fold halved, and genuinely positive
    // on the fixture (the latest day is one draw against the whole
    // baseline — sampling drift alone must register)
    assert(s0.getLong(5) == buckets.map(_.getLong(5)).sum / 2,
      "summary TVD != sum(|diff|) div 2")
    assert(s0.getLong(5) > 0, "zero measured drift — the monitor is vacuous")
    // and bounded: TVD in ppm can never exceed 1e6
    assert(s0.getLong(5) <= 1000000L, "TVD above 100%")
  }

  test("pareto deciles: customer partition, monotone concentration, exact closure (r12)") {
    val out = DataProfile.aggParetoDeciles(spark, sfDir).collect()
    assert(out.map(_.getAs[Int]("decile")).toSeq == (1 to 10),
      "exactly deciles 1..10")
    // equal-count cut: decile sizes differ by at most one customer
    val sizes = out.map(_.getAs[Long]("n_customers"))
    assert(sizes.max - sizes.min <= 1, s"uneven cut: ${sizes.toSeq}")
    val nCust = graft.model.Tables.load(spark, sfDir, "orders")
      .select("o_custkey").distinct().count()
    assert(sizes.sum == nCust, "deciles must partition the customer set")
    // descending-revenue ranking: per-decile revenue is non-increasing and
    // the cumulative share is strictly increasing to exactly 100%
    val cents = out.map(_.getAs[Long]("decile_cents"))
    assert(cents.zip(cents.tail).forall { case (a, b) => a >= b },
      s"decile revenue must fall down the ranking: ${cents.toSeq}")
    val shares = out.map(_.getAs[Long]("share_ppm"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a < b })
    assert(shares.last == 1000000L, s"closure: last share ${shares.last}")
    // non-degenerate concentration: the top decile must hold more than a
    // uniform 10% share on this fixture
    assert(shares.head > 100000L, s"top decile share ${shares.head}")
    // cum_cents is the running sum of decile_cents
    val cums = out.map(_.getAs[Long]("cum_cents"))
    assert(cums.toSeq == cents.scanLeft(0L)(_ + _).tail.toSeq)
  }
}
