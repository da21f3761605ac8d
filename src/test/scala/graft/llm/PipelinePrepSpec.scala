package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic + plan-shape checks for the training-set preparation operators.
  * The DuckDB oracle hash-checks each key end to end; these pin the
  * invariants that make the operators right-by-construction (benchmark
  * exclusion, packing monotonicity, whole-kept smallest stratum, int8 range)
  * and the plan shapes that make them scale (broadcast benchmark/threshold
  * joins, one shard shuffle for packing).
  */
class PipelinePrepSpec extends SparkSpec {

  test("curate_decontaminate: benchmark slice excluded, overlaps flag dups") {
    val d = PipelinePrep.curateDecontaminate(spark, sfDir).cache()
    // the benchmark docs themselves never appear as candidates
    assert(d.filter(col("doc_id") % 37 === 0).isEmpty)
    // the fixture corpus has near-dups crossing the benchmark boundary
    val flagged = d.filter(col("contaminated")).count()
    assert(flagged > 0, "no contaminated docs found — threshold drifted")
    // flag is exactly the threshold predicate
    assert(d.filter(col("contaminated") =!= (col("n_overlap") >= 5)).isEmpty)
    d.unpersist()
  }

  test("curate_decontaminate: benchmark set joins as a broadcast (corpus never shuffled)") {
    val plan = PipelinePrep.curateDecontaminate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only wide exchanges are the doc_id agg + presentation sort; the
    // corpus-side shingle explode must NOT shuffle to meet the benchmark
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("pack_sequences: packing is monotone and budget-aligned per shard") {
    val p = PipelinePrep.packSequences(spark, sfDir).cache()
    val n = graft.model.Tables.load(spark, sfDir, "documents").count()
    assert(p.count() == n) // every document is assigned
    assert(p.filter(col("tok_offset") < 0 || col("tok_offset") >= 512).isEmpty)
    // within a shard, (seq_id, tok_offset) is nondecreasing in doc_id order
    // and reconstructs the exclusive running sum exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    val bad = p
      .withColumn("start_off", col("seq_id") * 512 + col("tok_offset"))
      .withColumn("expect", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .filter(col("start_off") =!= col("expect"))
    assert(bad.isEmpty, "packing offsets diverge from the running sum")
    // first doc of each shard starts at sequence 0, offset 0
    val firsts = p.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(firsts.filter(col("seq_id") =!= 0 || col("tok_offset") =!= 0).isEmpty)
    p.unpersist()
  }

  test("sample_stratified: smallest stratum kept whole, rates monotone in size") {
    val t = PipelinePrep.sampleStratified(spark, sfDir).cache()
    assert(t.filter(col("n_sampled") > col("n_docs")).isEmpty)
    // the smallest group's threshold is 65536 — above every 16-bit bucket,
    // so it is kept in full (the alpha=0.5 temperature anchors there)
    val row = t.orderBy(col("n_docs")).head()
    assert(row.getAs[Long]("thr") == 65536L)
    assert(row.getAs[Long]("n_sampled") == row.getAs[Long]("n_docs"))
    // bigger strata never get a higher threshold
    val cmp = t.as("x").crossJoin(t.as("y"))
      .filter(col("x.n_docs") > col("y.n_docs") && col("x.thr") > col("y.thr"))
    assert(cmp.isEmpty, "sampling threshold not monotone in stratum size")
    t.unpersist()
  }

  test("embed_quantize: codes stay in int8 range, scale is positive") {
    val q = PipelinePrep.embedQuantize(spark, sfDir).cache()
    assert(q.count() > 0)
    assert(q.filter(col("q_min") < -127 || col("q_max") > 127).isEmpty)
    assert(q.filter(col("qscale") <= 0).isEmpty)
    // at least one code saturates per vector: max |q| is 127 exactly when
    // the max-|x| element quantizes to +/-127 (floor keeps -127 for the
    // negative extreme, 127 for the positive one)
    assert(q.filter(greatest(abs(col("q_min")), abs(col("q_max"))) === 127)
      .count() == q.count())
    q.unpersist()
  }

  test("text_chunk: windows tile every document end to end") {
    val toksE = "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), expr(s"size($toksE)").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val chunks = PipelinePrep.textChunk(spark, sfDir).cache()
    // chunk count per doc is exactly floor((n-1)/48)+1
    val counts = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"), max("chunk_seq").as("max_seq"),
      max(col("chunk_seq") * 48 + col("n_chunk_tokens")).as("covered"))
    val joined = counts.join(docs, "doc_id")
    assert(joined.filter(
      col("n_chunks") =!= expr("(n_tokens - 1) div 48 + 1")).isEmpty)
    // the last chunk ends exactly at the document's last token
    assert(joined.filter(col("covered") =!= col("n_tokens")).isEmpty)
    // every doc with tokens is chunked
    assert(counts.count() == docs.count())
    chunks.unpersist()
  }

  test("sketch_cms_topk: the count-min guarantee holds (estimate >= truth)") {
    val t = PipelinePrep.sketchCmsTopk(spark, sfDir).cache()
    assert(t.count() == 10)
    // CMS never underestimates — collisions only ADD; a single estimate
    // below the true count means the sketch rows/cells are misaligned
    assert(t.filter(col("cms_estimate") < col("true_count")).isEmpty)
    t.unpersist()
  }

  test("sketch_hll_distinct: the estimate lands inside the m=64 error band") {
    val r = PipelinePrep.sketchHllDistinct(spark, sfDir).head()
    val truth = r.getAs[Long]("true_distinct").toDouble
    val est = r.getAs[Double]("hll_estimate")
    // HLL with 64 registers has ~13% standard error; 3 sigma ≈ 40%.
    // A sketch bug (wrong rho, misaligned buckets, bad harmonic sum)
    // lands far outside this band.
    assert(math.abs(est - truth) / truth < 0.4,
      s"HLL estimate $est vs true $truth — outside the error band")
    // register sum and occupancy are consistent
    assert(r.getAs[Long]("n_buckets_hit") <= 64)
    assert(r.getAs[Long]("reg_sum") >= r.getAs[Long]("n_buckets_hit"))
  }

  test("sketch_quantile: bins bracket the exact percentiles; sketches merge") {
    val rows = PipelinePrep.sketchQuantile(spark, sfDir).collect()
    assert(rows.length == 3)
    // exact percentiles by full sort (the thing the sketch approximates)
    val cents = graft.model.Tables.load(spark, sfDir, "orders")
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("c"))
      .orderBy(col("c")).collect().map(_.getLong(0))
    rows.foreach { r =>
      val target = r.getAs[Long]("target_rank")
      val exact = cents(target.toInt - 1) // rank is 1-based
      val lo = r.getAs[Long]("lo_cents")
      val hi = r.getAs[Long]("hi_cents")
      assert(exact >= lo && exact <= hi,
        s"q=${r.getAs[Long]("q_pct")}: exact $exact outside bin [$lo, $hi]")
      assert(r.getAs[Long]("cum_count") >= target)
    }
    // merge algebra: the histogram of two disjoint halves, summed bin-wise,
    // equals the whole-corpus histogram (the partial-agg path at scale)
    val vals = graft.model.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
    val bounds = vals.agg(min(col("c")).as("minc"), max(col("c")).as("maxc"))
    def hist(part: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      part.crossJoin(broadcast(bounds))
        .select(expr("least(255L, (c - minc) * 256 div (maxc - minc + 1))")
          .as("bin"))
        .groupBy("bin").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = hist(vals)
    val h1 = hist(vals.filter(col("o_orderkey") % 2 === 0))
    val h2 = hist(vals.filter(col("o_orderkey") % 2 === 1))
    val merged = (h1.keySet ++ h2.keySet)
      .map(b => b -> (h1.getOrElse(b, 0L) + h2.getOrElse(b, 0L))).toMap
    assert(merged == whole, "bin-wise sum of half-sketches != whole sketch")
  }

  test("cluster_kmeans: Lloyd step conserves vectors and moves centroids") {
    val k = Similarity.clusterKmeans(spark, sfDir).cache()
    val n = graft.model.Tables.load(spark, sfDir, "embeddings").count()
    // every vector lands in exactly one cell (assignment is a partition);
    // no cell went empty on this fixture, so the counts add back up
    assert(k.agg(sum("n_assigned")).head.getLong(0) == n)
    // reassignment actually moved at least one centroid (label seeding is
    // not the cosine-Voronoi fixpoint on the isotropic fixture)
    assert(k.agg(sum("shift_abs")).head.getLong(0) > 0,
      "Lloyd update was the identity — assignment step is vacuous")
    k.unpersist()
  }

  test("stream_stream_join: streamed matches equal the batch interval join") {
    val streamed = graft.streaming.StreamQueries.streamStreamJoin(spark, sfDir)
    val e = graft.model.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val batch = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_id") % 2 === 0 && col("b.event_id") % 2 === 1 &&
          col("b.ts") > col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("interval 30 minutes"))
      .select(col("a.user_id").as("user_id"),
        col("a.event_id").as("a_id"), col("b.event_id").as("b_id"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stream-stream join diverges from the batch interval join")
  }

  test("pack_length_buckets: power-of-two membership, bounded waste (r9)") {
    val rows = PipelinePrep.packLengthBuckets(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val lens = graft.model.Tables.load(spark, sfDir, "documents")
      .selectExpr("size(filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS n")
      .collect().map(_.getInt(0)).filter(_ > 0)
    rows.foreach { r =>
      val b = r.getInt(0)
      // bucket b holds exactly the docs with 2^b <= len < 2^(b+1)
      val want = lens.count(n => n >= (1 << b) && n < (1 << (b + 1)))
      assert(r.getLong(1) == want, s"bucket $b: ${r.getLong(1)} docs != $want")
      // padding can only add, never exceed (2x - 1)/x of the real tokens
      // inside a power-of-two bucket; permille stays in [0, 500)
      val wp = r.getLong(5)
      assert(wp >= 0 && wp < 500, s"bucket $b waste $wp out of range")
      assert(r.getLong(4) >= r.getLong(3), "padded < real tokens")
    }
    assert(rows.map(_.getLong(1)).sum == lens.length, "docs lost in bucketing")
  }

  test("embed_random_proj: engine projection equals driver-side recompute (r9)") {
    val out = PipelinePrep.embedRandomProj(spark, sfDir).collect()
    assert(out.nonEmpty)
    // the sign matrix is balanced-ish (md5 first hex digit < '8' is a fair
    // coin over 512 cells) and the projections are non-degenerate
    assert((0 until 8).forall(d => out.exists(_.getLong(d + 1) != 0L)),
      "a projection dimension is identically zero")
    // exact recompute of the full projection for 5 vectors via independent
    // driver-side md5 + integer arithmetic
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, d: Int): Long = {
      val hex = md.digest(s"rp:$j:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(0) < '8') 1L else -1L
    }
    val raw = graft.model.Tables.load(spark, sfDir, "embeddings")
      .orderBy(col("vec_id")).limit(5).collect()
    raw.foreach { r =>
      val vid = r.getLong(0)
      val emb = r.getSeq[Float](1)
      val q = emb.map(x => math.floor(x.toDouble * 1e6).toLong)
      val got = out.find(_.getLong(0) == vid).get
      (0 until 8).foreach { d =>
        val want = q.zipWithIndex.map { case (x, j) => x * sign(j, d) }.sum
        assert(got.getLong(d + 1) == want,
          s"vec $vid dim $d: engine ${got.getLong(d + 1)} != recompute $want")
      }
    }
  }

  test("sample_reservoir: exact k per group, pure-function reproducibility, group-limit below the exchange (r11)") {
    val df = PipelinePrep.queries("sample_reservoir")(spark, sfDir)
    val rows = df.collect()
    val groupSizes = graft.model.Tables.load(spark, sfDir, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.keySet == groupSizes.keySet,
      "every language group must be sampled")
    byLang.foreach { case (lang, rs) =>
      val want = math.min(20L, groupSizes(lang))
      assert(rs.length.toLong == want,
        s"$lang: expected $want sampled rows, got ${rs.length}")
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to want),
        s"$lang: ranks must be dense 1..k")
    }
    // the sample is a pure function of doc_id — byte-identical on rerun
    val again = PipelinePrep.queries("sample_reservoir")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet == again, "reservoir must reproduce exactly across invocations")
    // scale shape: the rank<=k filter must compile to WindowGroupLimit in
    // partial mode (map-side pre-truncation BEFORE the exchange) AND final
    // mode — without the rewrite this is a single-task fact-grain sort per
    // language at 100x (the window-lint failure class)
    val phys = df.queryExecution.sparkPlan.toString
    val hits = "WindowGroupLimit".r.findAllIn(phys).length
    assert(hits >= 2,
      s"expected partial+final WindowGroupLimit, found $hits:\n$phys")
  }

  test("sketch_kmv_intersect: driver replay of the sketch, merge theorem, estimate bands (r11)") {
    val r = PipelinePrep.queries("sketch_kmv_intersect")(spark, sfDir).collect().head
    val (k, nBoth, dU, dI, exU, exI) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(k == 64L)
    // full driver replay: same md5-52-bit hashes, same k-min sampling
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = {
      val hex = md.digest(s"kmv:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16)
    }
    val orders = graft.model.Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderstatus")).collect()
      .map(row => (row.getLong(0), row.getString(1)))
    val fa = orders.filter(_._2 == "F").map(_._1).distinct.map(h).sorted.take(64)
    val ob = orders.filter(_._2 == "O").map(_._1).distinct.map(h).sorted.take(64)
    val union = (fa ++ ob).distinct.sorted.take(64)
    val theta = union.max
    val wantBoth = union.count(x => fa.contains(x) && ob.contains(x)).toLong
    val wantDU = 63L * 4503599627370496L / theta
    assert(nBoth == wantBoth && dU == wantDU && dI == wantBoth * wantDU / 64,
      s"estimator replay mismatch: got ($nBoth,$dU,$dI), want ($wantBoth,$wantDU,${wantBoth * wantDU / 64})")
    // the KMV merge theorem: merging the two k-min SAMPLES equals sketching
    // the union of the full sets — the property that makes the sketch a
    // mergeable aggregate at any fan-in
    val fullUnion = (orders.filter(_._2 == "F") ++ orders.filter(_._2 == "O"))
      .map(_._1).distinct.map(h).sorted.take(64).toSeq
    assert(union.toSeq == fullUnion, "k-min merge must equal the union sketch")
    // accuracy band: k=64 gives ~12.6% relative std; 3 sigma on this fixture
    assert(math.abs(dU - exU).toDouble / exU < 0.38, s"union est $dU vs exact $exU")
    assert(math.abs(dI - exI).toDouble / exI < 0.38, s"intersect est $dI vs exact $exI")
  }

  test("pack_epoch_shuffle: fresh permutation per epoch, WindowGroupLimit pre-truncation (r11)") {
    import org.apache.spark.sql.functions.col
    val df = graft.llm.PipelinePrep.queries("pack_epoch_shuffle")(spark, sfDir)
    val hits = "WindowGroupLimit".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    assert(hits >= 2,
      s"slot<=k must lower to partial+final WindowGroupLimit, found $hits")
    val out = df.collect()
    assert(out.length == 3 * 8 * 3, "3 epochs x 8 shards x 3 slots")
    // driver replay: the schedule head is the md5 order exactly
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    def h(e: Int, id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$e:$id".getBytes("UTF-8"))
      md.map("%02x".format(_)).mkString
    }
    for (e <- 0 to 2; sh <- 0 to 7) {
      val want = docs.filter(_ % 8 == sh).map(id => (h(e, id), id))
        .sorted.take(3).map(_._2).toSeq
      val got = out.filter(r => r.getInt(0) == e && r.getLong(1) == sh)
        .sortBy(_.getInt(2)).map(_.getLong(3)).toSeq
      assert(got == want, s"schedule head diverged at epoch $e shard $sh")
    }
    // epochs are genuinely different permutations
    val heads = (0 to 2).map(e =>
      out.filter(_.getInt(0) == e).sortBy(r => (r.getLong(1), r.getInt(2)))
        .map(_.getLong(3)).toSeq)
    assert(heads.distinct.length == 3,
      "two epochs produced the identical schedule head")
  }

  test("embed_pca_power: exact driver replay, PSD Rayleigh quotient monotone over rounds (r11)") {
    import org.apache.spark.sql.functions.col
    val out = graft.llm.PipelinePrep.queries("embed_pca_power")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> BigInt(r.getLong(1))).toMap
    // replay everything in BigInt from the raw embeddings
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => BigInt(math.floor(x.toDouble * 1e6).toLong)).toArray)
    val dim = vecs.head._2.length
    val n = BigInt(vecs.length)
    val sums = Array.tabulate(dim)(d => vecs.map(_._2(d)).sum)
    val cMat = Array.tabulate(dim, dim) { (a, b) =>
      n * vecs.map(v => v._2(a) * v._2(b)).sum - sums(a) * sums(b)
    }
    def step(v: Array[BigInt]): Array[BigInt] = {
      val mv = Array.tabulate(dim)(a => (0 until dim).map(b => cMat(a)(b) * v(b)).sum)
      val mx = mv.map(_.abs).max
      val denom = (mx / 1000000).max(BigInt(1))
      mv.map(_ / denom)
    }
    def rayleigh(v: Array[BigInt]): (BigInt, BigInt) = {
      val num = (0 until dim).flatMap(a => (0 until dim).map(b => v(a) * cMat(a)(b) * v(b))).sum
      (num, v.map(x => x * x).sum)
    }
    val v1 = step(Array.fill(dim)(BigInt(1000000)))
    val v2 = step(v1); val v3 = step(v2)
    vecs.foreach { case (id, qv) =>
      val want = (0 until dim).map(d => qv(d) * v3(d)).sum
      assert(out(id) == want, s"projection mismatch at vec $id")
    }
    // power iteration on a PSD matrix: the Rayleigh quotient never
    // decreases round over round (exact rational compare via cross-mult)
    val (r1n, r1d) = rayleigh(v1); val (r2n, r2d) = rayleigh(v2)
    val (r3n, r3d) = rayleigh(v3)
    assert(r2n * r1d >= r1n * r2d, "Rayleigh quotient fell from round 1 to 2")
    assert(r3n * r2d >= r2n * r3d, "Rayleigh quotient fell from round 2 to 3")
    // the learned axis explains at least as much variance as the best
    // single coordinate's share along v3's direction would suggest > 0
    assert(r3n > 0, "degenerate principal axis")
  }

  test("sample_temperature: sqrt-quota redistribution upsamples minority langs (r11)") {
    val out = graft.llm.PipelinePrep.queries("sample_temperature")(spark, sfDir)
      .collect()
    assert(out.length >= 3)
    val nDocs = out.map(_.getLong(1)); val b = nDocs.sum
    val w = out.map(_.getLong(2)); val tw = w.sum
    val quota = out.map(_.getLong(3))
    out.indices.foreach { i =>
      // exact integer sqrt (the +-1 corrected floor)
      assert(w(i) * w(i) <= nDocs(i) && (w(i) + 1) * (w(i) + 1) > nDocs(i),
        s"isqrt at ${out(i).getString(0)}")
      assert(quota(i) == b * w(i) / tw, s"quota at ${out(i).getString(0)}")
      // emission stays inside [epochs*n, (epochs+1)*n] by construction
      val e = out(i).getLong(4); val m = out(i).getLong(5)
      assert(m >= e * nDocs(i) && m <= (e + 1) * nDocs(i),
        s"emitted count out of the epoch envelope at ${out(i).getString(0)}")
    }
    // floored quotas can drop at most one doc per lang from the budget
    assert(quota.sum <= b && b - quota.sum < out.length)
    // the property that distinguishes this key from sample_stratified:
    // at least one lang is UPSAMPLED past its corpus count (epochs >= 1
    // with a fractional extra) and at least one is downsampled
    assert(out.exists(r => r.getLong(5) > r.getLong(1)),
      "no lang was upsampled — fixture or quota math degenerate")
    assert(out.exists(r => r.getLong(5) < r.getLong(1)),
      "no lang was downsampled")
    // multiset fingerprint present for every emitting lang
    out.filter(_.getLong(5) > 0).foreach(r => assert(r.getString(6) != null))
  }

  test("sketch_kmv_diff: class partition conserves k, estimates partition the union (r12)") {
    val r = PipelinePrep.queries("sketch_kmv_diff")(spark, sfDir).collect().head
    val (k, nA, nB, nBoth) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (dU, dA, dB) = (r.getLong(4), r.getLong(5), r.getLong(6))
    val (exA, exB) = (r.getLong(7), r.getLong(8))
    assert(k == 64L)
    // the union sketch's samples PARTITION into the three classes — the
    // identity that makes a-not-b consistent with union and intersection
    assert(nA + nB + nBoth == k,
      s"class counts $nA+$nB+$nBoth must partition the $k union samples")
    // each estimate is its class share of the union estimate (truncating),
    // so the three reassemble D̂_union up to one truncation unit per class
    val dBoth = nBoth * dU / k
    assert(dA == nA * dU / k && dB == nB * dU / k,
      s"class estimates ($dA,$dB) are not sample shares of the union $dU")
    assert(dA + dB + dBoth <= dU && dA + dB + dBoth > dU - 3 * (dU / k + 1),
      s"partitioned estimates $dA+$dB+$dBoth do not reassemble $dU")
    // accuracy: 3-sigma relative band (k=64 ≈ 12.6% rsd) PLUS a
    // granularity floor — each union sample stands for D̂_union/k
    // elements, so a class holding a handful of members can only be
    // estimated to within a few granules (at sf0.001 only-A is 2
    // customers against a ~2.3-customer granule)
    assert(exA > 0 && exB > 0, "fixture must have customers on both sides")
    val granule = dU.toDouble / k
    def band(ex: Long) = 0.38 * ex + 4 * granule
    assert(math.abs(dA - exA) < band(exA), s"only-A est $dA vs exact $exA")
    assert(math.abs(dB - exB) < band(exB), s"only-B est $dB vs exact $exB")
  }

  test("ts_twa is bounded by per-user min/max and differs from the plain mean (r12)") {
    val twa = graft.operators.TimeSeries.queries("ts_twa")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(twa.nonEmpty)
    // driver replay on a few users + bounds on all
    val ev = graft.model.Tables.load(spark, sfDir, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us",
        "CAST(round(value * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    twa.foreach { case (u, (nGaps, span, micents)) =>
      val series = ev(u).toSeq.sortBy(e => (e._3, e._2))
      assert(nGaps == series.length - 1, s"user $u gap count")
      val gaps = series.zip(series.tail)
        .map { case (a, b) => (BigInt(b._3 - a._3), BigInt(a._4)) }
      assert(span == gaps.map(_._1).sum, s"user $u span")
      val want = (gaps.map { case (dt, c) => dt * c }.sum * 1000000 /
        gaps.map(_._1).sum).toLong
      assert(micents == want, s"user $u twa replay: got $micents want $want")
      // TWA is a convex combination of observed values: inside [min,max]
      val lo = gaps.map(_._2).min * 1000000
      val hi = gaps.map(_._2).max * 1000000
      assert(micents >= lo && micents <= hi, s"user $u twa outside value hull")
    }
    // and the weighting is real: for some user TWA differs from the
    // unweighted mean of the same leading values (else the key is AVG)
    val differs = twa.exists { case (u, (_, _, micents)) =>
      val series = ev(u).toSeq.sortBy(e => (e._3, e._2)).dropRight(1)
      val mean = series.map(e => BigInt(e._4)).sum * 1000000 / series.length
      (mean - micents).abs > 1000000 // differ by more than one cent-unit
    }
    assert(differs, "TWA equals the plain mean everywhere — weighting vacuous")
  }
}
