package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior checks for the LLM-pipeline operators (plan shape + semantics
  * the DuckDB hash compare can't express). */
class LlmOpsSpec extends SparkSpec {

  test("dedup_exact collapses planted exact duplicates to the min doc_id") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "unique text here"), (7L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("spec_docs")
    val out = docs.select(md5(col("text")).as("fp"), col("doc_id"))
      .groupBy("fp").agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
    val dup = out.filter(col("n") === 3).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("keep_id") == 1L)
  }

  test("minhash-LSH finds the planted near-dup pairs with high jaccard") {
    val pairs = Dedup.dedupMinhashLsh(spark, sfDir).collect()
    // sf0.001 plants ~28 near-dup pairs; the exact count is data, not contract
    assert(pairs.length >= 20 && pairs.length <= 40,
      s"expected the planted near-dup pairs, got ${pairs.length}")
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
    assert(pairs.count(_.getAs[Double]("jaccard") >= 0.9) >= 15,
      "most planted pairs are ~0.99 jaccard")
  }

  test("threshold sweep: monotone curve, θ=0.5 row equals the pair key, doc bound (r12)") {
    val sweep = Dedup.dedupThresholdSweep(spark, sfDir).collect()
      .map(r => r.getAs[Int]("threshold_pct") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs"))).toMap
    assert(sweep.keySet == Set(50, 60, 70, 80, 90),
      "every threshold row survives, even empty")
    // raising θ can only shrink both counts
    Seq(50, 60, 70, 80).foreach { t =>
      assert(sweep(t)._1 >= sweep(t + 10)._1, s"pairs grew from θ=$t")
      assert(sweep(t)._2 >= sweep(t + 10)._2, s"docs grew from θ=$t")
    }
    // the θ=0.5 row IS the pair key's relation, counted
    val lsh = Dedup.dedupMinhashLsh(spark, sfDir).collect()
    assert(sweep(50)._1 == lsh.length,
      s"θ=0.5 pairs ${sweep(50)._1} != pair key ${lsh.length}")
    assert(sweep(50)._2 ==
      lsh.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct.length,
      "θ=0.5 implicated docs != distinct ids in the pair key")
    // structural bounds and non-vacuity on the planted fixture
    sweep.values.foreach { case (p, d) =>
      assert(d <= 2 * p, "a pair implicates at most 2 docs") }
    assert(sweep(90)._1 > 0, "the ~0.99-jaccard planted pairs reach θ=0.9")
    assert(sweep(50)._1 > sweep(90)._1,
      "sweep is degenerate: no pairs between 0.5 and 0.9")
  }

  test("minhash-LSH plan has no cartesian/nested-loop stage (bucketed, not all-pairs)") {
    val plan = Dedup.dedupMinhashLsh(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "all-pairs join leaked into the plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "non-equi join leaked into the plan")
  }

  test("ngram-jaccard agrees with minhash-LSH on high-similarity pairs") {
    val mh = Dedup.dedupMinhashLsh(spark, sfDir)
      .filter(col("jaccard") >= 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ng = Dedup.dedupNgramJaccard(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(ng),
      s"exact inverted-index jaccard must cover all LSH pairs above threshold: missing ${mh.diff(ng)}")
  }

  test("simhash of near-duplicate docs differs in few bits") {
    val sims = Dedup.dedupSimhash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.dedupMinhashLsh(spark, sfDir)
      .filter(col("jaccard") >= 0.9).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.nonEmpty)
    val dists = pairs.flatMap { case (a, b) =>
      for (x <- sims.get(a); y <- sims.get(b))
        yield java.lang.Long.bitCount(x ^ y)
    }
    assert(dists.forall(_ <= 4),
      s"near-dup pairs should be within 4/16 simhash bits, got ${dists.max}")
  }

  test("brute-force top-k is deterministic, complete and correctly ranked") {
    val out = Similarity.simTopkBruteforce(spark, sfDir).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10 && byQuery.values.forall(_.length == 5))
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      val cosines = sorted.map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b },
        "rank order must follow cosine desc")
    }
  }

  test("LSH-ANN candidates come only from the query's bucket (subset of brute force space)") {
    val ann = Similarity.simLshAnn(spark, sfDir).collect()
    assert(ann.nonEmpty)
    // every returned neighbor must share the query's sign-bucket
    val buckets = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), expr(
        """(case when embedding[0] > 0 then 1 else 0 end) +
          |(case when embedding[8] > 0 then 2 else 0 end) +
          |(case when embedding[16] > 0 then 4 else 0 end) +
          |(case when embedding[24] > 0 then 8 else 0 end)""".stripMargin).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ann.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(buckets(q) == buckets(n), s"neighbor $n not in query $q's bucket")
    }
  }

  test("dedup_clusters: pair endpoints share a cluster, keeper is the component min") {
    val pairs = Dedup.dedupMinhashLsh(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("keep"))).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1,
        s"pair ($a,$b) must land in one cluster")
    }
    // cluster label is the min member; exactly that member is kept
    val members = clusters.toSeq.groupBy(_._2._1)
    members.foreach { case (cid, ms) =>
      assert(ms.map(_._1).min == cid, s"cluster $cid label must be its min member")
      assert(ms.count(_._2._2) == 1 && ms.find(_._2._2).get._1 == cid,
        s"exactly the min member of $cid is the keeper")
    }
    // documents outside any pair are singletons keeping themselves
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    clusters.filterNot(c => paired(c._1)).foreach { case (id, (cid, keep)) =>
      assert(cid == id && keep, s"singleton $id must keep itself")
    }
  }

  test("IVF-ANN: neighbors come from the query's probed cells; ranks follow cosine") {
    val out = Similarity.simIvfAnn(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet.subsetOf((0L until 10L).toSet))
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val cosines = sorted.map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(!rows.exists(r =>
        r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id")),
        "a query must not return itself")
    }
    // the IVF identity: probing ALL k cells must equal exact brute-force
    // top-3 bit for bit (same dots, same tie-breaks) — the correctness
    // anchor that doesn't depend on the fixture's (isotropic) geometry
    val full = Similarity.simIvfAnn(spark, sfDir, nprobe = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    val bf = Similarity.simTopkBruteforce(spark, sfDir).filter(col("rank") <= 3)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    assert(full == bf, "IVF with nprobe = k must equal exact search")
    // probing FEWER cells can't beat exact search: per query, the best
    // nprobe=2 cosine is bounded by the exact best, and at most 3 return
    val bestExact = bf.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.length <= 3)
      val bestIvf = rows.map(_.getAs[Double]("cosine")).max
      assert(bestIvf <= bestExact(q) + 1e-12,
        s"query $q: nprobe=2 found cosine $bestIvf above the exact best ${bestExact(q)}")
    }
  }

  test("sim_recall_at_k: served per-query hits equal the list intersection; arithmetic identity holds (r12)") {
    val per = Similarity.simRecallAtK(spark, sfDir).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("recall_pm"))).toMap
    assert(per.size == 50, s"one row per sampled query: ${per.size}")
    per.foreach { case (q, (h, pm)) =>
      assert(h >= 0 && h <= 3, s"query $q: hits $h out of [0,3]")
      assert(pm == h * 1000 / 3, s"query $q: recall_pm $pm != ${h * 1000 / 3}")
    }
    // cross-check against the two PUBLIC serving keys on their shared
    // query ids (brute force serves vec_id < 10 ⊂ the key's 50): the
    // key's count must equal the intersection of the served lists
    def top3(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.filter(_.getAs[Int]("rank") <= 3)
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = top3(Similarity.simTopkBruteforce(spark, sfDir).collect())
    val ann = top3(Similarity.simLshMultitable(spark, sfDir).collect())
    exact.foreach { case (q, truthSet) =>
      val expected = (ann.getOrElse(q, Set.empty) & truthSet).size.toLong
      assert(per(q)._1 == expected,
        s"query $q: key served ${per(q)._1} hits, lists intersect in $expected")
    }
    val macroRecall = per.values.map(_._1).sum.toDouble / (3 * per.size)
    info(f"multitable LSH recall@3 over 50 queries (served relation): $macroRecall%.3f")
    assert(macroRecall > 0.0, "eval relation claims the index lost everything")
  }

  test("ANN recall@3 vs brute force is measured and above the floor") {
    // the quality signal VERDICT r4 asked for: how much of the exact top-3
    // does each ANN tier recover on this fixture? The fixture embeddings
    // are isotropic (no cluster structure), so these numbers are the
    // WORST-CASE recall of the bucketing — real corpora cluster, and
    // recall rises with nprobe/bands (knob documented in Similarity).
    def top3(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.filter(_.getAs[Int]("rank") <= 3)
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = top3(Similarity.simTopkBruteforce(spark, sfDir).collect())
    def recall(ann: Map[Long, Set[Long]]): Double = {
      val qs = exact.keySet
      qs.toSeq.map(q => (ann.getOrElse(q, Set.empty) & exact(q)).size.toDouble /
        exact(q).size).sum / qs.size
    }
    val lsh = recall(top3(Similarity.simLshAnn(spark, sfDir).collect()))
    val lshMt = recall(top3(Similarity.simLshMultitable(spark, sfDir).collect()))
    val ivf2 = recall(top3(Similarity.simIvfAnn(spark, sfDir, nprobe = 2).collect()))
    val ivf5 = recall(top3(Similarity.simIvfAnn(spark, sfDir, nprobe = 5).collect()))
    info(f"recall@3 vs exact — lsh(1 table): $lsh%.3f, lsh(4 tables): $lshMt%.3f, ivf(nprobe=2): $ivf2%.3f, ivf(nprobe=5): $ivf5%.3f")
    // more tables must buy recall — the knob the single-table key documents
    assert(lshMt > lsh, f"4-table recall $lshMt%.3f not above 1-table $lsh%.3f")
    // floors, pinned to the deterministic fixture: a single 4-bit sign-LSH
    // table on ISOTROPIC vectors sits at the 1/16 random-bucket baseline by
    // construction (measured 0.033 — the scale path is multiple tables /
    // multi-probe, which multiplies candidate buckets without all-pairs);
    // IVF at nprobe=2 of 10 cells recovers 0.267 and must stay above the
    // 2/10 random-cell baseline
    assert(lsh > 0.0, f"LSH recall $lsh%.3f — bucketing lost every true neighbor")
    assert(ivf2 >= 0.20, f"IVF nprobe=2 recall $ivf2%.3f below the random-cell baseline")
    // recall must be monotone in nprobe (the knob does what it claims)
    assert(ivf5 >= ivf2, f"recall fell as nprobe grew: $ivf2%.3f -> $ivf5%.3f")
    // PQ-ADC with the 10-entry label-seeded codebooks (the shared
    // deterministic quantizer family; cluster_kmeans is its trainer) —
    // isotropic worst case again, but lookups must beat losing everything
    val pq = recall(top3(Similarity.simPqAdc(spark, sfDir).collect()))
    info(f"recall@3 vs exact — pq-adc(8x10 codebooks): $pq%.3f")
    assert(pq > 0.0, f"PQ-ADC recall $pq%.3f — codes lost every true neighbor")
    // TRAINED codebooks (r7): 3 Lloyd rounds per subspace. Label-seeded
    // centroids are means of geometry-independent subsets — they all
    // collapse near the global mean and ADC degenerates to noise (the
    // 0.067 above). Training spreads the centroids through each
    // subspace, so the same serving plan must recover a real fraction
    // of the exact top-3 — the uplift is the whole point of the trainer.
    val pqT = recall(top3(Similarity.simPqAdcTrained(spark, sfDir).collect()))
    info(f"recall@3 vs exact — pq-adc TRAINED (3 Lloyd rounds): $pqT%.3f")
    assert(pqT > pq,
      f"training did not lift PQ recall: $pq%.3f -> $pqT%.3f")
    assert(pqT >= 0.30,
      f"trained PQ recall $pqT%.3f below the 0.30 floor on the fixture")
    // IVFPQ (r8): PQ codes over IVF cell RESIDUALS, serving only the
    // nprobe=5 probed cells' codes. Same 16x4x64 code budget as the
    // trained flat key, but residuals are centered and small, so the
    // codes quantize finer — composing the two halves must BEAT flat
    // trained PQ even while scanning half the corpus (its recall ceiling
    // is IVF-exact at the same nprobe, measured 0.600 above).
    val ivfpq = recall(top3(Similarity.simIvfPq(spark, sfDir).collect()))
    info(f"recall@3 vs exact — IVFPQ (nprobe=5 of 10, residual-trained): $ivfpq%.3f")
    assert(ivfpq >= pqT,
      f"IVFPQ recall $ivfpq%.3f below trained flat PQ $pqT%.3f at equal code budget")
    assert(ivfpq <= ivf5 + 1e-9,
      f"IVFPQ recall $ivfpq%.3f exceeds its IVF-exact ceiling $ivf5%.3f — scan leaked outside probed cells?")
  }

  test("hamming sign-bit top-k: packing bounds, recall above single-table LSH (r12)") {
    // binary quantization carries the FULL 64 sign bits (vs the LSH keys'
    // 4 bucket bits), so its exhaustive Hamming scan must recover more of
    // the exact top-3 than a single 4-bit LSH table's bucket-restricted
    // candidates — the compression-vs-recall point the key exists to make.
    def top3(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.filter(_.getAs[Int]("rank") <= 3)
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = top3(Similarity.simTopkBruteforce(spark, sfDir).collect())
    def recall(ann: Map[Long, Set[Long]]): Double = {
      val qs = exact.keySet
      qs.toSeq.map(q => (ann.getOrElse(q, Set.empty) & exact(q)).size.toDouble /
        exact(q).size).sum / qs.size
    }
    val hamRows = Similarity.simHammingTopk(spark, sfDir).collect()
    val ham = recall(top3(hamRows))
    val lsh = recall(top3(Similarity.simLshAnn(spark, sfDir).collect()))
    info(f"recall@3 vs exact — hamming(64 sign bits): $ham%.3f, lsh(1 table, 4 bits): $lsh%.3f")
    assert(ham > lsh,
      f"64-bit Hamming recall $ham%.3f not above 4-bit single-table LSH $lsh%.3f")
    assert(ham >= 0.10, f"Hamming recall $ham%.3f below the 0.10 floor")
    // distances are genuine popcounts: within [0, 64], and per query the
    // ranked list is non-decreasing in hamming with ids breaking ties
    hamRows.foreach { r =>
      val h = r.getAs[Long]("hamming")
      assert(h >= 0 && h <= 64, s"hamming $h outside [0,64]")
    }
    hamRows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("hamming"), r.getAs[Long]("neighbor_id")))
      assert(byRank.zip(byRank.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) },
        s"rank order violates (hamming, id) total order: ${byRank.mkString(",")}")
    }
  }

  test("NSW graph search: sub-scan visited bound, recall above the entry-only baseline") {
    val (visited, result) = Similarity.nswWalk(spark, sfDir)
    val corpusN = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    // THE graph-ANN contract: the walk scores O(hops·beam·degree) vectors
    // per query, never the corpus — at 100 TB this bound (not recall) is
    // why the family exists next to IVFPQ
    val perQuery = visited.groupBy("query_id").count().collect()
      .map(_.getLong(1))
    info(s"visited per query: min ${perQuery.min}, max ${perQuery.max}, corpus $corpusN")
    assert(perQuery.max < corpusN / 3,
      s"walk visited ${perQuery.max} of $corpusN — not sub-scan")
    assert(perQuery.min >= 1 + 3,
      "walk never left the entry point — the graph is not navigable")
    // recall@3 vs exact brute force on the same query set
    def top3(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.filter(_.getAs[Int]("rank") <= 3)
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = top3(Similarity.simTopkBruteforce(spark, sfDir).collect())
    val nsw = top3(result.collect())
    val recall = exact.keySet.toSeq.map(q =>
      (nsw.getOrElse(q, Set.empty) & exact(q)).size.toDouble / exact(q).size)
      .sum / exact.size
    info(f"NSW recall@3 vs exact (beam=4, hops=4): $recall%.3f")
    // floor: the walk explores ~sqrt-ish of the corpus from one fixed
    // entry over an LSH-built 3-NN graph on ISOTROPIC vectors — the
    // worst case for navigability; it must still recover a real fraction
    assert(recall >= 0.30,
      f"NSW recall $recall%.3f below the fixture floor")
  }

  test("HNSW 2-layer: layer 1 routes per-query entries, recall holds, still sub-scan (r12)") {
    val (visited1, visited0, result) = Similarity.hnswWalk(spark, sfDir)
    val corpusN = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    // the hierarchy's observable contract: the upper layer ROUTES — not
    // every query enters layer 0 at the same node (a collapsed layer 1
    // would reduce this key to single-layer NSW with extra cost)
    import org.apache.spark.sql.expressions.Window
    val entries = visited1
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("node"))))
      .filter(col("rn") === 1).select("node").distinct().count()
    assert(entries >= 2, s"layer 1 routed every query to one entry — no hierarchy")
    // layer-1 walk only ever touches layer-1 nodes (the sampled sparse graph)
    val offLayer = visited1.filter(col("node") % 8 =!= 0).count()
    assert(offLayer == 0, s"$offLayer layer-1 visits left the sampled layer")
    // total per-query work stays O(hops·beam·degree), never a corpus scan
    val perQuery = visited0.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQuery.max < corpusN / 3,
      s"layer-0 walk visited ${perQuery.max} of $corpusN — not sub-scan")
    // recall@3 vs exact brute force — the routed walk must do at least as
    // well as the fixture floor of the single-layer key
    def top3(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.filter(_.getAs[Int]("rank") <= 3)
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = top3(Similarity.simTopkBruteforce(spark, sfDir).collect())
    val got = top3(result.collect())
    val recall = exact.keySet.toSeq.map(q =>
      (got.getOrElse(q, Set.empty) & exact(q)).size.toDouble / exact(q).size)
      .sum / exact.size
    info(f"HNSW recall@3 vs exact: $recall%.3f ($entries distinct layer-0 entries)")
    assert(recall >= 0.30, f"HNSW recall $recall%.3f below the fixture floor")
  }

  test("PQ codes are the compressed representation the ADC scan claims") {
    val base = graft.model.Tables.load(spark, sfDir, "embeddings")
    val n = base.count()
    val out = Similarity.simPqAdc(spark, sfDir).collect()
    // every query gets a full top-3 with strictly ordered, non-negative
    // integer distances and deterministic tie-breaks
    assert(out.length == 30)
    assert(out.forall(_.getAs[Long]("adc_dist") >= 0L))
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val ds = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("adc_dist"))
      assert(ds.sorted.sameElements(ds), s"query $q: ADC ranks out of order")
      assert(rows.map(_.getAs[Long]("neighbor_id")).distinct.length == 3)
      assert(n > 0)
    }
  }

  test("multimodal decode: typed batch pipeline over the real-media corpus (r10)") {
    val decoded = Multimodal.decodeAll(spark, sfDir).cache()
    val n = decoded.count()
    assert(n > 0)
    val mods = decoded.collect()
    // every record decoded through a REAL parser — the opaque 'binary'
    // fallback must never fire on the synthesized corpus
    assert(mods.forall(m => Set("image", "audio", "video")(m.modality)))
    // modality is detected from container magic, and it matches the
    // generator's doc_id % 3 assignment
    mods.foreach { m =>
      val want = (m.doc_id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(m.modality == want, s"doc ${m.doc_id}: ${m.modality} != $want")
    }
    assert(mods.filter(_.modality == "audio").forall(m =>
      m.channels >= 1 && m.sample_rate >= 8000 && m.width == 0))
    assert(mods.filter(_.modality == "image").forall(m =>
      m.width >= 16 && m.height >= 16 && m.channels == 3 && m.n_frames == 1))
    assert(mods.filter(_.modality == "video").forall(m =>
      m.width >= 8 && m.height >= 6 && m.n_frames >= 2))
    // resize clamps the long side, preserves aspect-ish
    val resized = Multimodal.resize(decoded, 32).collect()
    assert(resized.filter(_.modality != "audio")
      .forall(m => m.width <= 32 && m.height <= 32))
    // frame sampling reduces only videos
    val sampled = Multimodal.frameSample(decoded, 2).collect()
      .map(m => m.doc_id -> m).toMap
    mods.filter(_.modality == "video").foreach { m =>
      assert(sampled(m.doc_id).n_frames == (m.n_frames + 1) / 2)
    }
    decoded.unpersist()
  }

  test("codec seam contract: image → ImageIO, WAV → javax.sound, AVI → AviCodec, junk → opaque (r10)") {
    import Multimodal.{AviCodec, ImageIoCodec, WavCodec}
    // hand-crafted WAV fixture: 8 kHz mono, 4 frames, known samples
    val wav = WavCodec.encodeWav(sampleRate = 8000, channels = 1, frames = 4)
    assert(WavCodec.sniff(wav), "encoder must emit a RIFF/WAVE container")
    assert(wav.length == 44 + 4 * 2, "canonical PCM WAV: 44-byte header + data")
    val meta = WavCodec.decode(7L, wav, "52494646").get
    assert(meta.modality == "audio" && meta.sample_rate == 8000 &&
      meta.channels == 1 && meta.n_frames == 4 && meta.width == 0)
    // samples are (f*37) % 4096 − 2048 for f = 0..3
    val expected = (0 until 4).map(f => (f * 37) % 4096 - 2048).sum.toLong
    assert(WavCodec.pcmSum(wav) == expected,
      s"decoded PCM data must match the generator: ${WavCodec.pcmSum(wav)} vs $expected")
    // the TOTAL seam routes each container to its real decoder...
    val png = ImageIoCodec.encodePng(20, 12)
    val viaSeamImg = ImageIoCodec.decode(1L, png, "89504E47")
    assert(viaSeamImg.modality == "image" && viaSeamImg.width == 20 &&
      viaSeamImg.height == 12)
    val viaSeamWav = ImageIoCodec.decode(1L, wav, "52494646")
    assert(viaSeamWav.modality == "audio" && viaSeamWav.n_frames == 4)
    // ...a genuine AVI container routes to the library's RIFF/AVI parser
    val avi = AviCodec.encodeAvi(w = 10, h = 8, frames = 3, fps = 10)
    val viaSeamAvi = ImageIoCodec.decode(2L, avi, "5249")
    assert(viaSeamAvi.modality == "video" && viaSeamAvi.width == 10 &&
      viaSeamAvi.height == 8 && viaSeamAvi.n_frames == 3)
    // ...and a payload no codec claims is reported as opaque binary with
    // zero geometry — the r10 contract: no fabricated media numbers
    val blob = Array.tabulate[Byte](100)(i => (i * 31).toByte)
    val viaSeamBlob = ImageIoCodec.decode(2L, blob, "00000000")
    assert(viaSeamBlob.modality == "binary" && viaSeamBlob.width == 0 &&
      viaSeamBlob.height == 0 && viaSeamBlob.n_frames == 0 &&
      viaSeamBlob.n_bytes == 100L)
    // a RIFF prefix that is NOT a parseable WAV falls through, not crashes
    val riffJunk = "RIFFxxxxWAVEgarbage-not-a-wav".getBytes("UTF-8")
    assert(ImageIoCodec.decode(2L, riffJunk, "52494646").modality == "binary")
  }

  test("AviCodec round-trip: header geometry, movi frame walk, exact pixel fold (r10)") {
    import Multimodal.AviCodec
    val (w, h, frames) = (11, 7, 4)
    val avi = AviCodec.encodeAvi(w, h, frames, fps = 10)
    assert(AviCodec.sniff(avi), "encoder must emit a RIFF/AVI container")
    val stride = (3 * w + 3) / 4 * 4
    assert(avi.length == 224 + frames * (8 + h * stride),
      "container size must match the published layout arithmetic")
    val info = AviCodec.parse(avi).get
    assert(info.width == w && info.height == h && info.bitCount == 24)
    assert(info.totalFrames == frames, "avih header frame count")
    assert(info.moviFrames == frames, "frame count from walking movi chunks")
    // the pixel fold equals the generator replayed in plain Scala
    val expected = (for {
      f <- 0 until frames; y <- 0 until h; x <- 0 until w; c <- 0 until 3
    } yield ((f * 31 + y * 7 + x * 3 + c * 5) % 251).toLong).sum
    assert(info.pixelSum == expected,
      s"decoded pixel fold ${info.pixelSum} != generator $expected")
    // truncated and junk payloads refuse to parse rather than crash
    assert(AviCodec.parse(avi.take(40)).isEmpty)
    assert(AviCodec.parse("RIFFxxxxAVI junk".getBytes("UTF-8")).isEmpty)
  }

  test("semantic dedup: drops exactly the centroid-closer member of within-cell near-dup pairs") {
    val out = Similarity.dedupSemantic(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == out.length,
      "one verdict per vector")
    val cell = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    val ccos = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("centroid_cos")).toMap
    val keep = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    assert(keep.values.exists(_ == false) && keep.values.exists(_ == true),
      "the verdict must be non-vacuous: some dropped, some kept")
    // replay the pair predicate from the raw vectors (exact quantized dot)
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 1e6).toLong).toArray).toMap
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum.toDouble
      dot / (math.sqrt(va.map(x => x * x).sum.toDouble) *
        math.sqrt(vb.map(x => x * x).sum.toDouble))
    }
    val ids = out.map(_.getAs[Long]("vec_id"))
    val pairs = for {
      a <- ids; b <- ids
      if a < b && cell(a) == cell(b) && cos(a, b) >= 0.35
    } yield (a, b)
    assert(pairs.nonEmpty, "fixture must contain within-cell near-dup pairs")
    // sufficiency on CLEARLY-ordered pairs (centroid_cos is rounded to 4
    // decimals in the output, so only a >1e-3 gap pins which side loses)
    pairs.foreach { case (a, b) =>
      if (ccos(a) > ccos(b) + 1e-3)
        assert(!keep(a), s"$a is centroid-closer than near-dup $b and must drop")
      else if (ccos(b) > ccos(a) + 1e-3)
        assert(!keep(b), s"$b is centroid-closer than near-dup $a and must drop")
    }
    // necessity: a dropped vector always has a near-dup partner in its cell
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    keep.collect { case (v, false) => v }.foreach { v =>
      assert(paired.contains(v), s"$v dropped without any within-cell near-dup pair")
    }
  }

  test("text quality and langid stay inside one projection (no shuffle)") {
    val plan = TextAnalysis.textQuality(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the presentation sort
    assert(plan.split("Exchange").length - 1 <= 1,
      s"per-row text ops must not shuffle:\n$plan")
  }

  test("substring dedup flags the shared span, not the whole document") {
    import spark.implicits._
    // docs 1 and 2 share an 8-token span inside otherwise-different text;
    // doc 3 is disjoint; doc 4 is too short to have any window
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"intro a b $shared outro c d"),
      (2L, s"different words entirely $shared and a tail"),
      (3L, "nothing here repeats nine ten eleven twelve thirteen"),
      (4L, "too short")).toDF("doc_id", "text")
    val out = Dedup.dedupSubstringOver(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows")))
      .toMap
    // the shared 8-gram occurs in both docs → exactly 1 dup window each
    assert(out(1L)._2 == 1 && out(2L)._2 == 1,
      s"both span carriers flag exactly the shared window: $out")
    assert(out(1L)._2 < out(1L)._1, "only the span is flagged, not the doc")
    assert(out(3L) == (1L, 0L), "disjoint doc has windows but no dups")
    assert(out(4L) == (0L, 0L), "sub-window doc reports zero windows")
  }

  test("substring dedup plan: one exchange on the window hash + the doc re-agg (no joins into the corpus)") {
    val plan = Dedup.dedupSubstring(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"substring dedup must stay linear:\n$plan")
  }

  test("pretrain export pipeline: manifest conserves exactly the keep set, " +
      "bit-reproducibly (r11)") {
    val manifest = Curation.pipelinePretrainExport(spark, sfDir).collect()
    assert(manifest.nonEmpty && manifest.length <= 4)
    val keepCount = Curation.curateKeepDrop(spark, sfDir)
      .filter(col("keep")).count()
    assert(keepCount > 0, "fixture must keep at least one doc")
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == keepCount,
      "shard manifest lost or invented survivors vs the keep decision")
    // every shard is non-degenerate and fingerprinted
    assert(manifest.forall(r => r.getAs[Long]("n_tokens") > 0 &&
      r.getAs[String]("shard_fp") != null))
    // re-running the whole pipeline reproduces the manifest byte-for-byte
    val again = Curation.pipelinePretrainExport(spark, sfDir).collect()
    assert(manifest.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "export pipeline is not reproducible across runs")
    // the decision subtree (which runs inside the export's write job)
    // stays the sum of its parts: no quadratic join sneaks in when the
    // curation operators chain
    val plan = Curation.curateKeepDrop(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"composition introduced an all-pairs join:\n$plan")
  }

  test("gopher rules fire in published order; keeps satisfy every rule (r9)") {
    val rows = Curation.curateGopherRules(spark, sfDir).collect()
    val reasons = rows.map(_.getAs[String]("reason")).toSet
    assert(reasons.subsetOf(Set("word_count", "mean_word_length",
      "symbol_ratio", "alpha_fraction", "stopwords", "keep")))
    val keeps = rows.filter(_.getAs[Boolean]("keep"))
    assert(keeps.nonEmpty && keeps.length < rows.length,
      s"rule battery must discriminate: ${keeps.length}/${rows.length} kept")
    // a kept doc passes the two rules the fixture can actually fail
    assert(keeps.forall { r =>
      val n = r.getAs[Int]("n_words")
      n >= 50 && n <= 100000 && r.getAs[Int]("n_stop") >= 2
    }, "a kept doc violates a rule")
    // per-row projection only: no exchange beyond the presentation sort
    val plan = Curation.curateGopherRules(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1,
      s"rule battery must not shuffle:\n$plan")
  }

  test("domain mixing hits each source's quota exactly and reproducibly (r9)") {
    val out = Curation.curateMixDomains(spark, sfDir)
    val kept = out.groupBy(col("source")).count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    // quotas replayed from the definition: budget = total/2, weight share
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    val counts = docs.groupBy(col("source")).count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val w = counts.keys.map(src => src -> ((src.drop(3).toInt % 3) + 1)).toMap
    val sumW = w.values.sum
    val budget = counts.values.sum / 2
    counts.keys.foreach { src =>
      val quota = math.min(counts(src), budget * w(src) / sumW)
      assert(kept.getOrElse(src, 0L) == quota,
        s"$src kept ${kept.getOrElse(src, 0L)}, quota $quota")
    }
    // the md5 rank makes the SAMPLE deterministic, not just the counts
    val a = out.collect().map(_.getAs[Long]("doc_id")).toSeq
    val b = Curation.curateMixDomains(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(a == b, "mixture sample must be reproducible run-to-run")
  }

  test("phash dedup: equal-content images collapse, keeper is the group min (r9)") {
    val rows = Multimodal.mmPhashDedup(spark, sfDir).collect()
    assert(rows.length == 500)
    val groups = rows.groupBy(_.getAs[Int]("ahash"))
    // the fixture repeats content patterns — real duplicate groups exist
    assert(groups.values.exists(_.length > 1), "no perceptual duplicates found")
    assert(rows.exists(_.getAs[Boolean]("is_dup")))
    groups.values.foreach { g =>
      val keepers = g.map(_.getAs[Long]("keeper")).distinct
      assert(keepers.length == 1 &&
        keepers.head == g.map(_.getAs[Long]("doc_id")).min,
        "keeper must be the group's min doc_id")
      assert(g.forall(_.getAs[Long]("n_same_hash") == g.length))
    }
  }

  test("knn join: every vector ranked, candidates bucket-blocked, ranks monotone (r9)") {
    val rows = Similarity.simKnnJoin(spark, sfDir).collect()
    val byVec = rows.groupBy(_.getAs[Long]("vec_id"))
    assert(byVec.size > 400, s"kNN graph covers the corpus: ${byVec.size} vectors")
    // ranks are 1..k and cosine is non-increasing within each vector
    byVec.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // the blocking is real: neighbors share the vector's 4-bit sign bucket
    val buckets = graft.model.Tables.load(spark, sfDir, "embeddings")
      .selectExpr("vec_id",
        """cast((case when element_at(embedding, 1) > 0 then 1 else 0 end) +
          |(case when element_at(embedding, 9) > 0 then 2 else 0 end) +
          |(case when element_at(embedding, 17) > 0 then 4 else 0 end) +
          |(case when element_at(embedding, 25) > 0 then 8 else 0 end) as int) as b""".stripMargin)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("b")).toMap
    assert(rows.forall(r =>
      buckets(r.getAs[Long]("vec_id")) == buckets(r.getAs[Long]("neighbor_id"))),
      "a neighbor escaped the LSH block")
  }

  test("winnowing: shared long runs share a fingerprint; density ~1/w; no shuffle (r9)") {
    import spark.implicits._
    // two docs sharing a 12-token run (>= w+k-1 = 8 tokens) MUST share a
    // winnowed fingerprint — the paper's theorem 1 guarantee; the third
    // doc is disjoint and must not collide
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight nine ten $shared eleven"),
      (3L, "completely different words with no overlap at all whatsoever here"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("/tmp/graft_winnow_spec/documents.parquet")
    val out = TextAnalysis.textWinnowing(spark, "/tmp/graft_winnow_spec")
    // rebuild the fingerprint SETS (the key outputs only count + sketch)
    val fps = docs
      .select(col("doc_id"), expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')").as("toks"))
      .withColumn("hashes", expr(
        """transform(sequence(1, size(toks) - 4),
          |  i -> substring(md5(concat_ws(' ', slice(toks, i, 5))), 1, 16))""".stripMargin))
      .withColumn("winnowed", expr(
        """array_distinct(transform(sequence(1, size(hashes) - 3),
          |  j -> array_min(slice(hashes, j, 4))))""".stripMargin))
      .select(col("doc_id"), col("winnowed")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[String](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "docs sharing a >= w+k-1 token run must share a winnowed fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint docs collided")
    // selected fingerprints are a small fraction of all k-gram hashes
    val rows = out.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Int]("n_grams"), r.getAs[Int]("n_fp"))).toMap
    assert(rows.values.forall { case (grams, fp) => fp < grams && fp > 0 })
    // plan shape on a FRESH DataFrame: an executed AQE plan prints its
    // Initial Plan section too and double-counts the one sort exchange
    val plan = TextAnalysis.textWinnowing(spark, "/tmp/graft_winnow_spec")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1,
      s"winnowing must stay per-row:\n$plan")
  }

  test("range search: thresholded, sort-free, and consistent with brute-force top-k (r9)") {
    val range = Similarity.simRangeSearch(spark, sfDir)
    val rows = range.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("cosine") >= 0.2499),
      "a below-threshold neighbor leaked through")
    // every top-k neighbor above the radius must appear in the range result
    val inRange = rows.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val topk = Similarity.simTopkBruteforce(spark, sfDir).collect()
      .filter(_.getAs[Double]("cosine") >= 0.2501)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    assert(topk.nonEmpty && topk.forall(inRange.contains),
      "range search missed a neighbor brute-force top-k found above the radius")
    // the whole point vs top-k: no per-query sort in the plan (the output
    // orderBy is the single presentation sort)
    val plan = range.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"range search must not rank:\n$plan")
  }

  test("boilerplate removal strips the planted banner, leaves unique docs intact (r9)") {
    import spark.implicits._
    // 4 docs share an 8-token banner prefix (df=4 >= 3); doc 9 is unique
    val banner = "subscribe to our newsletter accept all cookies"
    val docs = ((1L to 4L).map(i =>
      (i, s"$banner unique body $i alpha beta gamma delta epsilon zeta eta theta")) :+
      (9L, "entirely unique document body with no shared segments at all here"))
      .toDF("doc_id", "text")
    val out = Curation.curateBoilerplateOver(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segments"), r.getAs[Long]("n_removed"),
          r.getAs[String]("cleaned_fp"))).toMap
    (1L to 4L).foreach { i =>
      assert(out(i)._2 >= 1, s"doc $i kept the corpus-frequent banner segment")
      assert(out(i)._2 < out(i)._1, s"doc $i lost its unique tail")
    }
    assert(out(9L)._2 == 0, "unique doc was rewritten")
    // cleaned docs 1..4 still differ (their unique tails survive)
    assert((1L to 4L).map(out(_)._3).distinct.size == 4)
    // fixture run discriminates and stays linear (no all-pairs stage)
    val fix = Curation.curateBoilerplate(spark, sfDir)
    val rows = fix.collect()
    assert(rows.exists(_.getAs[Long]("n_removed") > 0) &&
      rows.exists(_.getAs[Long]("n_removed") == 0))
    val plan = fix.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"boilerplate must stay linear:\n$plan")
  }

  test("containment flags the quote-and-extend pair that jaccard misses (r9)") {
    import spark.implicits._
    val core = (1 to 30).map(i => s"core$i").mkString(" ")
    val tail = (1 to 200).map(i => s"extra$i").mkString(" ")
    val docs = Seq((1L, core), (2L, s"$core $tail"),
      (3L, (1 to 50).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cont = Dedup.dedupContainmentOver(spark, docs).collect()
      .map(r => (r.getAs[Long]("id_sub"), r.getAs[Long]("id_sup"),
        r.getAs[Double]("containment")))
    assert(cont.exists { case (sub, sup, c) => sub == 1L && sup == 2L && c == 1.0 },
      s"doc 1 is fully contained in doc 2: $cont")
    assert(!cont.exists { case (sub, _, _) => sub == 2L },
      "the long doc is not contained in the short one")
    // the symmetric measure misses it: J = |A|/|B| ≈ 0.12 << 0.6
    val jac = Dedup.dedupNgramJaccardOver(spark, docs).collect()
    assert(jac.isEmpty, s"jaccard should not fire on quote-and-extend: ${jac.toSeq}")
  }

  test("lm score: common-token docs outrank rare-token docs; keep is corpus-relative (r9)") {
    val rows = Curation.curateLmScore(spark, sfDir).collect()
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length,
      s"corpus-mean threshold must discriminate: $kept/${rows.length}")
    // score bounds: millibits per token of a 64-bit count is < 64000
    // (p*1000 + frac < (p+1)*1000 ≤ 64000); total = 0 only with 0 tokens
    assert(rows.forall { r =>
      val mb = r.getAs[Long]("avg_millibits")
      mb >= 0 && mb < 64000 &&
        ((r.getAs[Long]("total_millibits") == 0) == (r.getAs[Long]("n_tokens") == 0))
    })
    // the keep set is exactly the docs at/above the corpus mean
    val n = rows.length.toLong
    val sum = rows.map(_.getAs[Long]("avg_millibits")).sum
    assert(rows.forall(r =>
      r.getAs[Boolean]("keep") == (r.getAs[Long]("avg_millibits") * n >= sum)))
  }

  test("matryoshka: exact re-rank within tier-1 candidates; recall far above the LSH baseline (r9)") {
    val mrl = Similarity.simMatryoshka(spark, sfDir).collect()
    assert(mrl.length == 50, "10 queries x top-5")
    assert(mrl.forall(_.getAs[Int]("pre_rank") <= 20),
      "a neighbor outside the tier-1 candidate set leaked into the result")
    val got = mrl.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = Similarity.simTopkBruteforce(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    // measured 0.38 on the UNTRAINED isotropic fixture (the prefix carries
    // 16/64 of the signal); MRL-trained embeddings concentrate it. Floor
    // well above sim_lsh_ann's single-table 0.033, with slack for data.
    assert(recall >= 0.2, s"recall@5 $recall collapsed below the useful band")
  }

  test("ppl buckets: three non-degenerate tertiles strictly ordered by score (r9)") {
    val rows = Curation.queries("curate_ppl_buckets")(spark, sfDir).collect()
    val byBucket = rows.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getAs[Long]("avg_millibits"))).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"),
      s"a tertile is empty: ${byBucket.keySet}")
    // value cutoffs: ties share a bucket, sizes are ~n/3 within slack
    val n = rows.length
    byBucket.values.foreach(b =>
      assert(b.length > n / 5 && b.length < n / 2,
        s"degenerate tertile sizes: ${byBucket.view.mapValues(_.length).toMap}"))
    // buckets are ordered by score: min(head) > max(middle) > ... is too
    // strict only at the cutoff value itself, which belongs to the upper
    // bucket — so min(upper) must exceed every LOWER-bucket score
    assert(byBucket("head").min > byBucket("middle").max)
    assert(byBucket("middle").min > byBucket("tail").max)
  }

  test("prefix join is EXACT: equals brute force, keeps the pair the capped index must drop (r9)") {
    import spark.implicits._
    // 2 identical docs whose every shingle is shared by 28 more docs (df=30
    // > the cap of 20), so the capped inverted index holds NO entries for
    // them — plus disjoint filler so the corpus isn't degenerate
    val core = (1 to 30).map(i => s"c$i").mkString(" ")
    val docs = (Seq((1L, core), (2L, core)) ++
      (3L to 30L).map(i => (i, s"$core " + (1 to 200).map(j => s"t${i}x$j").mkString(" "))) ++
      (31L to 40L).map(i => (i, (1 to 40).map(j => s"u${i}x$j").mkString(" "))))
      .toDF("doc_id", "text")
    val got = Dedup.dedupPrefixJoinOver(spark, docs).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).toSet
    // brute force over the same shingle sets, replayed in plain Scala
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ").toSeq
      toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.collect().map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      c = (sets(a) & sets(b)).size; u = (sets(a) | sets(b)).size
      if c * 5 >= u * 3
    } yield (a, b, math.round(c.toDouble / u * 10000) / 10000.0)).toSet
    assert(got == want,
      s"prefix join must equal brute force: missing ${want -- got}, extra ${got -- want}")
    // the theorem's payoff: the (1,2) pair IS found here and is NOT
    // findable by the capped index (every shared shingle is over the cap)
    assert(got.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
    val capped = Dedup.dedupNgramJaccardOver(spark, docs).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(!capped.contains((1L, 2L)),
      "expected the capped index to drop the all-hot-shingle pair (else this spec is vacuous)")
    val plan = Dedup.dedupPrefixJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"prefix join must stay an equi-join:\n$plan")
  }

  test("knn classify: every held-out vector with candidates gets one majority verdict (r9)") {
    val rows = Similarity.queries("sim_knn_classify")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // one verdict per vector, vote counts within [1, k], held-out ids only
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length, "a vector got two verdicts")
    assert(ids.forall(_ % 10 == 3), "a labeled vector was classified")
    assert(rows.forall { r =>
      val v = r.getAs[Long]("n_votes"); v >= 1 && v <= 3 })
    assert(rows.forall(r => r.getAs[Boolean]("correct") ==
      (r.getAs[Int]("pred_label") == r.getAs[Int]("true_label"))))
    // determinism: a re-run yields the identical verdict set
    val again = Similarity.queries("sim_knn_classify")(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("url canonicalization collapses exactly the planted variant pairs (r10)") {
    val out = Dedup.dedupUrlCanonical(spark, sfDir).collect()
    assert(out.nonEmpty && out.length % 2 == 0)
    // each planted pair (2k lowercase-clean, 2k+1 cased+port+slash+utm)
    // must canonicalize identically — and NOTHING else may collide
    assert(out.forall(_.getAs[Long]("n_variants") == 2L),
      "every canonical group is exactly the planted pair")
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("keeper") == id - (id % 2),
        s"doc $id: keeper must be the even member")
      assert(r.getAs[Boolean]("is_dup") == (id % 2 == 1))
      val c = r.getAs[String]("canonical")
      assert(c == c.toLowerCase && !c.contains(":443") && !c.contains("utm_"),
        s"canonical still carries surface noise: $c")
      // params arrive sorted: a= before b=
      assert(c.indexOf("?a=") >= 0 && c.indexOf("&b=") > c.indexOf("?a="),
        s"query params not sorted in: $c")
    }
  }

  test("ANN recall@3 on the label-correlated fixture clears firm floors (r11)") {
    import spark.implicits._
    // The r10 verdict asked the sim_knn_classify treatment be extended to
    // the ANN tiers: on the GEOMETRIC fixture (10 separable sign-pattern
    // clusters — same construction as the knn test below), bucketing must
    // actually recover neighbors, so the floors here are firm numbers, not
    // the isotropic fixture's worst-case "above zero" sanity bounds.
    val dim = 64
    val vecs = (0L until 600L).map { i =>
      val c = ((i / 10) % 10).toInt
      val emb = Array.tabulate(dim) { d =>
        val center = if ((c * 13 + d * 7) % 10 < 5) 0.5f else -0.5f
        center + ((i * 31 + d * 17) % 21 - 10) / 100.0f
      }
      (i, emb, c)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_annfix_").toString
    try {
      vecs.toDF("vec_id", "embedding", "label")
        .write.parquet(s"$tmp/embeddings.parquet")
      def top3(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
        rows.filter(_.getAs[Int]("rank") <= 3)
          .groupBy(_.getAs[Long]("query_id"))
          .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
      val exact = top3(Similarity.simTopkBruteforce(spark, tmp).collect())
      assert(exact.nonEmpty)
      def recall(ann: Map[Long, Set[Long]]): Double = {
        val qs = exact.keySet
        qs.toSeq.map(q => (ann.getOrElse(q, Set.empty) & exact(q)).size.toDouble /
          exact(q).size).sum / qs.size
      }
      val ivf2 = recall(top3(Similarity.simIvfAnn(spark, tmp, nprobe = 2).collect()))
      val lshMt = recall(top3(Similarity.simLshMultitable(spark, tmp).collect()))
      val ivfpq = recall(top3(Similarity.simIvfPq(spark, tmp).collect()))
      info(f"clustered-fixture recall@3 — ivf(nprobe=2): $ivf2%.3f, lsh(4 tables): $lshMt%.3f, ivfpq: $ivfpq%.3f")
      // floors: the fixture is deterministic (measured 1.000 / 1.000 /
      // 0.933 at commit time); the floors leave margin for implementation
      // changes but fail any regression that loses real neighbors
      assert(ivf2 >= 0.90, f"IVF nprobe=2 recall $ivf2%.3f below 0.90 on separable clusters")
      assert(lshMt >= 0.80, f"4-table LSH recall $lshMt%.3f below 0.80 on separable clusters")
      assert(ivfpq >= 0.70, f"IVFPQ recall $ivfpq%.3f below 0.70 on separable clusters")
    } finally graft.sink.Sinks.deleteDir(tmp)
  }

  test("curate_token_budget: budgets conserve the corpus total, fill identifies both gaps (r11)") {
    val out = Curation.queries("curate_token_budget")(spark, sfDir).collect()
    assert(out.length >= 10, "5 langs x 3 tiers fixture should fill most cells")
    val totalTokens = out.map(_.getLong(3)).sum
    val budgets = out.map(_.getLong(4))
    // floored integer shares: budgets sum to within |cells| of the total
    assert(budgets.sum <= totalTokens && totalTokens - budgets.sum < out.length,
      s"budget conservation broken: ${budgets.sum} vs $totalTokens")
    // exact replay of each cell's budget and fill from the output itself
    val tw = out.map(r => r.getString(1) match {
      case "long" => 5L; case "mid" => 3L; case _ => 2L
    }).sum
    out.foreach { r =>
      val w = r.getString(1) match {
        case "long" => 5L; case "mid" => 3L; case _ => 2L
      }
      assert(r.getLong(4) == totalTokens * w / tw, s"budget at ${r.get(0)}/${r.get(1)}")
      assert(r.getLong(5) == r.getLong(3) * 1000000L / math.max(r.getLong(4), 1L),
        s"fill_ppm at ${r.get(0)}/${r.get(1)}")
    }
    // the report is informative: some cell is under target, some over
    assert(out.exists(_.getLong(5) < 1000000L), "no under-supplied cell")
    assert(out.exists(_.getLong(5) > 1000000L), "no over-supplied cell")
  }

  test("dedup_source_overlap: pair conservation against the LSH key, normalized pairs (r11)") {
    import org.apache.spark.sql.functions.col
    val overlap = Dedup.queries("dedup_source_overlap")(spark, sfDir).collect()
    val pairs = Dedup.queries("dedup_minhash_lsh")(spark, sfDir).collect()
    assert(overlap.nonEmpty && pairs.nonEmpty)
    // every verified near-dup pair is counted exactly once, somewhere
    assert(overlap.map(_.getLong(2)).sum == pairs.length,
      "pair totals must conserve against the LSH key's verified pairs")
    val srcOf = graft.model.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // full driver replay of the report from the pair list
    val want = pairs.map { p =>
      val (sa, sb) = (srcOf(p.getLong(0)), srcOf(p.getLong(1)))
      (if (sa <= sb) (sa, sb) else (sb, sa), (p.getLong(0), p.getLong(1)))
    }.groupBy(_._1)
    assert(overlap.length == want.size)
    overlap.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getString(0) <= r.getString(1), "pair not normalized")
      val ps = want(k)
      assert(r.getLong(2) == ps.length, s"pair count at $k")
      val docs = ps.flatMap(p => Seq(p._2._1, p._2._2)).distinct.length
      assert(r.getLong(3) == docs, s"distinct-doc count at $k")
    }
  }

  test("nearest-centroid classifier: >=0.9 accuracy on separable clusters, sane on testdata (r11)") {
    import spark.implicits._
    // the same geometric 10-cluster fixture the ANN floors use: Rocchio
    // must be near-perfect when classes are linearly separable spheres
    val dim = 64
    val vecs = (0L until 600L).map { i =>
      val c = ((i / 10) % 10).toInt
      val emb = Array.tabulate(dim) { d =>
        val center = if ((c * 13 + d * 7) % 10 < 5) 0.5f else -0.5f
        center + ((i * 31 + d * 17) % 21 - 10) / 100.0f
      }
      (i, emb, c)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_ncfix_").toString
    try {
      vecs.toDF("vec_id", "embedding", "label")
        .write.parquet(s"$tmp/embeddings.parquet")
      val out = Similarity.queries("sim_nearest_centroid")(spark, tmp).collect()
      assert(out.length == 120, "held-out split must be vec_id % 5 == 0")
      val acc = out.count(_.getBoolean(3)).toDouble / out.length
      info(f"nearest-centroid accuracy on separable clusters: $acc%.3f")
      assert(acc >= 0.9, f"accuracy $acc%.3f below 0.9 vs 0.10 chance")
      // every label serves as a centroid: predictions must span all classes
      assert(out.map(_.getInt(1)).distinct.length == 10)
    } finally graft.sink.Sinks.deleteDir(tmp)
    // on the isotropic driver testdata the classifier still runs end to
    // end and emits exactly the held-out rows
    val td = Similarity.queries("sim_nearest_centroid")(spark, sfDir).collect()
    val nTest = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") % 5 === 0).count()
    assert(td.length == nTest)
  }

  test("knn classify on a label-correlated fixture: accuracy far above the 1/10 chance baseline (r10)") {
    import spark.implicits._
    // The testdata embeddings assign labels independently of the isotropic
    // vectors, so the r9 spec could only pin the voting mechanism. This
    // fixture makes labels GEOMETRIC — 600 vectors in 10 sign-pattern
    // clusters (pseudo-random ±0.5 center signs per (cluster, dim), ±0.10
    // deterministic noise that can never flip a sign), label = cluster —
    // so a working propagator must recover held-out labels from embedding
    // space. Cluster id varies with i/10, independent of the i%10 holdout
    // split, so every cluster contributes held-out members.
    val dim = 64
    val vecs = (0L until 600L).map { i =>
      val c = ((i / 10) % 10).toInt
      val emb = Array.tabulate(dim) { d =>
        val center = if ((c * 13 + d * 7) % 10 < 5) 0.5f else -0.5f
        center + ((i * 31 + d * 17) % 21 - 10) / 100.0f
      }
      (i, emb, c)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_knnfix_").toString
    try {
      vecs.toDF("vec_id", "embedding", "label")
        .write.parquet(s"$tmp/embeddings.parquet")
      val out = Similarity.queries("sim_knn_classify")(spark, tmp).collect()
      assert(out.length == 60, "all held-out vectors classified")
      val acc = out.count(_.getAs[Boolean]("correct")).toDouble / out.length
      info(f"label-correlated fixture accuracy: $acc%.3f (chance baseline 0.10)")
      assert(acc >= 0.9,
        f"propagator accuracy $acc%.3f below 0.9 on geometrically separable clusters")
    } finally graft.sink.Sinks.deleteDir(tmp)
  }

  test("text_readability: score equals the Flesch formula over its own counts (r10)") {
    val rows = TextAnalysis.textReadability(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ns, nw, sy) = (r.getAs[Int]("n_sent"), r.getAs[Int]("n_words"),
        r.getAs[Int]("n_syll"))
      assert(ns >= 1 && nw >= 1)
      assert(sy >= nw / 4, s"doc ${r.get(0)}: implausibly few vowel groups")
      val want = BigDecimal(206.835 - 1.015 * (nw.toDouble / ns)
          - 84.6 * (sy.toDouble / nw))
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      // the engine rounds through DECIMAL(28,8) before the 4dp round; a
      // value on the half-way boundary can land one quantum away from
      // this double recompute — allow exactly that quantum
      assert(math.abs(r.getAs[Double]("flesch") - want) <= 1.01e-4,
        s"doc ${r.get(0)}: flesch ${r.getAs[Double]("flesch")} != $want")
    }
  }

  test("mm_audio_features: hand-walked fixture through the real PCM decode (r10)") {
    import Multimodal.WavCodec
    // tiny known signal: 2 channels, 6 frames of the (37f + 11c) generator
    val wav = WavCodec.encodeWav(8000, 2, 6)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val data = try in.readAllBytes() finally in.close()
    val samples = (0 until data.length / 2).map(j =>
      ((data(2 * j) & 0xff) | (data(2 * j + 1) << 8)).toShort.toInt)
    val expected = (0 until 6).flatMap(f => Seq(0, 1).map(c =>
      (f * 37 + c * 11) % 4096 - 2048))
    assert(samples == expected, "decoded PCM must equal the generator")
    // the per-channel zero-crossing walk the key performs: channel c's
    // series is samples at j % 2 == c
    val zc = Seq(0, 1).map { c =>
      val ser = samples.indices.filter(_ % 2 == c).map(samples)
      ser.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
    }.sum
    // generator starts at -2048 and climbs by 37/frame: no crossing in 6
    // frames — the sign structure is part of the fixture's point
    assert(zc == 0)
    val out = Multimodal.mmAudioFeatures(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("max_abs") <= 2048)
      assert(r.getAs[Long]("sum_abs") > 0)
      // long signals (200+ frames at +37/frame) wrap mod 4096 repeatedly:
      // real crossings must appear
      assert(r.getAs[Long]("n_zero_cross") > 0,
        s"doc ${r.get(0)}: no zero crossings in a wrapping signal")
    }
  }

  test("sim_mmr_rerank: driver-side greedy replay matches, diversification is non-vacuous (r11)") {
    val out = Similarity.queries("sim_mmr_rerank")(spark, sfDir).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 4))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).distinct.length == 4, "picks must be distinct docs")
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 4), "dense pick order")
    }
    // independent replay: quantize embeddings, rank top-8 by integer dot,
    // then run the greedy MMR loop in plain Scala
    val em = graft.model.Tables.load(spark, sfDir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1e6).toLong).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    var diversified = 0
    byQ.foreach { case (q, rs) =>
      val qv = em(q)
      val rel = em.view.filterKeys(_ != q)
        .map { case (id, v) => id -> dot(qv, v) }.toMap
      val cands = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(8)
      val candIds = cands.map(_._1)
      val topByRel = candIds.take(4)
      var sel = List(candIds.head) // pick 1 = argmax rel (sorted head)
      (2 to 4).foreach { _ =>
        val pick = candIds.filterNot(sel.contains).maxBy { c =>
          val ms = sel.map(sid => dot(em(c), em(sid))).max
          (rel(c) - ms, -c)
        }
        sel = sel :+ pick
      }
      val got = rs.sortBy(_.getInt(1)).map(_.getLong(2)).toList
      assert(got == sel, s"query $q: engine picked $got, replay says $sel")
      if (got != topByRel.toList) diversified += 1
    }
    // if MMR never re-orders the pure relevance top-4, the key is vacuous
    assert(diversified > 0, "MMR never diversified — fixture degenerate")
  }

  test("dataset card: per-source identities hold against driver recomputes (r12)") {
    val card = Curation.curateDatasetCard(spark, sfDir).collect()
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
      .select("source", "lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    assert(card.map(_.getString(0)).toSet == docs.keySet,
      "card must cover every source exactly once")
    card.foreach { r =>
      val g = docs(r.getString(0))
      assert(r.getLong(1) == g.length, "docs")
      assert(r.getLong(2) == g.map(_._2).distinct.length, "n_langs")
      assert(r.getLong(3) == g.map(_._3).sum, "total_chars")
      assert(r.getLong(4) == g.length - g.map(_._4).distinct.length, "dup_docs")
      // lower median over the sorted length multiset
      val lens = g.map(_._3).sorted
      assert(r.getLong(5) == lens((lens.length + 1) / 2 - 1), "median_chars")
      // Simpson ppm over lang counts, truncating
      val cs = g.groupBy(_._2).values.map(_.length.toLong)
      val want = cs.map(c => BigInt(c) * c).sum * 1000000 /
        (BigInt(g.length) * g.length)
      assert(BigInt(r.getLong(6)) == want, "lang_simpson_ppm")
      // bounds: a mixed source sits strictly inside (1/n_langs, 1]
      assert(r.getLong(6) > 0 && r.getLong(6) <= 1000000L, "simpson bounds")
    }
    // non-vacuity: a real language mix (else the Simpson column proves
    // nothing); the fixture has no exact duplicates, so dup_docs is
    // verified by the identity above (0 == 0 on every source)
    assert(card.exists(_.getLong(6) < 1000000L), "every source is single-lang")
  }

  test("PMI collocations: top lift equals the hand formula from raw counts (r12)") {
    val out = TextAnalysis.textPmiCollocations(spark, sfDir).collect()
    assert(out.length > 0 && out.length <= 40)
    // min support held, ranking non-increasing in lift
    assert(out.forall(_.getAs[Long]("n_pair") >= 5L))
    val lifts = out.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b },
      "rows not ordered by lift desc")
    // recompute the TOP pair's lift from independent raw counts
    val top = out.head
    val (w1, w2) = (top.getString(0), top.getString(1))
    val toks = graft.model.Tables.load(spark, sfDir, "documents")
      .select(expr("filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')").as("toks"))
      .collect().map(_.getSeq[String](0))
    val uTotal = toks.map(_.length.toLong).sum
    val bigrams = toks.filter(_.length >= 2).flatMap(t => t.zip(t.tail))
    val cAb = bigrams.count(p => p._1 == w1 && p._2 == w2).toLong
    val c1 = toks.map(_.count(_ == w1).toLong).sum
    val c2 = toks.map(_.count(_ == w2).toLong).sum
    val want = cAb.toDouble * uTotal / bigrams.length * uTotal / c1 / c2
    assert(cAb == top.getAs[Long]("n_pair"), "top pair count")
    assert(math.abs(top.getAs[Double]("lift") - want) < 1e-3,
      s"lift ${top.getAs[Double]("lift")} vs hand $want")
    // non-vacuity: lift actually separates pairs (not a constant column)
    assert(lifts.distinct.length > 1, "lift is degenerate")
    // plan: top-k compiles to TakeOrderedAndProject, never a global sort
    val plan = TextAnalysis.textPmiCollocations(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-40 is a full sort")
    assert(!plan.contains("CartesianProduct"), "all-pairs leak")
  }

  test("DSIR: the model recognizes its own target domain, keep is the mean cut (r12)") {
    val out = Curation.curateDsir(spark, sfDir).collect()
    val src = graft.model.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val target = Set("src0", "src1", "src2", "src3")
    val (tgt, rest) = out.partition(r => target(src(r.getAs[Long]("doc_id"))))
    assert(tgt.nonEmpty && rest.nonEmpty, "fixture lacks both slices")
    // THE DSIR contract: documents from the target domain score higher
    // under log(p_target/p_raw) than the rest — the importance weight
    // must recognize the distribution it was fit on, else selection is noise
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("dsir_millibits").toDouble).sum / rs.length
    assert(mean(tgt) > mean(rest),
      f"target mean ${mean(tgt)}%.0f <= rest mean ${mean(rest)}%.0f — model learned nothing")
    // keep = strictly-above-corpus-mean: both sides non-empty, and every
    // kept doc outscores every threshold-consistent dropped doc's bound
    val kept = out.filter(_.getAs[Int]("keep") == 1)
    val dropped = out.filter(_.getAs[Int]("keep") == 0)
    assert(kept.nonEmpty && dropped.nonEmpty, "degenerate keep split")
    val corpusMean = mean(out)
    assert(kept.forall(_.getAs[Long]("dsir_millibits") > corpusMean - 1),
      "a kept doc sits below the corpus mean")
    assert(dropped.forall(_.getAs[Long]("dsir_millibits") <= corpusMean + 1),
      "a dropped doc sits above the corpus mean")
    // the 256-row model must ride a broadcast join, never reshuffle tokens
    val plan = Curation.curateDsir(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "model join is not broadcast")
  }
}
