package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural assertions on the planted skew patterns — the DuckDB oracle
  * already hash-checks both stress keys end to end; these tests pin WHY
  * the answers are right: the cap drops the corpus-hot phrase, the
  * at-boundary candidate mass produces no false pairs, the giant cluster
  * collapses to one label, and the chain clusters only transitively.
  */
class DedupStressSpec extends SparkSpec {

  test("skew ngram: chain links pair, chain ends don't, hot phrases add no pairs") {
    val pairs = DedupStress.dedupSkewNgram(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // adjacent chain links are pairs (J ≈ 0.636 ≥ 0.6)…
    assert(pairs.contains((1L, 11L)) && pairs.contains((11L, 21L)),
      "chain links missing")
    // …but the chain ENDS are not (J ≈ 0.385 < 0.6)
    assert(!pairs.contains((1L, 21L)), "chain ends must not pair directly")
    // the at-boundary phrase group (doc_id%25==3) shares only 2 retained
    // shingles — its cap²/2 candidate mass must produce NO new pairs
    // beyond what the base corpus already contains
    val basePairs = Dedup.dedupNgramJaccard(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val boundary = pairs.filter { case (a, b) => a % 25 == 3 && b % 25 == 3 }
    assert(boundary.subsetOf(basePairs),
      s"boundary-phrase group created pairs: ${(boundary -- basePairs).take(5)}")
    // the dropped phrases (universal + cap+1 group) change nothing either:
    // every new pair vs the base corpus involves a chain doc
    val newPairs = pairs -- basePairs
    assert(newPairs.forall { case (a, b) =>
      Set(1L, 11L, 21L).contains(a) || Set(1L, 11L, 21L).contains(b) },
      s"hot phrases created non-chain pairs: ${newPairs.take(5)}")
  }

  test("skew clusters: giant family is ONE cluster labeled 0; chain merges transitively") {
    val rows = DedupStress.dedupSkewClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = rows.map(t => t._1 -> t._2).toMap
    val n = rows.length
    // every 10th doc is the giant near-dup family → exactly one cluster,
    // labeled by its min member (doc 0), and only doc 0 keeps
    val giant = rows.filter(_._1 % 10 == 0)
    assert(giant.length == n / 10)
    assert(giant.forall(_._2 == 0L),
      s"giant family fragmented: labels ${giant.map(_._2).distinct.take(5).mkString(",")}")
    assert(giant.count(_._3) == 1 && giant.find(_._3).get._1 == 0L,
      "exactly doc 0 keeps the giant family")
    // the 15-doc chain: ends share nothing above threshold (J ≈ 0.46 < 0.5),
    // yet transitive clustering must pull all 15 into the min-labeled
    // cluster (3) — pair-level dedup has no single pair covering the ends
    val chain = (0 to 14).map(i => 3L + 10 * i)
    assert(chain.forall(byId(_) == 3L),
      s"chain fragmented: ${chain.map(c => s"$c->${byId(c)}").mkString(",")}")
  }

  test("cluster labels are invariant under the exact-dup pre-collapse (r6)") {
    // dedupClustersOver collapses identical texts to their min-doc_id
    // representative BEFORE LSH banding (same text ⇒ same bands ⇒ same
    // verified pairs, and cluster ids are component minima — so the
    // output is provably unchanged). Check that proof against an
    // INDEPENDENT reference: union-find on the driver over the
    // UN-collapsed pair list, exactly the r5 algorithm's input.
    val corpus = DedupStress.skewGiant(spark, sfDir)
    val fast = DedupStress.dedupSkewClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ids = corpus.select(col("doc_id")).collect().map(_.getLong(0))
    val edges = Dedup.dedupMinhashLshOver(spark, corpus)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = ids.map(i => i -> find(i)).toMap
    assert(fast == want,
      s"pre-collapsed labels diverge from the un-collapsed reference: " +
        s"${want.collect { case (k, v) if fast(k) != v => s"$k:${fast(k)}!=$v" }.take(5)}")
  }

  test("short/null-text duplicates stay singletons under pre-collapse (r7)") {
    // a doc below 3 tokens (or with NULL text) never enters LSH, so the
    // oracle labels each as its own singleton cluster with keep=true —
    // the collapse must therefore skip shingle-free docs entirely
    // (collapsing "hi there" x2 would mislabel doc 2 keep=false, and
    // md5(NULL) would weld docs 3 and 4 into one phantom group)
    import spark.implicits._
    val corpus = Seq(
      (1L, "hi there"), (2L, "hi there"),
      (3L, null.asInstanceOf[String]), (4L, null.asInstanceOf[String]),
      (5L, "the quick brown fox jumps over the lazy dog"),
      (6L, "the quick brown fox jumps over the lazy dog"),
      (7L, "a completely different sentence about spark engines"))
      .toDF("doc_id", "text")
    val byId = Dedup.dedupClustersOver(spark, corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(byId(id) == ((id, true)),
        s"shingle-free doc $id must be its own singleton, got ${byId(id)}")
    }
    // shingle-bearing exact dups DO collapse: 6 joins 5's cluster
    assert(byId(5L) == ((5L, true)) && byId(6L) == ((5L, false)),
      s"exact-dup pair mislabeled: 5=${byId(5L)} 6=${byId(6L)}")
    assert(byId(7L) == ((7L, true)))
  }
}
