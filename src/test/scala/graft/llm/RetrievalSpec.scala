package graft.llm

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Behavior checks for the retrieval stack: an independent plain-Scala
  * replay of the BM25 scoring pipeline, and the RRF fusion algebra checked
  * row-by-row from the operator's own output columns. */
class RetrievalSpec extends SparkSpec {

  private def tokens(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  test("bm25: ranks contiguous, scores descending per query") {
    val out = Retrieval.textBm25(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length),
        s"query $q ranks must be contiguous from 1")
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q scores must be non-increasing in rank")
    }
  }

  test("bm25: the engine's top-10 replays from a plain-Scala reimplementation") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> tokens(r.getAs[String]("text")))
      .filter(_._2.nonEmpty)
    val nDocs = docs.length.toLong
    val nToks = docs.map(_._2.length.toLong).sum
    val tf = docs.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, g) => (d, t, g.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.length.toLong }
    val dl = docs.toMap.map { case (d, ts) => d -> ts.length.toLong }
    val queryId = docs.map(_._1).filter(_ < 10).min
    val qterms = docs.toMap.apply(queryId).distinct.sorted.take(5).toSet
    // identically-shaped double arithmetic, decimal(28,12) per-term cast,
    // exact decimal sum, HALF_UP round-4 — the operator's determinism
    // contract replayed outside Spark entirely
    val scores = tf.filter { case (d, t, _) => d != queryId && qterms(t) }
      .map { case (d, t, f) =>
        val idf = 1.0 + ((nDocs - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5)
        val norm = 0.3 + 0.9 * ((dl(d) * nDocs).toDouble / nToks.toDouble)
        val c = idf * ((f.toDouble * 2.2) / (f.toDouble + norm))
        d -> BigDecimal(c).setScale(12, RoundingMode.HALF_UP)
      }
      .groupBy(_._1).map { case (d, g) => d -> g.map(_._2).sum }
    val expected = scores.toSeq.sortBy { case (d, s) => (-s, d) }.take(10)
    val got = Retrieval.textBm25(spark, sfDir).collect()
      .filter(_.getAs[Long]("query_id") == queryId)
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(got.map(_._1).toSeq == expected.map(_._1),
      s"doc ranking must match the replay for query $queryId")
    got.zip(expected).foreach { case ((d, s), (_, e)) =>
      assert(s == e.setScale(4, RoundingMode.HALF_UP).toDouble,
        s"score mismatch for doc $d")
    }
  }

  test("hybrid_rrf: fused score is exactly the two-addend formula; ordering follows it") {
    val out = Retrieval.hybridRrf(spark, sfDir).collect()
    assert(out.nonEmpty)
    var both = 0; var single = 0
    out.foreach { r =>
      val b = if (r.isNullAt(r.fieldIndex("bm25_rank"))) None
        else Some(r.getAs[Int]("bm25_rank"))
      val v = if (r.isNullAt(r.fieldIndex("vec_rank"))) None
        else Some(r.getAs[Int]("vec_rank"))
      assert(b.isDefined || v.isDefined)
      if (b.isDefined && v.isDefined) both += 1 else single += 1
      val e = b.map(x => 1.0 / (60 + x).toDouble).getOrElse(0.0) +
        v.map(x => 1.0 / (60 + x).toDouble).getOrElse(0.0)
      val expected = BigDecimal(e).setScale(10, RoundingMode.HALF_UP)
        .setScale(6, RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rrf_score") == expected,
        s"rrf must equal its formula for ${r.getAs[Long]("doc_id")}")
    }
    assert(both > 0, "fusion must actually fuse: some doc ranked by both systems")
    assert(single > 0, "some doc must come from a single system (coalesce path)")
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
      val s = sorted.map(_.getAs[Double]("rrf_score"))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b },
        s"query $q fusion order must follow rrf desc")
    }
  }

  test("retrieval_maxsim: top-3 per query equals a driver-side MaxSim recompute (r10)") {
    import org.apache.spark.sql.functions.col
    val out = Retrieval.retrievalMaxsim(spark, sfDir).collect()
    assert(out.nonEmpty)
    // structural: full top-3, descending scores, no self-passage
    out.groupBy(_.getAs[Long]("query_doc")).foreach { case (q, rows) =>
      assert(rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Int]("rank")).toSeq
        == (1 to rows.length))
      val sc = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("maxsim"))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
      assert(rows.forall(_.getAs[Long]("doc") != q), "self-passage excluded")
    }
    // independent recompute: quantize, group into 8-token passages, exact
    // Σ-of-max over integer dots for every (query, candidate) pair
    val vecs = graft.model.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong).toArray)
    val passages = vecs.groupBy(_._1 / 8)
      .map { case (d, vs) => d -> vs.sortBy(_._1).map(_._2) }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val queries = passages.keys.filter(_ % 16 == 1)
    val expected = queries.flatMap { q =>
      passages.filter(_._1 != q).map { case (d, toks) =>
        (q, d, passages(q).map(qt => toks.map(ct => dot(qt, ct)).max).sum)
      }
    }.toSeq.groupBy(_._1).flatMap { case (q, cands) =>
      cands.sortBy(c => (-c._3, c._2)).take(3).zipWithIndex
        .map { case ((_, d, s), i) => (q, i + 1, d, s) }
    }.toSet
    val actual = out.map(r => (r.getAs[Long]("query_doc"), r.getAs[Int]("rank"),
      r.getAs[Long]("doc"), r.getAs[Long]("maxsim"))).toSet
    assert(actual == expected, "MaxSim top-3 must equal the exact recompute")
  }

  test("retrieval_mrr: exact reciprocal ranks, agreement with the bm25 top-10 (r11)") {
    val out = Retrieval.queries("retrieval_mrr")(spark, sfDir).collect()
    assert(out.length == 10, "one eval row per query")
    assert(out.exists(_.getLong(1) > 0) && out.exists(_.getLong(1) == 0),
      "fixture must produce both hits and misses or the metric is vacuous")
    out.foreach { r =>
      val rank = r.getLong(1); val n = r.getLong(2); val rr = r.getLong(3)
      assert(n >= 0 && n <= 10)
      if (rank == 0) assert(n == 0 && rr == 0)
      else {
        assert(rank >= 1 && rank <= 10 && n >= 1)
        assert(rr == 2520L / rank, s"rr_x2520 must be exact: $rr vs 2520/$rank")
        assert(2520L % rank == 0, "2520 is divisible by every rank in 1..10")
      }
    }
    // cross-check one hit against the independent bm25 key + raw sources
    val hit = out.find(_.getLong(1) > 0).get
    val qid = hit.getLong(0)
    val srcOf = graft.model.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val top = Retrieval.queries("text_bm25")(spark, sfDir).collect()
      .filter(_.getLong(0) == qid).sortBy(_.getInt(1))
    val firstRel = top.find(r => srcOf(r.getLong(2)) == srcOf(qid))
      .map(_.getInt(1).toLong).getOrElse(0L)
    assert(firstRel == hit.getLong(1),
      s"query $qid: first relevant rank disagrees with the bm25 key")
  }

  test("retrieval_hard_negatives: 1 pos + 4 negs per query, negs = best lexical non-positives (r11)") {
    val out = Retrieval.queries("retrieval_hard_negatives")(spark, sfDir)
      .collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 10, "one triple set per query")
    val bm25 = Retrieval.queries("text_bm25")(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    byQ.foreach { case (q, rows) =>
      val pos = rows.filter(_.getString(1) == "pos").map(_.getLong(3))
      val negs = rows.filter(_.getString(1) == "neg")
        .sortBy(_.getInt(2)).map(_.getLong(3))
      assert(pos.length == 1, s"query $q: exactly one positive")
      assert(negs.length == 4 && negs.distinct.length == 4,
        s"query $q: exactly four distinct negatives")
      assert(!negs.contains(pos.head),
        s"query $q: the positive leaked into the negatives")
      assert(!negs.contains(q), s"query $q: self-match as negative")
      // negatives preserve BM25 order and are drawn from its top-10
      val ranks = negs.map(bm25(q).indexOf).toSeq
      assert(ranks.forall(_ >= 0), s"query $q: negative outside the bm25 top-10")
      assert(ranks == ranks.sorted, s"query $q: negatives out of lexical order")
    }
  }
}
