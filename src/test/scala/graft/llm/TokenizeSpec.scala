package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.{BpeModel, BpeSupport}

/** BPE tokenizer semantics the oracle hash can't state directly: the greedy
  * apply loop's priority/tie/overlap rules, merge composition, and the
  * claim that motivates the operator — whitespace and BPE token counts
  * genuinely diverge on this fixture. */
class TokenizeSpec extends SparkSpec {

  private def enc(word: String, merges: (String, String)*): List[String] = {
    val syms = new java.util.ArrayList[String]()
    BpeSupport.encodeWord(word, syms, new BpeModel(merges.toArray))
    val b = List.newBuilder[String]
    syms.forEach(t => b += t)
    b.result()
  }

  test("greedy apply merges the best-ranked pair first, not left-to-right") {
    // (s,t) outranks (a,s): "ast" must merge st first, leaving a|st
    assert(enc("ast", ("s", "t"), ("a", "s")) == List("a", "st"))
    // flipping priorities flips the result
    assert(enc("ast", ("a", "s"), ("s", "t")) == List("as", "t"))
  }

  test("equal-rank occurrences merge leftmost-first (overlap rule)") {
    // "aaa" under (a,a): leftmost pair merges, survivor can't re-pair
    assert(enc("aaa", ("a", "a")) == List("aa", "a"))
    // "aaaa": two disjoint leftmost merges, then (aa,aa) is NOT a merge
    assert(enc("aaaa", ("a", "a")) == List("aa", "aa"))
  }

  test("merges compose hierarchically across rounds") {
    // (t,h) then (th,e) builds the 3-char token
    assert(enc("the", ("t", "h"), ("th", "e")) == List("the"))
    // without the second-level merge the word stays 2 tokens
    assert(enc("the", ("t", "h")) == List("th", "e"))
  }

  test("words without applicable merges stay character-split; 1-char words intact") {
    assert(enc("xyz", ("a", "b")) == List("x", "y", "z"))
    assert(enc("a", ("a", "a")) == List("a"))
  }

  test("trained table has ranked composing merges; both rounds contribute") {
    val merges = Tokenize.trainMerges(spark,
      graft.model.Tables.load(spark, sfDir, "documents"))
    assert(merges.length == 32, s"expected 16+16 merges, got ${merges.length}")
    // round-1 merges are single chars on both sides
    assert(merges.take(16).forall { case (l, r) => l.length == 1 && r.length == 1 })
    // round 2 must contain at least one COMPOSING merge (a multi-char side)
    assert(merges.drop(16).exists { case (l, r) => l.length > 1 || r.length > 1 },
      "round-2 merges never composed — the hierarchy is degenerate")
    // ranks are distinct pairs (no duplicate merge rule)
    assert(merges.distinct.length == merges.length)
  }

  test("whitespace and BPE token counts diverge on the fixture (the operator matters)") {
    val out = Tokenize.textTokenizeBpe(spark, sfDir)
      .agg(sum(col("n_ws")).as("ws"), sum(col("n_bpe")).as("bpe"))
      .collect()(0)
    val ws = out.getAs[Long]("ws")
    val bpe = out.getAs[Long]("bpe")
    assert(ws > 0 && bpe > 0)
    // subword segmentation yields materially more tokens than whitespace —
    // a packing budget sized in whitespace "tokens" would be off by >2x
    assert(bpe > 2 * ws, s"expected >2x divergence, got ws=$ws bpe=$bpe")
  }

  test("pack_sequences_bpe budgets by BPE counts and respects the 512 budget") {
    val packed = Tokenize.packSequencesBpe(spark, sfDir).cache()
    // offsets stay inside the budget and are consistent with counts
    assert(packed.filter(col("tok_offset") < 0 || col("tok_offset") >= 512).isEmpty)
    val viaWs = PipelinePrep.packSequences(spark, sfDir)
      .select(col("doc_id"), col("seq_id").as("ws_seq"))
    val joined = Tokenize.packSequencesBpe(spark, sfDir)
      .select(col("doc_id"), col("seq_id")).join(viaWs, Seq("doc_id"))
    // the BPE packing must place documents into LATER sequences (more
    // tokens per doc), proving the budget is measured in subword units
    assert(joined.filter(col("seq_id") > col("ws_seq")).count() > 0)
    packed.unpersist()
  }

  test("text_chunk_bpe tiles the subword stream: more chunks than whitespace chunking") {
    val bpeChunks = Tokenize.textChunkBpe(spark, sfDir)
    // window arithmetic holds on the subword stream
    assert(bpeChunks.filter(col("n_chunk_tokens") < 1 ||
      col("n_chunk_tokens") > 64).isEmpty)
    // >2x the tokens (divergence test above) must yield materially more
    // 64-token windows than whitespace chunking of the same corpus
    val nBpe = bpeChunks.count()
    val nWs = PipelinePrep.textChunk(spark, sfDir).count()
    assert(nBpe > nWs,
      s"BPE chunking must emit more windows than whitespace ($nBpe vs $nWs)")
  }

  test("tokenize plan is a single scan projection — no exchange before the sort") {
    val plan = Tokenize.textTokenizeBpe(spark, sfDir)
      .queryExecution.executedPlan.toString
    // one presentation sort; the tokenizing projection itself never shuffles
    assert(plan.contains("graft_bpe"), s"custom expression missing from plan:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"tokenization must not shuffle the corpus:\n$plan")
  }

  test("tokenizer fertility: identities vs the per-doc tokenize key, sane ranges (r11)") {
    val fert = Tokenize.queries("curate_tokenizer_fertility")(spark, sfDir).collect()
    assert(fert.nonEmpty)
    // cross-foot against the independent per-doc key joined to langs
    val perDoc = Tokenize.queries("text_tokenize_bpe")(spark, sfDir)
      .join(graft.model.Tables.load(spark, sfDir, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang")), Seq("doc_id"))
      .collect().groupBy(_.getAs[String]("lang"))
    fert.foreach { r =>
      val lang = r.getString(0)
      val docs = perDoc(lang)
      assert(r.getLong(1) == docs.length.toLong)
      val sumWs = docs.map(_.getAs[Long]("n_ws")).sum
      val sumBpe = docs.map(_.getAs[Long]("n_bpe")).sum
      assert(r.getLong(2) == sumWs && r.getLong(4) == sumBpe)
      // exact truncating per-mille identities
      assert(r.getLong(5) == sumBpe * 1000 / sumWs)
      assert(r.getLong(6) == r.getLong(3) * 1000 / sumBpe)
      // BPE merges can only FUSE characters: 1 <= tokens/word (>=1000pm)
      // and chars/token >= 1000pm on a lowercase-word corpus
      assert(r.getLong(5) >= 1000L, s"$lang: a word tokenizes to >= 1 token")
      assert(r.getLong(6) >= 1000L, s"$lang: a token spans >= 1 char")
    }
  }

  private def wpEnc(word: String, initial: Seq[String],
      cont: Seq[String]): List[String] = {
    val sb = new java.lang.StringBuilder()
    graft.expressions.WordPieceSupport.encodeWord(word, sb,
      new graft.expressions.WordPieceModel(initial.toArray, cont.toArray))
    sb.toString.split('|').toList
  }

  test("WordPiece greedy longest-match-first with position-split vocab (r12)") {
    // longest match wins at the word start even when shorter pieces exist
    assert(wpEnc("unhappy", Seq("u", "un", "unh"), Seq("a", "h", "p", "y", "happy"))
      == List("unh", "##a", "##p", "##p", "##y"))
    // a piece available only as CONTINUATION must not match word-initially
    assert(wpEnc("abc", Seq("a"), Seq("a", "b", "c", "bc"))
      == List("a", "##bc"))
    // char fallback keeps the encode total on unseen characters
    assert(wpEnc("axb", Seq("a"), Seq("b")) == List("a", "##x", "##b"))
  }

  test("WordPiece vs BPE: same word boundaries, comparable doc grain (r12)") {
    val bpe = Tokenize.queries("text_tokenize_bpe")(spark, sfDir)
      .select(col("doc_id"), col("n_ws"), col("n_bpe")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wp = Tokenize.queries("text_tokenize_wordpiece")(spark, sfDir)
      .select(col("doc_id"), col("n_ws"), col("n_wp")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bpe.keySet == wp.keySet)
    bpe.foreach { case (id, (ws, nbpe)) =>
      val (ws2, nwp) = wp(id)
      assert(ws == ws2, s"doc $id: word boundaries must agree")
      // both schemes only fuse characters within words: counts >= words
      assert(nbpe >= ws && nwp >= ws, s"doc $id: subwords below word count")
    }
    // the schemes must genuinely differ somewhere (else the second
    // tokenizer is the first with extra steps)
    assert(bpe.exists { case (id, (_, nbpe)) => wp(id)._2 != nbpe },
      "WordPiece and BPE token counts identical on every doc")
    // fertility-compare cross-foot: per-lang sums equal the doc-grain keys
    val cmp = Tokenize.queries("curate_fertility_compare")(spark, sfDir).collect()
    val docsByLang = graft.model.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet)
    cmp.foreach { r =>
      val ids = docsByLang(r.getString(0))
      assert(r.getAs[Long]("sum_bpe") == ids.toSeq.map(bpe(_)._2).sum)
      assert(r.getAs[Long]("sum_wp") == ids.toSeq.map(wp(_)._2).sum)
    }
  }

  test("viterbi decode: beats greedy on the planted trap, never loses on the corpus (r12)") {
    import graft.expressions.{ViterbiSupport, WordPieceModel, WordPieceSupport}
    // planted greedy trap: greedy eats the long initial piece 'abc' and the
    // remainder 'de' fragments to chars (3 pieces); the shortest path is
    // a + bcde (2 pieces)
    val trap = new WordPieceModel(Array("abc", "a"),
      Array("bcde", "b", "c", "d", "e"))
    def enc(f: (String, java.lang.StringBuilder, WordPieceModel) => Unit,
        w: String, m: WordPieceModel): String = {
      val sb = new java.lang.StringBuilder; f(w, sb, m); sb.toString
    }
    assert(enc(WordPieceSupport.encodeWord, "abcde", trap) == "abc|##d|##e",
      "greedy must fall into the trap")
    assert(enc(ViterbiSupport.encodeWord, "abcde", trap) == "a|##bcde",
      "viterbi must find the 2-piece shortest path")
    // deterministic tie rule: among shortest paths take the longest piece
    // at each position — 'ab' alone (1 piece) beats any split
    val tie = new WordPieceModel(Array("ab", "a"), Array("b"))
    assert(enc(ViterbiSupport.encodeWord, "ab", tie) == "ab")
    // off-corpus char fallback stays total and counts like greedy's
    assert(enc(ViterbiSupport.encodeWord, "axb", tie) == "a|##x|##b")
    // corpus-level optimality: per doc the viterbi count never exceeds the
    // greedy count on the SAME inventory (the key's defining inequality),
    // and both engines' token streams reassemble the same words
    val rows = Tokenize.queries("text_tokenize_unigram")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (wp, uni) = (r.getAs[Long]("n_wp"), r.getAs[Long]("n_uni"))
      assert(uni <= wp,
        s"doc ${r.getAs[Long]("doc_id")}: viterbi $uni > greedy $wp — not optimal")
      assert(uni >= r.getAs[Long]("n_ws"),
        "a word cannot encode to fewer than one piece")
    }
    val gaps = rows.count(r => r.getAs[Long]("n_uni") < r.getAs[Long]("n_wp"))
    info(s"docs where viterbi strictly beats greedy: $gaps / ${rows.length}")
  }
}
