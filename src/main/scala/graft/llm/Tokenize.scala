package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.expressions.BpeTokenize
import graft.model.Tables.load

/** Deterministic subword (BPE) tokenization — the operator that turns the
  * whitespace "token" counts of pack_sequences / text_chunk into real
  * subword counts (whitespace under-counts CJK and code by 2-5x on real
  * corpora; the TokenizeSpec divergence assert pins that the two counts
  * genuinely differ on this fixture too).
  *
  * Training (trainMerges): two batched rounds of BPE merge derivation,
  * each round = count adjacent symbol pairs over the CURRENT segmentation
  * of the vocabulary weighted by word frequency, keep the top-K by
  * (count DESC, left ASC, right ASC — binary string order, identical in
  * Spark and DuckDB on this ASCII corpus). Round 1 sees the character
  * segmentation (pairs = 2-char substrings); round 2 re-segments the vocab
  * under round-1 merges, so its pairs COMPOSE (up to 4-char symbols) —
  * the hierarchical structure real BPE training (one merge per round)
  * produces, batched K-at-a-time so the oracle can replay training as two
  * aggregations instead of K1+K2 recursions. Production note: more rounds
  * = same machinery; the APPLY path (BpeTokenize) takes any pair-merge
  * table, including a real 50k-merge GPT-class one.
  *
  * Topology at 100 TB: training is ONE corpus scan (word-count hash agg
  * with map-side combine) — every later step runs on the VOCABULARY
  * (distinct words), which is MBs, not TBs; the ranked table (a few dozen
  * rows here, 50k in production) collects to the driver as model
  * parameters and rides into the scan expression like a broadcast.
  * Encoding is then a single codegen projection over the corpus — no
  * shuffle, no state.
  *
  * Oracle: DuckDB replays training with the same two aggregations and
  * replays the greedy apply as a bounded recursive CTE (one leftmost
  * best-ranked merge per step — see bpeCte), then reassembles per-document
  * token streams from the vocabulary, so n_bpe and the md5 of the full
  * token stream match bit-for-bit.
  */
object Tokenize {

  type Q = (SparkSession, String) => DataFrame

  private val K1 = 16
  private val K2 = 16

  private def bpeCol(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokenize(ColumnBridge.expression(c), merges))

  /** Derive the ranked merge table from the corpus: top-K1 character
    * bigrams, then top-K2 adjacent symbol pairs under the round-1
    * segmentation (ranks K1+1..). Ties break on (left, right) binary
    * order — the exact ordering the oracle's ROW_NUMBER states. */
  def trainMerges(s: SparkSession, docs: DataFrame): Seq[(String, String)] =
    trainModel(s, docs)._2

  /** The shared trainer: (checkpointed word-count vocabulary, ranked
    * merges). Exposed so WordPiece derivation reuses the ONE corpus scan
    * instead of re-counting words. */
  private[llm] def trainModel(s: SparkSession, docs: DataFrame)
      : (DataFrame, Seq[(String, String)]) = {
    // the one corpus-wide pass: word counts (map-side combining hash agg);
    // everything after runs on the small distinct-word vocabulary
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .localCheckpoint() // read by both training rounds; vocab is small

    def topPairs(pairs: DataFrame, k: Int): Seq[(String, String)] =
      pairs.groupBy(col("l"), col("r")).agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(k)
        .collect() // k-row model table, the merge "vocabulary" — not data
        .map(row => (row.getString(0), row.getString(1)))
        .toSeq

    val m1 = topPairs(
      vocab.filter(length(col("w")) >= 2)
        .select(col("wc"), explode(expr(
          "transform(sequence(1, length(w) - 1)," +
            " i -> struct(substring(w, i, 1) AS l, substring(w, i + 1, 1) AS r))"))
          .as("p"))
        .select(col("wc"), col("p.l").as("l"), col("p.r").as("r")),
      K1)

    val m2 = topPairs(
      vocab
        .withColumn("toks", split(bpeCol(col("w"), m1), "\\|"))
        .filter(size(col("toks")) >= 2)
        .select(col("wc"), explode(expr(
          "transform(sequence(1, size(toks) - 1)," +
            " i -> struct(element_at(toks, i) AS l, element_at(toks, i + 1) AS r))"))
          .as("p"))
        .select(col("wc"), col("p.l").as("l"), col("p.r").as("r")),
      K2)

    (vocab, m1 ++ m2)
  }

  /** WordPiece piece budget per position class — the vocabulary-size
    * knob every real WordPiece carries (BERT: 30k). Pruning is what makes
    * the scheme a DIFFERENT tokenizer from BPE: dropped rare pieces force
    * greedy longest-match onto other splits (an unpruned BPE-symbol vocab
    * reproduces the BPE segmentation on its own training corpus —
    * measured: 0 diverging docs). */
  private val WpBudget = 24

  /** WordPiece vocabulary from the SAME training scan: BPE-segment the
    * word vocabulary under the trained merges, rank word-initial and
    * continuation symbols separately by corpus frequency, keep the top
    * [[WpBudget]] of each, and add every corpus character to both as the
    * totality fallback (the oracle's guaranteed LATERAL match). All
    * vocabulary-grain — no second corpus scan; the collects are model
    * tables (dozens of pieces), not data. */
  private[llm] def trainWordPiece(s: SparkSession, docs: DataFrame)
      : (Seq[(String, String)], Seq[String], Seq[String]) = {
    val (vocab, merges) = trainModel(s, docs)
    val seg = vocab
      .withColumn("toks", split(bpeCol(col("w"), merges), "\\|"))
      .select(col("wc"), col("toks")).localCheckpoint()
    val chars = vocab.select(explode(expr(
      "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("p"))
      .distinct()
    def pieces(df: DataFrame): Seq[String] =
      df.groupBy(col("p")).agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("p")).limit(WpBudget)
        .select(col("p")).union(chars).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
    val initial = pieces(seg.select(element_at(col("toks"), 1).as("p"),
      col("wc")))
    val cont = pieces(seg.select(explode(
        expr("slice(toks, 2, greatest(size(toks) - 1, 0))")).as("p"),
      col("wc")))
    (merges, initial, cont)
  }

  private def wpCol(c: Column, initial: Seq[String],
      cont: Seq[String]): Column =
    ColumnBridge.column(graft.expressions.WordPieceTokenize(
      ColumnBridge.expression(c), initial, cont))

  /** BPE token count from the joined token string: tokens are separated by
    * '|' within a word and ' ' across words (neither occurs inside a
    * token on this corpus — text is [a-z ]), so count = separators + 1. */
  private def nTokens(tok: Column): Column =
    when(tok === "", lit(0L))
      .otherwise(size(split(tok, "[ |]")).cast("long"))

  // ---- text_tokenize_bpe ----------------------------------------------------
  def textTokenizeBpe(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val merges = trainMerges(s, docs)
    docs
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long")
          .as("n_ws"),
        bpeCol(col("text"), merges).as("tok"))
      .select(col("doc_id"), col("n_ws"), nTokens(col("tok")).as("n_bpe"),
        md5(col("tok").cast("binary")).as("tok_md5"))
      .orderBy(col("doc_id"))
  }

  // ---- pack_sequences_bpe ---------------------------------------------------
  // pack_sequences re-keyed on REAL subword counts: same one-exchange
  // shard + spillable sort + O(1) running-sum window topology
  // (PipelinePrep.packSequences), but the 512-token budget now measures
  // BPE tokens, so packing density is what the trainer actually sees.
  def packSequencesBpe(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val merges = trainMerges(s, docs)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        bpeCol(col("text"), merges).as("tok"))
      .withColumn("n_tokens", nTokens(col("tok")))
      .drop("tok")
      .withColumn("start_off",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", expr("start_off div 512"))
      .withColumn("tok_offset", col("start_off") - col("seq_id") * 512)
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("seq_id"), col("tok_offset"))
      .orderBy(col("doc_id"))
  }

  // ---- text_chunk_bpe -------------------------------------------------------
  // text_chunk re-keyed on real subword units: the per-doc BPE token
  // sequence (order preserved) is cut into 64-token windows on a 48-token
  // stride, each chunk fingerprinted — so a RAG index built from these
  // chunks aligns with what an embedding model actually consumes. Same
  // shuffle-free per-row explode topology as text_chunk.
  def textChunkBpe(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val merges = trainMerges(s, docs)
    docs
      .select(col("doc_id"), bpeCol(col("text"), merges).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), split(col("tok"), "[ |]").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(0, (size(toks) - 1) div 48)")).as("chunk_seq"))
      .select(col("doc_id"), col("chunk_seq"),
        size(expr("slice(toks, chunk_seq * 48 + 1, 64)")).as("n_chunk_tokens"),
        md5(concat_ws(" ", expr("slice(toks, chunk_seq * 48 + 1, 64)"))
          .cast("binary")).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_seq"))
  }

  /** Shared oracle prefix: training (two aggregations) + greedy apply
    * (bounded recursive CTE — one leftmost best-ranked merge per step,
    * terminating with done = TRUE when no adjacent pair is in the table)
    * + per-word token strings. Ends with the `wtok` relation
    * (w, wtok '|'-joined, ntok). */
  private val bpeCte =
    s"""WITH RECURSIVE
       |words AS (
       |  SELECT doc_id, w, pos FROM (
       |    SELECT doc_id,
       |           unnest(string_split(text, ' ')) AS w,
       |           unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
       |    FROM documents) t
       |  WHERE w <> ''),
       |vocab AS (SELECT w, COUNT(*) AS wc FROM words GROUP BY w),
       |p1c AS (
       |  SELECT w, wc, unnest(generate_series(1, length(w) - 1)) AS i FROM vocab),
       |p1 AS (
       |  SELECT substr(w, i, 1) AS l, substr(w, i + 1, 1) AS r, SUM(wc) AS cnt
       |  FROM p1c GROUP BY 1, 2),
       |m1 AS (
       |  SELECT l, r, ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) AS rank
       |  FROM p1
       |  QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) <= $K1),
       |apply1 AS (
       |  SELECT w, string_split(w, '') AS syms, FALSE AS done FROM vocab
       |  UNION ALL
       |  SELECT a.w,
       |         CASE WHEN b.i IS NULL THEN a.syms
       |              ELSE a.syms[1:b.i-1] || [a.syms[b.i] || a.syms[b.i+1]] ||
       |                   a.syms[b.i+2:] END,
       |         b.i IS NULL
       |  FROM apply1 a LEFT JOIN LATERAL (
       |    SELECT pos.i
       |    FROM (SELECT unnest(generate_series(1, len(a.syms) - 1)) AS i) pos
       |    JOIN m1 ON m1.l = a.syms[pos.i] AND m1.r = a.syms[pos.i + 1]
       |    ORDER BY m1.rank, pos.i LIMIT 1) b ON TRUE
       |  WHERE NOT a.done),
       |p2c AS (
       |  SELECT v.wc, t.syms, unnest(generate_series(1, len(t.syms) - 1)) AS i
       |  FROM (SELECT w, syms FROM apply1 WHERE done) t
       |  JOIN vocab v ON v.w = t.w),
       |p2 AS (
       |  SELECT syms[i] AS l, syms[i + 1] AS r, SUM(wc) AS cnt
       |  FROM p2c GROUP BY 1, 2),
       |m2 AS (
       |  SELECT l, r, $K1 + ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) AS rank
       |  FROM p2
       |  QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) <= $K2),
       |merges AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2),
       |apply2 AS (
       |  SELECT w, string_split(w, '') AS syms, FALSE AS done FROM vocab
       |  UNION ALL
       |  SELECT a.w,
       |         CASE WHEN b.i IS NULL THEN a.syms
       |              ELSE a.syms[1:b.i-1] || [a.syms[b.i] || a.syms[b.i+1]] ||
       |                   a.syms[b.i+2:] END,
       |         b.i IS NULL
       |  FROM apply2 a LEFT JOIN LATERAL (
       |    SELECT pos.i
       |    FROM (SELECT unnest(generate_series(1, len(a.syms) - 1)) AS i) pos
       |    JOIN merges m ON m.l = a.syms[pos.i] AND m.r = a.syms[pos.i + 1]
       |    ORDER BY m.rank, pos.i LIMIT 1) b ON TRUE
       |  WHERE NOT a.done),
       |wtok AS (
       |  SELECT w, array_to_string(syms, '|') AS wtok, len(syms) AS ntok
       |  FROM apply2 WHERE done)""".stripMargin

  private val textTokenizeBpeOracle =
    s"""$bpeCte,
       |perdoc AS (
       |  SELECT d.doc_id,
       |         CAST(COUNT(*) AS BIGINT) AS n_ws,
       |         CAST(SUM(t.ntok) AS BIGINT) AS n_bpe,
       |         string_agg(t.wtok, ' ' ORDER BY d.pos) AS joined
       |  FROM words d JOIN wtok t ON t.w = d.w
       |  GROUP BY d.doc_id)
       |SELECT doc.doc_id,
       |       COALESCE(p.n_ws, 0) AS n_ws,
       |       COALESCE(p.n_bpe, 0) AS n_bpe,
       |       md5(COALESCE(p.joined, '')) AS tok_md5
       |FROM documents doc LEFT JOIN perdoc p ON p.doc_id = doc.doc_id
       |ORDER BY doc.doc_id""".stripMargin

  private val packSequencesBpeOracle =
    s"""$bpeCte,
       |perdoc AS (
       |  SELECT d.doc_id, CAST(SUM(t.ntok) AS BIGINT) AS n_bpe
       |  FROM words d JOIN wtok t ON t.w = d.w
       |  GROUP BY d.doc_id),
       |t AS (
       |  SELECT doc.doc_id, doc.doc_id % 8 AS shard,
       |         COALESCE(p.n_bpe, 0) AS n_tokens
       |  FROM documents doc LEFT JOIN perdoc p ON p.doc_id = doc.doc_id),
       |r AS (
       |  SELECT doc_id, shard, n_tokens,
       |         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
       |              - n_tokens AS BIGINT) AS start_off
       |  FROM t)
       |SELECT doc_id, shard, n_tokens,
       |       start_off // 512 AS seq_id,
       |       start_off - (start_off // 512) * 512 AS tok_offset
       |FROM r ORDER BY doc_id""".stripMargin

  private val textChunkBpeOracle =
    s"""$bpeCte,
       |perdoc AS (
       |  SELECT d.doc_id, string_agg(t.wtok, ' ' ORDER BY d.pos) AS joined
       |  FROM words d JOIN wtok t ON t.w = d.w
       |  GROUP BY d.doc_id),
       |tl AS (
       |  SELECT doc_id, string_split_regex(joined, '[ |]') AS toks
       |  FROM perdoc WHERE joined <> ''),
       |c AS (
       |  SELECT doc_id, toks,
       |         unnest(generate_series(0, (len(toks) - 1) // 48)) AS chunk_seq
       |  FROM tl WHERE len(toks) > 0)
       |SELECT doc_id, chunk_seq,
       |       len(list_slice(toks, chunk_seq * 48 + 1, chunk_seq * 48 + 64)) AS n_chunk_tokens,
       |       md5(array_to_string(list_slice(toks, chunk_seq * 48 + 1, chunk_seq * 48 + 64), ' ')) AS chunk_fp
       |FROM c ORDER BY doc_id, chunk_seq""".stripMargin

  // ---- curate_tokenizer_fertility -------------------------------------------
  // Tokenizer FERTILITY per language — tokens/word and chars/token, the
  // monitor that catches a tokenizer mis-serving a language slice (a
  // vocabulary trained corpus-wide over-fragments minority languages:
  // fertility climbs, effective context shrinks, training cost per
  // useful character rises — the metric multilingual tokenizer papers
  // report). Rides the SAME trained merges + per-word token counts as
  // text_tokenize_bpe (the wtok word-grain join — tokenization cost is
  // vocabulary-grain, not corpus-grain); ratios are frozen as integer
  // PER-MILLE via truncating division, so both engines compare exact
  // integers. One (doc→lang)-grain agg after the word join — no second
  // corpus scan.
  def curateTokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val merges = trainMerges(s, docs)
    docs
      .select(col("lang"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long")
          .as("n_ws"),
        length(col("text")).cast("long").as("n_chars"),
        bpeCol(col("text"), merges).as("tok"))
      .select(col("lang"), col("n_ws"), col("n_chars"),
        nTokens(col("tok")).as("n_bpe"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_ws")).as("sum_words"),
        sum(col("n_chars")).as("sum_chars"), sum(col("n_bpe")).as("sum_bpe"))
      .withColumn("toks_per_word_pm",
        expr("sum_bpe * 1000 div sum_words"))
      .withColumn("chars_per_tok_pm",
        expr("sum_chars * 1000 div sum_bpe"))
      .orderBy(col("lang"))
  }

  private val curateTokenizerFertilityOracle =
    s"""$bpeCte,
       |perdoc AS (
       |  SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ws,
       |         CAST(SUM(t.ntok) AS BIGINT) AS n_bpe
       |  FROM words d JOIN wtok t ON t.w = d.w
       |  GROUP BY 1),
       |base AS (
       |  SELECT doc.lang, COALESCE(p.n_ws, 0) AS n_ws,
       |         COALESCE(p.n_bpe, 0) AS n_bpe,
       |         CAST(length(doc.text) AS BIGINT) AS n_chars
       |  FROM documents doc LEFT JOIN perdoc p ON p.doc_id = doc.doc_id)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_ws) AS BIGINT) AS sum_words,
       |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |       CAST(SUM(n_bpe) AS BIGINT) AS sum_bpe,
       |       CAST(SUM(n_bpe) * 1000 // SUM(n_ws) AS BIGINT) AS toks_per_word_pm,
       |       CAST(SUM(n_chars) * 1000 // SUM(n_bpe) AS BIGINT) AS chars_per_tok_pm
       |FROM base GROUP BY lang ORDER BY lang""".stripMargin

  // ---- text_tokenize_wordpiece ----------------------------------------------
  // WordPiece beside BPE — the BERT-family greedy longest-match-first
  // subword encode (graft.expressions.WordPieceTokenize), vocabulary
  // derived from the same one-scan trainer. Same doc-grain contract as
  // text_tokenize_bpe (whitespace count, subword count, token-stream md5)
  // so the two tokenizers are directly comparable row by row; encoding is
  // again one codegen projection over the corpus.
  def textTokenizeWordpiece(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val (_, initial, cont) = trainWordPiece(s, docs)
    docs
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long")
          .as("n_ws"),
        wpCol(col("text"), initial, cont).as("tok"))
      .select(col("doc_id"), col("n_ws"), nTokens(col("tok")).as("n_wp"),
        md5(col("tok").cast("binary")).as("tok_md5"))
      .orderBy(col("doc_id"))
  }

  // ---- text_tokenize_unigram --------------------------------------------------
  // The THIRD tokenizer family beside BPE and greedy WordPiece: unigram-LM
  // Viterbi decode (Kudo 2018 / SentencePiece-unigram) under a uniform
  // piece prior over the SAME trained inventory — uniform prior makes the
  // Viterbi objective exactly "fewest pieces", which keeps the whole
  // segmentation in integers (no log-prob floats to align across engines)
  // while staying a true optimal decode: per doc, n_uni ≤ n_wp by
  // construction, and the delta IS the greedy approximation loss, emitted
  // side by side so the comparison is a relation, not a prose claim.
  // Encoding stays one codegen projection (graft.expressions
  // .ViterbiTokenize — backward DP + deterministic longest-on-shortest-
  // path reconstruction per word, O(len·maxPiece) per row, no shuffle);
  // the oracle replays the identical DP as a recursive CTE carrying each
  // word's suffix-cost table as a LIST, then reconstructs with the same
  // tie rule.
  def textTokenizeUnigram(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val (_, initial, cont) = trainWordPiece(s, docs)
    docs
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long")
          .as("n_ws"),
        wpCol(col("text"), initial, cont).as("tw"),
        vitCol(col("text"), initial, cont).as("tu"))
      .select(col("doc_id"), col("n_ws"), nTokens(col("tw")).as("n_wp"),
        nTokens(col("tu")).as("n_uni"),
        md5(col("tu").cast("binary")).as("tok_md5"))
      .orderBy(col("doc_id"))
  }

  private def vitCol(c: Column, initial: Seq[String],
      cont: Seq[String]): Column =
    ColumnBridge.column(graft.expressions.ViterbiTokenize(
      ColumnBridge.expression(c), initial, cont))

  /** wpCte extended with the Viterbi decode: `udp` runs the backward
    * min-piece DP per vocabulary word (the suffix-cost table grows as a
    * LIST, bests[k] = cost of the suffix starting k−1 chars past the
    * current position), `urec` walks forward emitting the longest piece
    * still on a shortest path — ends with `wuni` (w, wtokuni, nuni). */
  // lazy: wpCte is declared further down the object body — a plain val
  // here would capture null at object init (Scala initializes vals in
  // declaration order)
  private lazy val uniCte =
    s"""$wpCte,
       |udp AS (
       |  SELECT w, length(w) + 1 AS i, [0] AS bests FROM vocab
       |  UNION ALL
       |  SELECT a.w, a.i - 1, [1 + b.m] || a.bests
       |  FROM udp a JOIN LATERAL (
       |    SELECT MIN(a.bests[length(v.p)]) AS m FROM (
       |      SELECT p FROM vinit WHERE a.i - 1 = 1
       |      UNION ALL SELECT p FROM vcont WHERE a.i - 1 > 1) v
       |    WHERE substr(a.w, a.i - 1, length(v.p)) = v.p) b ON TRUE
       |  WHERE a.i > 1),
       |urec AS (
       |  SELECT w, 1 AS pos, CAST([] AS VARCHAR[]) AS toks, FALSE AS done,
       |         bests
       |  FROM udp WHERE i = 1
       |  UNION ALL
       |  SELECT a.w, a.pos + length(b.p),
       |         a.toks || [CASE WHEN a.pos = 1 THEN b.p ELSE '##' || b.p END],
       |         a.pos + length(b.p) > length(a.w), a.bests
       |  FROM urec a JOIN LATERAL (
       |    SELECT v.p FROM (
       |      SELECT p FROM vinit WHERE a.pos = 1
       |      UNION ALL SELECT p FROM vcont WHERE a.pos > 1) v
       |    WHERE substr(a.w, a.pos, length(v.p)) = v.p
       |      AND 1 + a.bests[a.pos + length(v.p)] = a.bests[a.pos]
       |    ORDER BY length(v.p) DESC LIMIT 1) b ON TRUE
       |  WHERE NOT a.done),
       |wuni AS (
       |  SELECT w, array_to_string(toks, '|') AS wtokuni, len(toks) AS nuni
       |  FROM urec WHERE done)""".stripMargin

  private lazy val textTokenizeUnigramOracle =
    s"""$uniCte,
       |perdoc AS (
       |  SELECT d.doc_id,
       |         CAST(COUNT(*) AS BIGINT) AS n_ws,
       |         CAST(SUM(t.nwp) AS BIGINT) AS n_wp,
       |         CAST(SUM(u.nuni) AS BIGINT) AS n_uni,
       |         string_agg(u.wtokuni, ' ' ORDER BY d.pos) AS joined
       |  FROM words d JOIN wwp t ON t.w = d.w JOIN wuni u ON u.w = d.w
       |  GROUP BY d.doc_id)
       |SELECT doc.doc_id,
       |       COALESCE(p.n_ws, 0) AS n_ws,
       |       COALESCE(p.n_wp, 0) AS n_wp,
       |       COALESCE(p.n_uni, 0) AS n_uni,
       |       md5(COALESCE(p.joined, '')) AS tok_md5
       |FROM documents doc LEFT JOIN perdoc p ON p.doc_id = doc.doc_id
       |ORDER BY doc.doc_id""".stripMargin

  // ---- curate_fertility_compare ----------------------------------------------
  // BPE vs WordPiece fertility per language, riding the existing fertility
  // report's integer per-mille convention: both encoders run in the SAME
  // single projection over the corpus (two codegen expressions side by
  // side), so the comparison costs one scan and one lang-grain agg. The
  // question it answers: which subword scheme fragments which language
  // slice harder under the same training data.
  def curateFertilityCompare(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val (merges, initial, cont) = trainWordPiece(s, docs)
    docs
      .select(col("lang"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long")
          .as("n_ws"),
        bpeCol(col("text"), merges).as("tb"),
        wpCol(col("text"), initial, cont).as("tw"))
      .select(col("lang"), col("n_ws"),
        nTokens(col("tb")).as("n_bpe"), nTokens(col("tw")).as("n_wp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_ws")).as("sum_words"),
        sum(col("n_bpe")).as("sum_bpe"), sum(col("n_wp")).as("sum_wp"))
      .withColumn("bpe_per_word_pm", expr("sum_bpe * 1000 div sum_words"))
      .withColumn("wp_per_word_pm", expr("sum_wp * 1000 div sum_words"))
      .orderBy(col("lang"))
  }

  /** bpeCte extended with the WordPiece vocabulary + greedy apply: piece
    * sets from the BPE segmentation (initials / '##'-continuations / char
    * fallback), then one longest match per recursion step — ends with the
    * `wwp` relation (w, wtokwp '|'-joined with '##' marks, nwp). */
  private val wpCte =
    s"""$bpeCte,
       |wsyms AS (
       |  SELECT a.w, a.syms, v.wc FROM apply2 a
       |  JOIN vocab v ON v.w = a.w WHERE a.done),
       |wchars AS (
       |  SELECT DISTINCT unnest(string_split(w, '')) AS p FROM vocab),
       |vinit AS (
       |  SELECT p FROM (
       |    SELECT syms[1] AS p, SUM(wc) AS cnt FROM wsyms GROUP BY 1
       |    ORDER BY cnt DESC, p LIMIT $WpBudget) ti
       |  UNION SELECT p FROM wchars),
       |vcont AS (
       |  SELECT p FROM (
       |    SELECT syms[i] AS p, SUM(wc) AS cnt FROM (
       |      SELECT syms, wc, unnest(generate_series(2, len(syms))) AS i
       |      FROM wsyms) t GROUP BY 1
       |    ORDER BY cnt DESC, p LIMIT $WpBudget) tc
       |  UNION SELECT p FROM wchars),
       |wpapply AS (
       |  SELECT w, 1 AS pos, CAST([] AS VARCHAR[]) AS toks, FALSE AS done
       |  FROM vocab
       |  UNION ALL
       |  SELECT a.w, a.pos + length(b.p),
       |         a.toks || [CASE WHEN a.pos = 1 THEN b.p ELSE '##' || b.p END],
       |         a.pos + length(b.p) > length(a.w)
       |  FROM wpapply a JOIN LATERAL (
       |    SELECT p FROM (
       |      SELECT p FROM vinit WHERE a.pos = 1
       |      UNION ALL SELECT p FROM vcont WHERE a.pos > 1) v
       |    WHERE substr(a.w, a.pos, length(p)) = p
       |    ORDER BY length(p) DESC LIMIT 1) b ON TRUE
       |  WHERE NOT a.done),
       |wwp AS (
       |  SELECT w, array_to_string(toks, '|') AS wtokwp, len(toks) AS nwp
       |  FROM wpapply WHERE done)""".stripMargin

  private val textTokenizeWordpieceOracle =
    s"""$wpCte,
       |perdoc AS (
       |  SELECT d.doc_id,
       |         CAST(COUNT(*) AS BIGINT) AS n_ws,
       |         CAST(SUM(t.nwp) AS BIGINT) AS n_wp,
       |         string_agg(t.wtokwp, ' ' ORDER BY d.pos) AS joined
       |  FROM words d JOIN wwp t ON t.w = d.w
       |  GROUP BY d.doc_id)
       |SELECT doc.doc_id,
       |       COALESCE(p.n_ws, 0) AS n_ws,
       |       COALESCE(p.n_wp, 0) AS n_wp,
       |       md5(COALESCE(p.joined, '')) AS tok_md5
       |FROM documents doc LEFT JOIN perdoc p ON p.doc_id = doc.doc_id
       |ORDER BY doc.doc_id""".stripMargin

  private val curateFertilityCompareOracle =
    s"""$wpCte,
       |perdoc AS (
       |  SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ws,
       |         CAST(SUM(b.ntok) AS BIGINT) AS n_bpe,
       |         CAST(SUM(t.nwp) AS BIGINT) AS n_wp
       |  FROM words d JOIN wtok b ON b.w = d.w JOIN wwp t ON t.w = d.w
       |  GROUP BY 1),
       |base AS (
       |  SELECT doc.lang, COALESCE(p.n_ws, 0) AS n_ws,
       |         COALESCE(p.n_bpe, 0) AS n_bpe, COALESCE(p.n_wp, 0) AS n_wp
       |  FROM documents doc LEFT JOIN perdoc p ON p.doc_id = doc.doc_id)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_ws) AS BIGINT) AS sum_words,
       |       CAST(SUM(n_bpe) AS BIGINT) AS sum_bpe,
       |       CAST(SUM(n_wp) AS BIGINT) AS sum_wp,
       |       CAST(SUM(n_bpe) * 1000 // SUM(n_ws) AS BIGINT) AS bpe_per_word_pm,
       |       CAST(SUM(n_wp) * 1000 // SUM(n_ws) AS BIGINT) AS wp_per_word_pm
       |FROM base GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, Q] = Map[String, Q](
    "text_tokenize_bpe" -> (textTokenizeBpe _),
    "text_tokenize_wordpiece" -> (textTokenizeWordpiece _),
    "text_tokenize_unigram" -> (textTokenizeUnigram _),
    "curate_fertility_compare" -> (curateFertilityCompare _),
    "pack_sequences_bpe" -> (packSequencesBpe _),
    "text_chunk_bpe" -> (textChunkBpe _),
    "curate_tokenizer_fertility" -> (curateTokenizerFertility _))

  val oracles: Map[String, String] = Map(
    "text_tokenize_bpe" -> textTokenizeBpeOracle,
    "text_tokenize_wordpiece" -> textTokenizeWordpieceOracle,
    "text_tokenize_unigram" -> textTokenizeUnigramOracle,
    "curate_fertility_compare" -> curateFertilityCompareOracle,
    "pack_sequences_bpe" -> packSequencesBpeOracle,
    "text_chunk_bpe" -> textChunkBpeOracle,
    "curate_tokenizer_fertility" -> curateTokenizerFertilityOracle)
}
