package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables.load

/** Text-analysis operators over `documents` (SURVEY north-star): token
  * counting, quality scoring, n-gram-heuristic language ID, fingerprinting.
  * Pure per-row column pipelines — no shuffle at all except the final
  * presentation sort, so they scale embarrassingly at 100 TB.
  */
object TextAnalysis {

  type Q = (SparkSession, String) => DataFrame

  private val toksE = "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"

  /** Whitespace class as LITERAL control characters, not `\s`: Java regex
    * includes \x0B in \s while DuckDB's RE2 does not, and Spark's SQL string
    * parser mangles unknown backslash escapes — literal chars behave
    * identically in both engines. */
  private[llm] val ws = "[ \t\n\u000B\f\r]+"

  // ---- text_token_count -----------------------------------------------------
  // Whitespace tokens vs regex word-tokens (the BPE-ish split) vs distinct.
  // toks projected ONCE (the interpreted lambda would otherwise run 3x/row).
  def textTokenCount(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
        expr(s"size(filter(split(text, '$ws'), t -> t <> ''))").as("n_ws_tokens"),
        expr(toksE).as("toks"))
      .select(col("doc_id"), col("n_ws_tokens"),
        size(col("toks")).as("n_word_tokens"),
        expr("size(array_distinct(toks))").as("n_distinct_tokens"),
        expr("""round(cast(
                |  aggregate(toks, 0L, (a, t) -> a + length(t)) * 1.0 /
                |  greatest(size(toks), 1) as decimal(28,6)), 2)""".stripMargin)
          .cast("double").as("avg_token_len"))
      .orderBy(col("doc_id"))

  private val textTokenCountOracle =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(text, '$ws'), x -> x <> '') AS ws,
       |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents)
       |SELECT doc_id, len(ws) AS n_ws_tokens, len(toks) AS n_word_tokens,
       |       len(list_distinct(toks)) AS n_distinct_tokens,
       |       CAST(ROUND(CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) * 1.0 /
       |                       greatest(len(toks), 1) AS DECIMAL(28,6)), 2) AS DOUBLE) AS avg_token_len
       |FROM t ORDER BY doc_id""".stripMargin

  // ---- text_quality ---------------------------------------------------------
  // Length / punctuation / stopword-density heuristics folded into one score
  // (identical integer inputs → identical double arithmetic → decimal round).
  private val stopEn =
    "'the','a','of','and','to','in','is','on','for','with','as','by','at','an','be'"

  def textQuality(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), col("text"), expr(toksE).as("toks"))
      .select(col("doc_id"),
        length(col("text")).as("n_chars"),
        size(col("toks")).as("n_tokens"),
        expr("length(regexp_replace(text, '[^.,;:!?]', ''))").as("n_punct"),
        expr(s"size(filter(toks, t -> t in ($stopEn)))").as("n_stop"))
      .withColumn("score", expr(
        """round(cast(
          |  least(n_tokens / 100.0, 1.0) * 0.5 +
          |  (n_stop * 1.0 / greatest(n_tokens, 1)) * 0.3 +
          |  (1.0 - least(n_punct * 10.0 / greatest(n_chars, 1), 1.0)) * 0.2
          |as decimal(28,8)), 4)""".stripMargin).cast("double"))
      .orderBy(col("doc_id"))

  private val textQualityOracle =
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, length(text) AS n_chars, len(toks) AS n_tokens,
       |         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
       |         len(list_filter(toks, x -> x IN ($stopEn))) AS n_stop
       |  FROM t)
       |SELECT doc_id, n_chars, n_tokens, n_punct, n_stop,
       |       CAST(ROUND(CAST(
       |         least(n_tokens / 100.0, 1.0) * 0.5 +
       |         (n_stop * 1.0 / greatest(n_tokens, 1)) * 0.3 +
       |         (1.0 - least(n_punct * 10.0 / greatest(n_chars, 1), 1.0)) * 0.2
       |       AS DECIMAL(28,8)), 4) AS DOUBLE) AS score
       |FROM m ORDER BY doc_id""".stripMargin

  // ---- text_langid ----------------------------------------------------------
  // Stopword-list voting with a fixed priority tie-break (en > de > es > fr).
  private val stopDe = "'der','die','das','und','zu','ist','mit','auf','ein','nicht'"
  private val stopEs = "'el','la','de','y','que','en','un','es','por','con'"
  private val stopFr = "'le','la','de','et','que','en','un','est','pour','avec'"

  def textLangid(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), expr(toksE).as("toks"))
      .select(col("doc_id"),
        expr(s"size(filter(toks, t -> t in ($stopEn)))").as("s_en"),
        expr(s"size(filter(toks, t -> t in ($stopDe)))").as("s_de"),
        expr(s"size(filter(toks, t -> t in ($stopEs)))").as("s_es"),
        expr(s"size(filter(toks, t -> t in ($stopFr)))").as("s_fr"))
      .withColumn("lang_pred", expr(
        """case when s_en >= s_de and s_en >= s_es and s_en >= s_fr then 'en'
          |     when s_de >= s_es and s_de >= s_fr then 'de'
          |     when s_es >= s_fr then 'es'
          |     else 'fr' end""".stripMargin))
      .orderBy(col("doc_id"))

  private val textLangidOracle =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |sc AS (
       |  SELECT doc_id,
       |         len(list_filter(toks, x -> x IN ($stopEn))) AS s_en,
       |         len(list_filter(toks, x -> x IN ($stopDe))) AS s_de,
       |         len(list_filter(toks, x -> x IN ($stopEs))) AS s_es,
       |         len(list_filter(toks, x -> x IN ($stopFr))) AS s_fr
       |  FROM t)
       |SELECT doc_id, s_en, s_de, s_es, s_fr,
       |       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       |            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       |            WHEN s_es >= s_fr THEN 'es'
       |            ELSE 'fr' END AS lang_pred
       |FROM sc ORDER BY doc_id""".stripMargin

  // ---- text_fingerprint -----------------------------------------------------
  // Whitespace-normalized md5 fingerprint (+ a 64-bit prefix for compact
  // joins) — the content-defined identity used by exact dedup at scale.
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
        expr(s"md5(trim(regexp_replace(lower(text), '$ws', ' ')))").as("fp"))
      .withColumn("fp64", expr("substring(fp, 1, 16)"))
      .orderBy(col("doc_id"))

  private val textFingerprintOracle =
    s"""SELECT doc_id,
       |       md5(trim(regexp_replace(lower(text), '$ws', ' ', 'g'))) AS fp,
       |       substring(md5(trim(regexp_replace(lower(text), '$ws', ' ', 'g'))), 1, 16) AS fp64
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- text_tfidf -----------------------------------------------------------
  // Top-5 characteristic terms per doc. idf is the exact rational N/df
  // rather than ln(N/df): IEEE division of identical integers is
  // bit-deterministic across engines while libm ln() is not — and ln is a
  // monotone transform of N/df, so the per-doc RANKING (the operator's
  // contract) is identical to the classic formulation.
  def textTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), expr(toksE).as("toks"))
      .filter(size(col("toks")) > 0)
    val n = docs.count()  // one scalar to the driver, like the snapshot anchor
    val tf = docs.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val scored = tf.join(df_, "term")
      .withColumn("score",
        round((col("tf") * lit(n.toDouble) / col("df")).cast("decimal(28,8)"), 4)
          .cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  private val textTfidfOracle =
    """WITH docs AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      |  FROM documents WHERE len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) > 0),
      |n AS (SELECT COUNT(*) AS n_docs FROM docs),
      |tf AS (
      |  SELECT doc_id, unnest(toks) AS term FROM docs),
      |tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
      |dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tfc GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, term, tf,
      |         CAST(ROUND(CAST(tf * (SELECT CAST(n_docs AS DOUBLE) FROM n) / df AS DECIMAL(28,8)), 4) AS DOUBLE) AS score
      |  FROM tfc JOIN dfc USING (term)),
      |ranked AS (
      |  SELECT doc_id, term, tf, score,
      |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
      |  FROM scored)
      |SELECT doc_id, rank, term, tf, score FROM ranked
      |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin

  // ---- text_ngram_freq ------------------------------------------------------
  // Corpus-level top-k n-gram frequencies (r4) — the contamination /
  // boilerplate / memorization check every LM-data pipeline runs: which
  // bigrams dominate the corpus, with doc-frequency alongside so "frequent
  // because common" separates from "frequent because one doc repeats it".
  // Shape: per-row bigram projection → one hash agg on the bigram (count +
  // approx-free exact distinct via a second agg level) → global top-k.
  // Ties are broken lexicographically so the top-k cut is deterministic in
  // both engines. At 100 TB the bigram agg is the same map-side-combining
  // hash agg as a word count; the top-k is TakeOrderedAndProject, not a
  // full sort.
  def textNgramFreq(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), expr(s"$toksE").as("toks"))
      // guard BEFORE the sequence: Spark's sequence(0, -1) DESCENDS (it is
      // not empty like DuckDB's generate_series), so a 0/1-token doc would
      // feed slice() a 0 start and throw
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', slice(toks, i+1, 2)))"))
        .as("bigram"))
      .filter(length(col("bigram")) > 0 && col("bigram").contains(" "))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("bigram"))
      .limit(50)

  private val textNgramFreqOracle =
    """WITH toks AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(0, len(toks)-2),
      |           i -> array_to_string(list_slice(toks, i+1, i+2), ' '))) AS bigram
      |  FROM toks),
      |counted AS (
      |  SELECT bigram, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
      |  FROM grams WHERE len(bigram) > 0 AND contains(bigram, ' ')
      |  GROUP BY bigram)
      |SELECT bigram, n_occurrences, n_docs FROM counted
      |ORDER BY n_occurrences DESC, bigram LIMIT 50""".stripMargin

  // ---- text_repetition ------------------------------------------------------
  // The Gopher-class repetition signals a curation pipeline filters on:
  // what fraction of a document's bigram mass is repeats (1 - distinct/
  // total), how dominant the single most frequent bigram and token are.
  // High values mark boilerplate/spam/generated text. Topology is the
  // tfidf one — explode → map-side-combining hash agg on (doc_id, gram) →
  // per-doc roll-up — so the shuffle key is (doc_id, gram) and the
  // operator scales like any word-count at 100 TB. Ratios divide exact
  // integers in doubles and round in the decimal domain (identical IEEE
  // in both engines).
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val toks = load(s, dir, "documents")
      .select(col("doc_id"), expr(toksE).as("toks"))
      .filter(size(col("toks")) >= 2)
    val bg = toks.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', slice(toks, i+1, 2)))"))
      .as("g"))
    val tk = toks.select(col("doc_id"), explode(col("toks")).as("g"))
    def stats(grams: DataFrame, prefix: String): DataFrame =
      grams.groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as(s"${prefix}_total"),
          count(lit(1)).as(s"${prefix}_distinct"),
          max(col("c")).as(s"${prefix}_top"))
    def frac(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      round((num.cast("double") / den).cast("decimal(28,8)"), 4).cast("double")
    stats(bg, "bg").join(stats(tk, "tk"), "doc_id")
      .select(col("doc_id"), col("bg_total").as("n_bigrams"),
        frac(col("bg_total") - col("bg_distinct"), col("bg_total"))
          .as("dup_bigram_frac"),
        frac(col("bg_top"), col("bg_total")).as("top_bigram_frac"),
        frac(col("tk_top"), col("tk_total")).as("top_token_frac"))
      .orderBy(col("doc_id"))
  }

  private val textRepetitionOracle =
    """WITH toks AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
      |  FROM documents),
      |base AS (SELECT doc_id, toks FROM toks WHERE len(toks) >= 2),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-1),
      |           i -> toks[i] || ' ' || toks[i+1])) AS g
      |  FROM base),
      |tk AS (SELECT doc_id, unnest(toks) AS g FROM base),
      |bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |tkc AS (SELECT doc_id, g, COUNT(*) AS c FROM tk GROUP BY 1, 2),
      |bstat AS (SELECT doc_id, SUM(c) AS total, COUNT(*) AS dist, MAX(c) AS top
      |          FROM bgc GROUP BY 1),
      |tstat AS (SELECT doc_id, SUM(c) AS total, MAX(c) AS top FROM tkc GROUP BY 1)
      |SELECT b.doc_id, CAST(b.total AS BIGINT) AS n_bigrams,
      |       CAST(ROUND(CAST(CAST(b.total - b.dist AS DOUBLE) / b.total AS DECIMAL(28,8)), 4) AS DOUBLE) AS dup_bigram_frac,
      |       CAST(ROUND(CAST(CAST(b.top AS DOUBLE) / b.total AS DECIMAL(28,8)), 4) AS DOUBLE) AS top_bigram_frac,
      |       CAST(ROUND(CAST(CAST(t.top AS DOUBLE) / t.total AS DECIMAL(28,8)), 4) AS DOUBLE) AS top_token_frac
      |FROM bstat b JOIN tstat t ON t.doc_id = b.doc_id
      |ORDER BY b.doc_id""".stripMargin

  // ---- text_winnowing -------------------------------------------------------
  // Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
  // 2003 — the MOSS algorithm): hash every k-gram (k=5 tokens), slide a
  // w=4 window over the hash sequence, and keep each window's MINIMUM —
  // the guarantee is that any shared run of >= w+k-1 tokens between two
  // docs shares at least one selected fingerprint, at ~1/w the density of
  // keeping every hash. Hashes are 64-bit md5 prefixes as fixed-width hex
  // (lexicographic min == numeric min), the text_fingerprint convention.
  // Output is the per-doc sketch (fingerprint count + md5 over the sorted
  // fingerprint set — order-independent, so Spark's and DuckDB's distinct
  // orderings can't diverge). Edge rule: fewer than w hashes → one window
  // of them all; fewer than k tokens → no fingerprints (NULL sketch).
  // Everything is ONE per-row projection — array ops inside the row, no
  // explode, no shuffle: the 100 TB fingerprint pass is scan-bound.
  def textWinnowing(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), expr(toksE).as("toks"))
      .withColumn("hashes", expr(
        """case when size(toks) >= 5 then
          |  transform(sequence(1, size(toks) - 4),
          |    i -> substring(md5(concat_ws(' ', slice(toks, i, 5))), 1, 16))
          |else array() end""".stripMargin))
      .withColumn("winnowed", expr(
        """case when size(hashes) >= 4 then
          |  array_distinct(transform(sequence(1, size(hashes) - 3),
          |    j -> array_min(slice(hashes, j, 4))))
          |when size(hashes) >= 1 then array(array_min(hashes))
          |else array() end""".stripMargin))
      .select(col("doc_id"),
        size(col("hashes")).as("n_grams"),
        size(col("winnowed")).as("n_fp"),
        when(size(col("winnowed")) > 0,
          md5(concat_ws("", array_sort(col("winnowed"))))).as("sketch"))
      .orderBy(col("doc_id"))

  private val textWinnowingOracle =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |h AS (
       |  SELECT doc_id,
       |         CASE WHEN len(toks) >= 5 THEN
       |           list_transform(generate_series(1, len(toks) - 4),
       |             i -> substring(md5(array_to_string(toks[i:i+4], ' ')), 1, 16))
       |         ELSE []::VARCHAR[] END AS hashes
       |  FROM t),
       |w AS (
       |  SELECT doc_id, hashes,
       |         CASE WHEN len(hashes) >= 4 THEN
       |           list_distinct(list_transform(generate_series(1, len(hashes) - 3),
       |             j -> list_min(hashes[j:j+3])))
       |         WHEN len(hashes) >= 1 THEN [list_min(hashes)]
       |         ELSE []::VARCHAR[] END AS winnowed
       |  FROM h)
       |SELECT doc_id, len(hashes) AS n_grams, len(winnowed) AS n_fp,
       |       CASE WHEN len(winnowed) > 0
       |            THEN md5(array_to_string(list_sort(winnowed), ''))
       |            ELSE NULL END AS sketch
       |FROM w ORDER BY doc_id""".stripMargin

  // ---- text_readability -----------------------------------------------------
  // Flesch reading ease over the corpus — the classic readability score a
  // curation pipeline thresholds beside text_quality's surface ratios:
  // 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with
  // sentences = non-empty [.!?]+ splits, words = the shared token rule,
  // and syllables approximated by vowel-group count (the standard
  // dictionary-free surrogate) — every input an exact integer, the
  // formula one identically-shaped double expression rounded in the
  // decimal domain, so both engines hash-match without epsilon. Guards
  // (max with 1) keep degenerate docs finite. Scan-local scalar work —
  // no shuffle but the presentation sort.
  def textReadability(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
        greatest(lit(1), size(expr(
          "filter(split(text, '[.!?]+'), p -> length(trim(p)) > 0)")))
          .as("n_sent"),
        greatest(lit(1), size(expr(toksE))).as("n_words"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
          .as("n_syll"))
      .withColumn("flesch", expr(
        """cast(round(cast(
          |  206.835 - 1.015 * (cast(n_words as double) / cast(n_sent as double))
          |          - 84.6 * (cast(n_syll as double) / cast(n_words as double))
          |as decimal(28,8)), 4) as double)""".stripMargin))
      .orderBy(col("doc_id"))

  private val textReadabilityOracle =
    """WITH t AS (
      |  SELECT doc_id,
      |         GREATEST(1, len(list_filter(string_split_regex(text, '[.!?]+'),
      |                                     p -> len(trim(p)) > 0))) AS n_sent,
      |         GREATEST(1, len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                                     x -> x <> ''))) AS n_words,
      |         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
      |  FROM documents)
      |SELECT doc_id, CAST(n_sent AS INT) AS n_sent, CAST(n_words AS INT) AS n_words,
      |       CAST(n_syll AS INT) AS n_syll,
      |       CAST(ROUND(CAST(
      |         206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
      |                 - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))
      |       AS DECIMAL(28,8)), 4) AS DOUBLE) AS flesch
      |FROM t ORDER BY doc_id""".stripMargin

  // ---- text_pmi_collocations --------------------------------------------------
  // Collocation mining (Church & Hanks 1990, the PMI formulation): which
  // bigrams co-occur far more than their unigram frequencies predict —
  // the signal for multiword expressions ("new york"), template
  // boilerplate, and tokenizer-merge candidates in an LM corpus. The
  // reported statistic is the LIFT, observed/expected under independence:
  //   lift(a,b) = (c_ab / B) / ((c_a / U) · (c_b / U))
  // (U total tokens, B total bigrams). Lift is exp(PMI): the log is
  // MONOTONE, so ranking and the min-support cut are identical while the
  // statistic never touches libm log (the text_tfidf discipline —
  // ratio-not-ln, TextAnalysis.scala:152). All counts are exact integers;
  // the single division chain runs in DOUBLE with the identical operand
  // order on both engines and rounds in the decimal domain.
  //
  // Shape: one corpus scan feeds BOTH the unigram and bigram word-count
  // aggs (map-side combining, vocab-grain results); the bigram relation
  // joins the unigram table twice on its word keys (vocab-grain equi-joins
  // — AQE broadcasts at fixture size, shuffles on vocab keys at 100 TB,
  // never on the corpus); the two totals ride a broadcast 1-row anchor.
  // Min-support n_pair >= 5 cuts the hapax tail BEFORE the joins; the
  // top-40 is TakeOrderedAndProject, not a full sort.
  def textPmiCollocations(s: SparkSession, dir: String): DataFrame = {
    val toks = load(s, dir, "documents")
      .select(col("doc_id"), expr(toksE).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pairs = toks.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(toks)-2),
          |  i -> struct(element_at(toks, i+1) as w1,
          |              element_at(toks, i+2) as w2))""".stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
    val totals = uni.agg(sum(col("c")).as("u_total"))
      .crossJoin(pairs.agg(sum(col("n_pair")).as("b_total")))
    pairs.filter(col("n_pair") >= 5)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("lift", expr(
        """round(cast(
          |  cast(n_pair as double) * cast(u_total as double) / cast(b_total as double)
          |    * cast(u_total as double) / cast(c1 as double) / cast(c2 as double)
          |  as decimal(28,8)), 4)""".stripMargin).cast("double"))
      .select(col("w1"), col("w2"), col("n_pair"), col("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(40)
  }

  private val textPmiCollocationsOracle =
    """WITH toks AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
      |  FROM documents),
      |uni AS (
      |  SELECT w, COUNT(*) AS c
      |  FROM (SELECT unnest(toks) AS w FROM toks) z GROUP BY w),
      |pair_src AS (
      |  SELECT unnest(list_transform(generate_series(0, len(toks)-2),
      |           i -> struct_pack(w1 := toks[i+1], w2 := toks[i+2]))) AS p
      |  FROM toks WHERE len(toks) >= 2),
      |pairs AS (
      |  SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS n_pair
      |  FROM pair_src GROUP BY 1, 2),
      |tot AS (
      |  SELECT (SELECT SUM(c) FROM uni) AS u_total,
      |         (SELECT SUM(n_pair) FROM pairs) AS b_total)
      |SELECT w1, w2, n_pair,
      |       CAST(ROUND(CAST(
      |         CAST(n_pair AS DOUBLE) * CAST(u_total AS DOUBLE) / CAST(b_total AS DOUBLE)
      |           * CAST(u_total AS DOUBLE) / CAST(c1 AS DOUBLE) / CAST(c2 AS DOUBLE)
      |         AS DECIMAL(28,8)), 4) AS DOUBLE) AS lift
      |FROM pairs
      |JOIN (SELECT w AS w1, c AS c1 FROM uni) u1 USING (w1)
      |JOIN (SELECT w AS w2, c AS c2 FROM uni) u2 USING (w2), tot
      |WHERE n_pair >= 5
      |ORDER BY lift DESC, w1, w2 LIMIT 40""".stripMargin

  val queries: Map[String, Q] = Map[String, Q](
    "text_pmi_collocations" -> (textPmiCollocations _),
    "text_readability" -> (textReadability _),
    "text_winnowing" -> (textWinnowing _),
    "text_repetition" -> (textRepetition _),
    "text_token_count" -> (textTokenCount _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_tfidf" -> (textTfidf _),
    "text_ngram_freq" -> (textNgramFreq _))

  val oracles: Map[String, String] = Map(
    "text_pmi_collocations" -> textPmiCollocationsOracle,
    "text_readability" -> textReadabilityOracle,
    "text_winnowing" -> textWinnowingOracle,
    "text_repetition" -> textRepetitionOracle,
    "text_token_count" -> textTokenCountOracle,
    "text_quality" -> textQualityOracle,
    "text_langid" -> textLangidOracle,
    "text_fingerprint" -> textFingerprintOracle,
    "text_tfidf" -> textTfidfOracle,
    "text_ngram_freq" -> textNgramFreqOracle)
}
