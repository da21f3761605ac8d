package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables.load

/** Corpus-curation operators: PII scrubbing and the C4-style keep/drop
  * decision — the step that turns raw documents into a training set.
  */
object Curation {

  type Q = (SparkSession, String) => DataFrame

  // portable patterns: char classes + bounded quantifiers behave identically
  // in Java regex and RE2 (no \s, \b or lookaround)
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
  private val phoneRe = "[+][0-9][0-9 -]+[0-9]"

  // ---- text_pii_scrub -------------------------------------------------------
  // The fixture text carries no PII, so a deterministic contact line is
  // appended first (same construction in both engines) and the scrubber must
  // redact exactly it; n_redactions counts what was removed.
  def textPiiScrub(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .withColumn("raw", concat(col("text"),
        lit(" contact: user"), col("doc_id"), lit("@example.com tel +1 555-000-"),
        col("doc_id")))
      .select(col("doc_id"),
        expr(s"regexp_replace(regexp_replace(raw, '$emailRe', '<EMAIL>'), '$phoneRe', '<PHONE>')")
          .as("scrubbed"))
      .withColumn("has_email_left", expr(s"scrubbed rlike '$emailRe'"))
      .select(col("doc_id"), md5(col("scrubbed")).as("scrubbed_fp"),
        col("has_email_left"))
      .orderBy(col("doc_id"))

  private val textPiiScrubOracle =
    s"""WITH r AS (
       |  SELECT doc_id,
       |         text || ' contact: user' || CAST(doc_id AS VARCHAR) ||
       |         '@example.com tel +1 555-000-' || CAST(doc_id AS VARCHAR) AS raw
       |  FROM documents),
       |sc AS (
       |  SELECT doc_id,
       |         regexp_replace(regexp_replace(raw, '$emailRe', '<EMAIL>', 'g'), '$phoneRe', '<PHONE>', 'g') AS scrubbed
       |  FROM r)
       |SELECT doc_id, md5(scrubbed) AS scrubbed_fp,
       |       regexp_matches(scrubbed, '$emailRe') AS has_email_left
       |FROM sc ORDER BY doc_id""".stripMargin

  // ---- curate_keep_drop -----------------------------------------------------
  // C4-style keep/drop with reasons, composing the curation signals: minimum
  // length, English langid vote, quality score, near-dup suppression (the
  // LSH pairs' id_b side is dropped, keeping the lower doc_id as canonical).
  // First failing rule wins, checked in a fixed order — the decision is a
  // pure function of the corpus, so the oracle replays it end to end.
  def curateKeepDrop(s: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.textQuality(s, dir)
      .select(col("doc_id"), col("n_tokens"), col("score"))
    val lang = TextAnalysis.textLangid(s, dir)
      .select(col("doc_id"), col("lang_pred"))
    val dupVictims = Dedup.dedupMinhashLsh(s, dir)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("is_dup", lit(true))
    load(s, dir, "documents").select(col("doc_id"))
      .join(quality, Seq("doc_id"), "left")
      .join(lang, Seq("doc_id"), "left")
      .join(dupVictims, Seq("doc_id"), "left")
      .select(col("doc_id"), expr(
        """case when coalesce(n_tokens, 0) < 20 then 'too_short'
          |     when lang_pred <> 'en' then 'non_english'
          |     when score < 0.3 then 'low_quality'
          |     when is_dup then 'near_duplicate'
          |     else 'keep' end""".stripMargin).as("decision"))
      .withColumn("keep", col("decision") === "keep")
      .orderBy(col("doc_id"))
  }

  /** Oracle: the same decision replayed relationally from the raw table,
    * reusing the exact signal definitions of the underlying operators. */
  private def curateKeepDropOracle(
      qualityOracle: String, langidOracle: String, minhashOracle: String): String =
    s"""WITH q AS ($qualityOracle),
       |l AS ($langidOracle),
       |mh AS ($minhashOracle),
       |dups AS (SELECT DISTINCT id_b AS doc_id FROM mh),
       |d AS (
       |  SELECT doc.doc_id,
       |         CASE WHEN COALESCE(q.n_tokens, 0) < 20 THEN 'too_short'
       |              WHEN l.lang_pred <> 'en' THEN 'non_english'
       |              WHEN q.score < 0.3 THEN 'low_quality'
       |              WHEN dups.doc_id IS NOT NULL THEN 'near_duplicate'
       |              ELSE 'keep' END AS decision
       |  FROM documents doc
       |  LEFT JOIN q ON q.doc_id = doc.doc_id
       |  LEFT JOIN l ON l.doc_id = doc.doc_id
       |  LEFT JOIN dups ON dups.doc_id = doc.doc_id)
       |SELECT doc_id, decision, decision = 'keep' AS keep
       |FROM d ORDER BY doc_id""".stripMargin

  // ---- curate_gopher_rules --------------------------------------------------
  // The Gopher quality-rule battery (Rae et al. 2021, appendix A1.1) as one
  // per-row projection: word-count bounds, mean-word-length bounds,
  // symbol-to-word ratio, alphabetic-word fraction, and the stopword-presence
  // check. Every ratio compare is integer cross-multiplication (3*n <= sum
  // instead of sum/n >= 3) so both engines decide each rule with exact
  // BIGINT arithmetic — no float threshold can disagree at a boundary. The
  // stopword list is fixture-adapted ({the,a,and,of,to,in}; the fixture's
  // 31-word vocabulary contains none of Gopher's {be,that,have,with}, which
  // would vacuously fail every doc); the RULE — "at least 2 distinct
  // stopwords present" — is the published one. First failing rule in the
  // published order is the reported reason. Shuffle-free at any scale.
  private val gopherStops = Seq("the", "a", "and", "of", "to", "in")

  def curateGopherRules(s: SparkSession, dir: String): DataFrame = {
    val stopArr = gopherStops.map(w => s"'$w'").mkString("array(", ", ", ")")
    load(s, dir, "documents")
      .withColumn("ws_toks", expr(
        s"filter(split(text, '${TextAnalysis.ws}'), t -> t <> '')"))
      .withColumn("n_words", size(col("ws_toks")))
      .withColumn("sum_len", expr(
        "aggregate(ws_toks, 0L, (a, t) -> a + length(t))"))
      .withColumn("n_sym", expr(
        "size(filter(ws_toks, t -> t = '#' or contains(t, '...')))"))
      .withColumn("n_alpha", expr(
        "size(filter(ws_toks, t -> t rlike '[a-zA-Z]'))"))
      .withColumn("n_stop", expr(
        s"size(array_intersect(array_distinct(filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')), $stopArr))"))
      .select(col("doc_id"), col("n_words"), col("n_stop"), expr(
        """case when n_words < 50 or n_words > 100000 then 'word_count'
          |     when sum_len < 3 * n_words or sum_len > 10 * n_words then 'mean_word_length'
          |     when n_sym * 10 > n_words then 'symbol_ratio'
          |     when n_alpha * 5 < n_words * 4 then 'alpha_fraction'
          |     when n_stop < 2 then 'stopwords'
          |     else 'keep' end""".stripMargin).as("reason"))
      .withColumn("keep", col("reason") === "keep")
      .orderBy(col("doc_id"))
  }

  private val curateGopherRulesOracle = {
    val stopList = gopherStops.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(text, '${TextAnalysis.ws}'), x -> x <> '') AS ws_toks,
       |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |sig AS (
       |  SELECT doc_id, len(ws_toks) AS n_words,
       |         COALESCE(list_sum(list_transform(ws_toks, x -> length(x))), 0) AS sum_len,
       |         len(list_filter(ws_toks, x -> x = '#' OR contains(x, '...'))) AS n_sym,
       |         len(list_filter(ws_toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
       |         len(list_intersect(list_distinct(toks), $stopList)) AS n_stop
       |  FROM t)
       |SELECT doc_id, n_words, n_stop,
       |       CASE WHEN n_words < 50 OR n_words > 100000 THEN 'word_count'
       |            WHEN sum_len < 3 * n_words OR sum_len > 10 * n_words THEN 'mean_word_length'
       |            WHEN n_sym * 10 > n_words THEN 'symbol_ratio'
       |            WHEN n_alpha * 5 < n_words * 4 THEN 'alpha_fraction'
       |            WHEN n_stop < 2 THEN 'stopwords'
       |            ELSE 'keep' END AS reason,
       |       CASE WHEN n_words < 50 OR n_words > 100000 THEN 'word_count'
       |            WHEN sum_len < 3 * n_words OR sum_len > 10 * n_words THEN 'mean_word_length'
       |            WHEN n_sym * 10 > n_words THEN 'symbol_ratio'
       |            WHEN n_alpha * 5 < n_words * 4 THEN 'alpha_fraction'
       |            WHEN n_stop < 2 THEN 'stopwords'
       |            ELSE 'keep' END = 'keep' AS keep
       |FROM sig ORDER BY doc_id""".stripMargin
  }

  // ---- curate_mix_domains ---------------------------------------------------
  // Domain-mixture sampling — the "data mixing" step that turns per-source
  // corpora into a training set with TARGET proportions (the mixture knob of
  // every LLM data recipe). Weights are a pure function of the source name
  // ((source_number % 3) + 1), the budget is half the corpus, and each
  // source's quota is its weight share of the budget, capped by what the
  // source actually has. WHICH rows fill a quota is decided by ranking on
  // md5(text || doc_id) — a deterministic uniform shuffle both engines
  // compute identically, so the sample is reproducible run-to-run and
  // engine-to-engine (same property as sample_split_hash). Scale: counts are
  // a map-side-combining agg, the 20-row quota table broadcasts, and the
  // per-source rank is one exchange on `source` — at 100 TB the rank's sort
  // spills per source-partition; a skewed giant source salts into
  // sub-ranked shards exactly like sample_stratified.
  def curateMixDomains(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w", expr("(cast(substring(source, 4) as int) % 3) + 1"))
    // corpus totals as a broadcast 1-row aggregate, not a global window —
    // an unpartitioned window would funnel the quota table through one
    // task (harmless on 20 rows, a plan smell the moment sources grow)
    val tot = counts.agg(sum(col("w")).as("sum_w"), sum(col("cnt")).as("tot"))
    val quotas = counts.crossJoin(broadcast(tot))
      .withColumn("quota",
        least(col("cnt"), expr("(tot div 2) * w div sum_w")))
      .select(col("source"), col("quota"))
    val ranked = docs.withColumn("rnk", row_number().over(
      Window.partitionBy(col("source"))
        .orderBy(md5(concat(col("text"), col("doc_id"))), col("doc_id"))))
    ranked.join(broadcast(quotas), Seq("source"))
      .filter(col("rnk") <= col("quota"))
      .select(col("source"), col("rnk").cast("int").as("rnk"), col("doc_id"))
      .orderBy(col("source"), col("rnk"))
  }

  private val curateMixDomainsOracle =
    """WITH q AS (
      |  SELECT source, COUNT(*) AS cnt,
      |         (CAST(substr(source, 4) AS INT) % 3) + 1 AS w
      |  FROM documents GROUP BY source),
      |quotas AS (
      |  SELECT source,
      |         least(cnt, (SUM(cnt) OVER () // 2) * w // SUM(w) OVER ()) AS quota
      |  FROM q),
      |ranked AS (
      |  SELECT source, doc_id,
      |         ROW_NUMBER() OVER (PARTITION BY source
      |           ORDER BY md5(text || CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      |  FROM documents)
      |SELECT r.source, CAST(r.rnk AS INT) AS rnk, r.doc_id
      |FROM ranked r JOIN quotas USING (source)
      |WHERE r.rnk <= quota
      |ORDER BY r.source, r.rnk""".stripMargin

  val queries: Map[String, Q] = Map[String, Q](
    "text_pii_scrub" -> (textPiiScrub _),
    "curate_keep_drop" -> (curateKeepDrop _),
    "curate_gopher_rules" -> (curateGopherRules _),
    "curate_mix_domains" -> (curateMixDomains _))

  def oracles: Map[String, String] = Map(
    "text_pii_scrub" -> textPiiScrubOracle,
    "curate_keep_drop" -> curateKeepDropOracle(
      TextAnalysis.oracles("text_quality"),
      TextAnalysis.oracles("text_langid"),
      Dedup.oracles("dedup_minhash_lsh")),
    "curate_gopher_rules" -> curateGopherRulesOracle,
    "curate_mix_domains" -> curateMixDomainsOracle)
}
