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
  private val toksE = "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"

  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
  private val phoneRe = "[+][0-9][0-9 -]+[0-9]"

  // ---- curate_token_budget --------------------------------------------------
  // Mixture BUDGET accounting — the supply-side question every data
  // recipe asks before training starts: "per (language, length tier),
  // how many tokens do we HAVE against how many the target mixture
  // WANTS" (the gap is what drives extra crawling, upsampling, or a
  // recipe change). Tiers are n_chars bands (long/mid/short); the target
  // mixture is an explicit weight table (tier weights 5/3/2 crossed with
  // uniform language weights — a deployment swaps in its recipe), and
  // each cell's budget is total_tokens·w_cell div W — exact truncating
  // integer shares of the real corpus total, so budgets sum to within
  // |cells| tokens of it. fill_ppm = supply·10⁶ div budget makes over-
  // and under-supply comparable across cells of different sizes. One
  // corpus scan into a (lang, tier)-grain map-side-combining agg;
  // everything after runs on |cells| rows.
  def curateTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val cells = load(s, dir, "documents")
      .select(col("lang"),
        when(col("n_chars") >= 400, "long")
          .when(col("n_chars") >= 150, "mid").otherwise("short").as("tier"),
        expr(s"size($toksE)").cast("long").as("n_tokens"))
      .groupBy(col("lang"), col("tier"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumn("w",
        when(col("tier") === "long", 5L).when(col("tier") === "mid", 3L)
          .otherwise(2L))
    val tot = cells.agg(sum(col("n_tokens")).as("t"), sum(col("w")).as("tw"))
    cells.crossJoin(broadcast(tot))
      .select(col("lang"), col("tier"), col("n_docs"), col("n_tokens"),
        expr("t * w div tw").as("budget_tokens"))
      .withColumn("fill_ppm",
        expr("n_tokens * 1000000 div greatest(budget_tokens, 1L)"))
      .orderBy(col("lang"), col("tier"))
  }

  private val curateTokenBudgetOracle =
    """WITH d AS (
      |  SELECT lang,
      |         CASE WHEN n_chars >= 400 THEN 'long'
      |              WHEN n_chars >= 150 THEN 'mid' ELSE 'short' END AS tier,
      |         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                              t -> t <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |cells AS (
      |  SELECT lang, tier, COUNT(*) AS n_docs,
      |         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |         CASE tier WHEN 'long' THEN 5 WHEN 'mid' THEN 3 ELSE 2 END AS w
      |  FROM d GROUP BY 1, 2),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
      |               CAST(SUM(w) AS BIGINT) AS tw FROM cells)
      |SELECT lang, tier, n_docs, n_tokens,
      |       CAST((t * w) // tw AS BIGINT) AS budget_tokens,
      |       CAST((n_tokens * 1000000) // GREATEST((t * w) // tw, 1) AS BIGINT)
      |         AS fill_ppm
      |FROM cells, tot ORDER BY lang, tier""".stripMargin

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
  // per-source rank is RankedOver's two-pass distributed rank (r11
  // de-weak — the old single window per source sorted a corpus-sized
  // partition per source at 100x). Bucketing needs a NUMERIC monotone
  // proxy of the md5 sort key: the first 15 hex digits as a bigint are
  // non-decreasing in the full string's lexicographic order (equal-length
  // hex), prefix ties co-bucket, and the in-bucket ORDER BY still uses
  // the exact (md5, doc_id) composite — so ranks are identical to the
  // oracle's single-window formulation.
  def curateMixDomains(s: SparkSession, dir: String): DataFrame = {
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
    val keyed = docs
      .withColumn("__md", md5(concat(col("text"), col("doc_id"))))
      .withColumn("__mdn",
        expr("conv(substring(__md, 1, 15), 16, 10)").cast("long"))
    val ranked = graft.operators.RankedOver.withGlobalRanks(keyed,
        Seq("source"), "__mdn", tieCols = Seq("__md", "doc_id"),
        buckets = s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .withColumn("rnk", col("__grn"))
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

  // ---- curate_boilerplate ---------------------------------------------------
  // C4-style boilerplate removal (Raffel et al. 2020 §2.2 removed any
  // three-sentence span occurring more than once in the corpus): the text is
  // tiled into consecutive non-overlapping 8-token segments, a segment whose
  // hash appears in >= 3 DISTINCT documents is boilerplate (nav bars, cookie
  // banners, license footers), and the document is rewritten without those
  // segments. Differs from dedup_substring (sliding windows, per-doc dup
  // MEASUREMENT) — this one REWRITES, and its tiling keeps each token in
  // exactly one segment so removal is well-defined.
  //
  // Topology: one projection explodes ~n_tokens/8 segments per doc, a
  // two-phase hash-agg on the 32-byte segment hash computes distinct-doc
  // frequency (map-side combine over (hash, doc_id) first), one equi-join
  // marks segments against that frequency table, and one hash-agg on doc_id
  // reassembles the cleaned text in segment order. Linear in corpus tokens,
  // no corpus self-join; the frequency table is |distinct segments| and
  // shuffles, never broadcasts, so the plan is scale-independent.
  private val BoilerW = 8
  private val BoilerDf = 3

  def curateBoilerplate(s: SparkSession, dir: String): DataFrame =
    curateBoilerplateOver(s, load(s, dir, "documents"))

  private[llm] def curateBoilerplateOver(s: SparkSession, docs: DataFrame): DataFrame = {
    val w = BoilerW
    val segs = docs
      .select(col("doc_id"), expr(toksE).as("toks"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
           |  CASE WHEN size(toks) >= 1 THEN sequence(1, size(toks), $w)
           |       ELSE array() END,
           |  p -> concat_ws(' ', slice(toks, p, $w)))""".stripMargin)))
      .toDF("doc_id", "idx", "seg")
      .withColumn("sh", md5(col("seg")))
    val segDf = segs.select(col("sh"), col("doc_id")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val perDoc = segs.join(segDf, Seq("sh"))
      .withColumn("boiler", col("df") >= BoilerDf)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_removed"),
        expr("""md5(concat_ws(' ',
              |  transform(
              |    filter(sort_array(collect_list(struct(idx, boiler, seg))),
              |           x -> NOT x.boiler),
              |    x -> x.seg)))""".stripMargin).as("cleaned_fp"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("cleaned_fp"), md5(lit(""))).as("cleaned_fp"))
      .orderBy(col("doc_id"))
  }

  private val curateBoilerplateOracle = {
    val w = BoilerW
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |segs AS (
       |  SELECT doc_id, CAST(p AS BIGINT) AS p,
       |         array_to_string(toks[p : p + $w - 1], ' ') AS seg
       |  FROM t, UNNEST(range(1, len(toks) + 1, $w)) AS u(p)),
       |h AS (SELECT doc_id, p, seg, md5(seg) AS sh FROM segs),
       |df AS (SELECT sh, COUNT(DISTINCT doc_id) AS df FROM h GROUP BY sh),
       |m AS (SELECT h.*, df.df >= $BoilerDf AS boiler FROM h JOIN df USING (sh)),
       |perdoc AS (
       |  SELECT doc_id, COUNT(*) AS n_segments,
       |         CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |         md5(COALESCE(string_agg(CASE WHEN NOT boiler THEN seg END, ' ' ORDER BY p), '')) AS cleaned_fp
       |  FROM m GROUP BY doc_id)
       |SELECT d.doc_id,
       |       COALESCE(p.n_segments, 0) AS n_segments,
       |       COALESCE(p.n_removed, 0) AS n_removed,
       |       COALESCE(p.cleaned_fp, md5('')) AS cleaned_fp
       |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---- curate_lm_score ------------------------------------------------------
  // Unigram-LM quality scoring — the CCNet move (Wenzek et al. 2020: score
  // every document under a language model trained on trusted text; keep the
  // fluent half) with the LM reduced to its exact-arithmetic core. The
  // "model" is the corpus unigram table itself; a token's log-probability is
  // proxied by its log2 corpus frequency in integer MILLIBITS (see
  // [[lmScores]] — floor(log2) by bit length plus exact linear
  // interpolation between powers of two, so no ln()/float rounding can
  // disagree at a threshold). A document's score is its mean token
  // millibits (integer division); `keep` compares each doc against the
  // corpus mean by integer cross-multiplication. Rare-token-heavy docs
  // (the gibberish CCNet drops) score low; docs of common tokens score
  // high.
  //
  // Scale: the unigram table is one map-side-combining agg (vocab-sized,
  // tiny next to the corpus); scoring is an equi-join on token (AQE
  // broadcasts the vocab side) + one hash-agg on doc_id; the corpus mean is
  // a broadcast 1-row aggregate. Training "the LM" and applying it are the
  // same two scans at any corpus size.
  /** The per-doc unigram-LM scores (doc_id, n_tokens, total_millibits,
    * avg_millibits) — shared by curate_lm_score and curate_ppl_buckets.
    *
    * A token's log2-frequency in MILLIBITS, exact integer arithmetic:
    * p = floor(log2(cnt)) via length(bin(cnt))-1, then linear
    * interpolation between powers of two — p*1000 + (cnt - 2^p)*1000 div
    * 2^p. The interpolation matters: pure floor(log2) collapses a
    * near-uniform frequency table to one value (every token "9 bits") and
    * the distribution degenerates; the piecewise-linear form keeps each
    * distinct count a distinct score while every operation stays integer
    * (shift, multiply, truncated divide — bit-identical across engines,
    * no libm log at any threshold). */
  private def lmScores(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(expr(toksE)).as("token"))
    val freq = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("p", (length(expr("bin(cnt)")) - 1).cast("long"))
      .withColumn("mb", expr(
        "p * 1000 + (cnt - shiftleft(1L, cast(p as int))) * 1000 div shiftleft(1L, cast(p as int))"))
      .select(col("token"), col("mb"))
    toks.join(freq, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("mb")).as("total_millibits"))
      .withColumn("avg_millibits", expr("total_millibits div n_tokens"))
  }

  /** The same per-doc scores as a DuckDB CTE chain ending in `p2`. */
  private val lmScoresSql =
    """t AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
      |  FROM documents),
      |f AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY token),
      |fb AS (SELECT token,
      |       CAST((length(format('{:b}', cnt)) - 1) * 1000
      |            + (cnt - (CAST(1 AS BIGINT) << (length(format('{:b}', cnt)) - 1))) * 1000
      |              // (CAST(1 AS BIGINT) << (length(format('{:b}', cnt)) - 1)) AS BIGINT) AS mb
      |       FROM f),
      |perdoc AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(mb) AS BIGINT) AS total_millibits
      |  FROM t JOIN fb USING (token) GROUP BY doc_id),
      |p2 AS (
      |  SELECT doc_id, n_tokens, total_millibits,
      |         total_millibits // n_tokens AS avg_millibits
      |  FROM perdoc)""".stripMargin

  def curateLmScore(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    // two consumers (corpus mean + the join) — materialize once per
    // invocation, the dedup-family localCheckpoint lifecycle
    val perDoc = lmScores(s, dir).localCheckpoint()
    val corpus = perDoc.agg(count(lit(1)).as("n_docs"),
      sum(col("avg_millibits")).as("sum_mb"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("total_millibits"), lit(0L)).as("total_millibits"),
        coalesce(col("avg_millibits"), lit(0L)).as("avg_millibits"),
        (coalesce(col("avg_millibits"), lit(0L)) * col("n_docs") >= col("sum_mb"))
          .as("keep"))
      .orderBy(col("doc_id"))
  }

  private val curateLmScoreOracle =
    s"""WITH $lmScoresSql,
      |c AS (SELECT COUNT(*) AS n_docs, CAST(SUM(avg_millibits) AS BIGINT) AS sum_mb FROM p2)
      |SELECT d.doc_id,
      |       COALESCE(p2.n_tokens, 0) AS n_tokens,
      |       COALESCE(p2.total_millibits, 0) AS total_millibits,
      |       COALESCE(p2.avg_millibits, 0) AS avg_millibits,
      |       COALESCE(p2.avg_millibits, 0) * c.n_docs >= c.sum_mb AS keep
      |FROM documents d LEFT JOIN p2 ON p2.doc_id = d.doc_id CROSS JOIN c
      |ORDER BY d.doc_id""".stripMargin

  // ---- curate_ppl_buckets ---------------------------------------------------
  // CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): the corpus is
  // cut into score TERTILES and recipes sample the buckets differently
  // (head = fluent, tail = noisy). The cutoffs are VALUES, not ranks — the
  // honest large-scale semantics: a global NTILE would funnel the whole
  // corpus through one sorted partition, so instead the score histogram
  // (avg_millibits is an integer in [0, 64000) — at most that many distinct
  // values regardless of corpus size) aggregates map-side, a cumulative
  // count over the DESCENDING histogram finds the largest values where
  // coverage reaches ceil(n/3) and ceil(2n/3), and assignment is one
  // per-row compare against the two broadcast cutoffs. Ties share a bucket
  // (sizes are ~n/3, not exactly — the threshold contract, same as CCNet's
  // own percentile cutoffs).
  def curatePplBuckets(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // three consumers (histogram, count, assignment) — one materialization
    val scores = lmScores(s, dir).select(col("doc_id"), col("avg_millibits"))
      .localCheckpoint()
    val hist = scores.groupBy(col("avg_millibits")).agg(count(lit(1)).as("c"))
    // window over the HISTOGRAM (≤ 64k rows by construction), not the corpus
    val cum = hist.withColumn("cum", sum(col("c")).over(
      Window.orderBy(col("avg_millibits").desc) // lint:series-grain (bucket-grain aggregate)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cuts = cum.crossJoin(broadcast(
        scores.agg(count(lit(1)).as("n"))))
      .agg(
        max(when(col("cum") >= expr("(n + 2) div 3"),
          col("avg_millibits"))).as("c1"),
        max(when(col("cum") >= expr("(2 * n + 2) div 3"),
          col("avg_millibits"))).as("c2"))
    scores.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("avg_millibits"),
        when(col("avg_millibits") >= col("c1"), "head")
          .when(col("avg_millibits") >= col("c2"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  private val curatePplBucketsOracle =
    s"""WITH $lmScoresSql,
       |hist AS (SELECT avg_millibits, COUNT(*) AS c FROM p2 GROUP BY avg_millibits),
       |cum AS (
       |  SELECT avg_millibits, c,
       |         SUM(c) OVER (ORDER BY avg_millibits DESC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM hist),
       |n1 AS (SELECT COUNT(*) AS n FROM p2),
       |cuts AS (
       |  SELECT MAX(CASE WHEN cum >= (n + 2) // 3 THEN avg_millibits END) AS c1,
       |         MAX(CASE WHEN cum >= (2 * n + 2) // 3 THEN avg_millibits END) AS c2
       |  FROM cum CROSS JOIN n1)
       |SELECT doc_id, avg_millibits,
       |       CASE WHEN avg_millibits >= c1 THEN 'head'
       |            WHEN avg_millibits >= c2 THEN 'middle'
       |            ELSE 'tail' END AS bucket
       |FROM p2 CROSS JOIN cuts
       |ORDER BY doc_id""".stripMargin

  // ---- curate_classifier_score ----------------------------------------------
  // Linear-classifier quality scoring — the fastText/DCLM-class filter
  // (score every document under a PRETRAINED hashed linear model and keep
  // what clears the bar), reduced to its exact-arithmetic serving core.
  // The "model" is a hashed bag-of-words weight table: a token's weight is
  // a pure function of md5(token) — conv(first 4 hex, 16, 10) mod 2001
  // minus 1000, i.e. an integer milliweight in [-1000, 1000] — standing in
  // for trained weights with the same storage/serving shape (the hashing
  // trick: no vocabulary file, fixed memory, OOV tokens score like any
  // other bucket). Doc score = mean token milliweight (integer div,
  // truncation identical both engines — negative sums verified), keep =
  // score above the fixed 0 bar. Serving cost is ONE projection-explode +
  // one map-side-combining hash-agg per doc — no joins, no broadcast
  // model table (the model rides in the hash function), so scoring 100 TB
  // is scan-bound, the property that made fastText filtering the default
  // at CommonCrawl scale. The oracle replays the hash → weight → mean →
  // threshold pipeline bit-for-bit from the raw table.
  def curateClassifierScore(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), explode(expr(toksE)).as("tok"))
      .select(col("doc_id"),
        (expr("CAST(conv(substring(md5(tok), 1, 4), 16, 10) AS BIGINT)") % 2001L
          - 1000L).as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        expr("CAST(sum(w) AS BIGINT) div count(1)").as("score_milli"))
      .withColumn("keep", col("score_milli") > 0L)
      .orderBy(col("doc_id"))

  private val curateClassifierScoreOracle = {
    // 4-hex-digit parse without from_hex: positional instr over the hex
    // alphabet (the streamJoinEnrich convention, widened to 4 chars)
    val hex = "'0123456789abcdef'"
    def nib(i: Int, mult: Long) =
      s"(instr($hex, substring(h, $i, 1)) - 1) * $mult"
    s"""WITH t AS (
       |  SELECT doc_id, substring(md5(unnest(list_filter(
       |           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))), 1, 4) AS h
       |  FROM documents),
       |w AS (
       |  SELECT doc_id,
       |         (${nib(1, 4096L)} + ${nib(2, 256L)} + ${nib(3, 16L)} + ${nib(4, 1L)}) % 2001 - 1000 AS w
       |  FROM t)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |       CAST(SUM(w) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS score_milli,
       |       CAST(SUM(w) AS BIGINT) // CAST(COUNT(*) AS BIGINT) > 0 AS keep
       |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---- pipeline_pretrain_export ---------------------------------------------
  // The END-TO-END daily export (r11) — the composite job a pretraining
  // data team actually schedules, chaining the engine's own operators:
  // curate_keep_drop's full decision battery (length floor, langid vote,
  // quality score, MinHash-LSH near-dup suppression — first failing rule
  // wins) selects the survivors, which route to 4 training shards by the
  // deterministic md5 device, land as a shard-partitioned parquet layout,
  // and the key returns the shard MANIFEST read back FROM THE WRITTEN
  // FILES (doc counts, whitespace-token totals, mergeable corpus
  // fingerprint per shard). The oracle replays the ENTIRE pipeline —
  // curation CTEs composed with the shard/manifest CTEs — so a wrong
  // decision anywhere upstream (one extra or missing survivor) shifts a
  // shard's count/tokens/fingerprint and fails the hash. This is the
  // composition proof: the operators don't just pass in isolation, they
  // agree with the oracle when chained the way a user chains them.
  //
  // Scale: the decision plan is curate_keep_drop's (bucketed LSH, no
  // all-pairs), the export is sink_shards' one hash-partitioned shuffle;
  // chaining adds one equi-join of the corpus against the keep set —
  // at 100 TB the whole job is the sum of its parts, no new topology.
  def pipelinePretrainExport(s: SparkSession, dir: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_pretrain_export" +
      s"-${ProcessHandle.current().pid()}"
    graft.sink.Sinks.deleteDir(path)
    val keep = curateKeepDrop(s, dir).filter(col("keep")).select(col("doc_id"))
    load(s, dir, "documents")
      .join(keep, Seq("doc_id"))
      .withColumn("shard",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int") % 4).cast("int"))
      .write.partitionBy("shard").parquet(path)
    s.read.parquet(path)
      .withColumn("n_toks", size(expr(toksE)))
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks").cast("long")).as("n_tokens"),
        graft.functions.Scalars.corpusFp(col("doc_id"), col("text"))
          .as("shard_fp"))
      .orderBy(col("shard"))
  }

  /** Oracle: the whole pipeline replayed relationally — the composed
    * keep/drop decision feeding the shard-manifest derivation. */
  private def pipelinePretrainExportOracle(keepDropOracle: String): String =
    s"""WITH kd AS ($keepDropOracle),
       |surv AS (
       |  SELECT d.* FROM documents d
       |  JOIN kd ON kd.doc_id = d.doc_id AND kd.keep),
       |sh AS (
       |  SELECT *,
       |         ((instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
       |          + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 4 AS shard,
       |         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n_toks
       |  FROM surv)
       |SELECT CAST(shard AS INT) AS shard, COUNT(*) AS n_docs,
       |       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |       ${graft.functions.Scalars.corpusFpSql("doc_id", "text")} AS shard_fp
       |FROM sh GROUP BY shard ORDER BY shard""".stripMargin

  // ---- curate_dataset_card ----------------------------------------------------
  // The per-source DATASET CARD — the datasheet ("Datasheets for Datasets",
  // Gebru et al. 2021) a curation team publishes per corpus slice, and the
  // first report a data vendor is asked for: volume (docs, chars), language
  // mix concentration (Simpson index over langs, integer ppm — the
  // agg_diversity device at source grain), exact-duplicate burden
  // (docs − distinct md5(text) — dedup_exact's hash at report grain), and
  // the LOWER MEDIAN document length from a (source, n_chars) VALUE-GRAIN
  // collapse — the agg_median discipline: the running-count window sorts
  // distinct lengths per source, never documents. Everything integer:
  // counts, sums, truncating-ppm Simpson, and a median that is a real data
  // value. Plan: three map-side-combining aggs over one projection of the
  // corpus (source grain, (source, lang) grain, (source, n_chars) grain) +
  // metadata-sized joins; at 100 TB every post-scan frame is thousands of
  // rows at most.
  def curateDatasetCard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = load(s, dir, "documents")
      .select(col("source"), col("lang"), col("n_chars"),
        md5(col("text").cast("binary")).as("h"))
    val per = base.groupBy(col("source")).agg(
      count(lit(1)).as("docs"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("n_chars")).as("total_chars"),
      (count(lit(1)) - countDistinct(col("h"))).as("dup_docs"))
    val sl = base.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
    val simp = sl.groupBy(col("source")).agg(
      expr("SUM(c * c) * 1000000 div (SUM(c) * SUM(c))").as("lang_simpson_ppm"))
    val vc = base.groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("n_chars")) // lint:series-grain (value-grain collapse)
    val wAll = Window.partitionBy(col("source")) // lint:series-grain (value-grain collapse)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val med = vc.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy(col("source")).agg(min(col("n_chars")).as("median_chars"))
    per.join(simp, Seq("source")).join(med, Seq("source"))
      .select(col("source"), col("docs"), col("n_langs"), col("total_chars"),
        col("dup_docs"), col("median_chars"), col("lang_simpson_ppm"))
      .orderBy(col("source"))
  }

  private val curateDatasetCardOracle =
    """WITH base AS (
      |  SELECT source, lang, n_chars, md5(text) AS h FROM documents),
      |per AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
      |         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |         CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS dup_docs
      |  FROM base GROUP BY source),
      |sl AS (SELECT source, lang, COUNT(*) AS c FROM base GROUP BY 1, 2),
      |simp AS (
      |  SELECT source,
      |         CAST(SUM(c * c) * 1000000 // (SUM(c) * SUM(c)) AS BIGINT)
      |           AS lang_simpson_ppm
      |  FROM sl GROUP BY source),
      |vc AS (SELECT source, n_chars, COUNT(*) AS c FROM base GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, n_chars,
      |         SUM(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
      |         SUM(c) OVER (PARTITION BY source) AS n
      |  FROM vc),
      |med AS (
      |  SELECT source, MIN(n_chars) AS median_chars
      |  FROM cum WHERE cum >= (n + 1) // 2 GROUP BY source)
      |SELECT p.source, p.docs, p.n_langs, p.total_chars, p.dup_docs,
      |       m.median_chars, s.lang_simpson_ppm
      |FROM per p JOIN simp s USING (source) JOIN med m USING (source)
      |ORDER BY p.source""".stripMargin

  // ---- curate_dsir --------------------------------------------------------
  // DSIR domain selection (Xie et al. 2023, "Data Selection for Language
  // Models via Importance Resampling"): score every raw document by the
  // log importance weight log(p_target(x)/p_raw(x)) under two hashed
  // bag-of-words unigram models — the method behind targeted pretraining
  // mixes (select web text that "looks like" Wikipedia/books). The target
  // domain here is the src0-src3 slice of the corpus; raw is the whole
  // corpus. Features are tokens hashed into 256 buckets (first two hex
  // chars of md5 — the sample_split_hash device, identical in both
  // engines), so the MODEL is a 256-row table no matter the corpus size.
  // All log arithmetic is the lmScores MILLIBIT device (floor(log2) by bit
  // length + exact linear interpolation, add-one smoothed): a document's
  // log-weight in millibits is
  //   sum_tokens(mb(c_t[b]+1) - mb(c_r[b]+1)) - n_tokens*(mb(N_t+256) - mb(N_r+256))
  // — every term an exact integer, so no libm call can flip a keep
  // decision. `keep` marks docs above the corpus-mean weight by integer
  // cross-multiplication (the curate_lm_score discipline).
  //
  // Shape: ONE token-grain scan trains both models (a 256-row hash agg
  // with a conditional target count); scoring joins the token stream to
  // the BROADCAST 256-row delta table and hash-aggs on doc_id; corpus
  // constants ride broadcast 1-row anchors. Training and applying stay
  // two scans at any corpus size — the same plan at 100 TB.
  def curateDsir(s: SparkSession, dir: String): DataFrame = {
    val mb = (c: String) =>
      s"""(length(bin($c)) - 1) * 1000
         | + ($c - shiftleft(1L, length(bin($c)) - 1)) * 1000
         |   div shiftleft(1L, length(bin($c)) - 1)""".stripMargin
    val toks = load(s, dir, "documents")
      .select(col("doc_id"), col("source"), explode(expr(toksE)).as("token"))
      .withColumn("b", conv(substring(md5(col("token")), 1, 2), 16, 10)
        .cast("int"))
    val model = toks.groupBy(col("b")).agg(
        count(lit(1)).as("c_r"),
        sum(when(col("source").isin("src0", "src1", "src2", "src3"), 1L)
          .otherwise(0L)).as("c_t"))
      .withColumn("delta",
        expr(mb("(c_t + 1)")) - expr(mb("(c_r + 1)")))
      .select(col("b"), col("delta"))
    val consts = toks.agg(
        count(lit(1)).as("n_r"),
        sum(when(col("source").isin("src0", "src1", "src2", "src3"), 1L)
          .otherwise(0L)).as("n_t"))
      .withColumn("k_norm",
        expr(mb("(n_t + 256)")) - expr(mb("(n_r + 256)")))
      .select(col("k_norm"))
    val perDoc = toks.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("delta")).as("sum_delta"))
      .crossJoin(broadcast(consts))
      .withColumn("dsir_millibits",
        col("sum_delta") - col("n_tokens") * col("k_norm"))
      .select(col("doc_id"), col("n_tokens"), col("dsir_millibits"))
    val mean = perDoc.agg(
      sum(col("dsir_millibits").cast("decimal(38,0)")).as("tot"),
      count(lit(1)).cast("decimal(38,0)").as("n_docs"))
    perDoc.crossJoin(broadcast(mean))
      .withColumn("keep",
        (col("dsir_millibits").cast("decimal(38,0)") * col("n_docs") >
          col("tot")).cast("int"))
      .select(col("doc_id"), col("n_tokens"), col("dsir_millibits"), col("keep"))
      .orderBy(col("doc_id"))
  }

  private val curateDsirOracle = {
    val mb = (c: String) =>
      s"""(length(format('{:b}', $c)) - 1) * 1000
         | + ($c - (CAST(1 AS BIGINT) << (length(format('{:b}', $c)) - 1))) * 1000
         |   // (CAST(1 AS BIGINT) << (length(format('{:b}', $c)) - 1))""".stripMargin
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
       |  FROM documents),
       |tb AS (
       |  SELECT doc_id, source,
       |         (instr('0123456789abcdef', substring(md5(token), 1, 1)) - 1) * 16
       |           + (instr('0123456789abcdef', substring(md5(token), 2, 1)) - 1) AS b
       |  FROM t),
       |model AS (
       |  SELECT b, COUNT(*) AS c_r,
       |         CAST(SUM(CASE WHEN source IN ('src0','src1','src2','src3') THEN 1 ELSE 0 END) AS BIGINT) AS c_t
       |  FROM tb GROUP BY b),
       |md AS (
       |  SELECT b,
       |         CAST(${mb("(c_t + 1)")} AS BIGINT)
       |           - CAST(${mb("(c_r + 1)")} AS BIGINT) AS delta
       |  FROM model),
       |consts AS (
       |  SELECT CAST(${mb("(n_t + 256)")} AS BIGINT)
       |           - CAST(${mb("(n_r + 256)")} AS BIGINT) AS k_norm
       |  FROM (SELECT COUNT(*) AS n_r,
       |               CAST(SUM(CASE WHEN source IN ('src0','src1','src2','src3') THEN 1 ELSE 0 END) AS BIGINT) AS n_t
       |        FROM tb) z),
       |perdoc AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(delta) AS BIGINT) AS sum_delta
       |  FROM tb JOIN md USING (b) GROUP BY doc_id),
       |scored AS (
       |  SELECT doc_id, n_tokens,
       |         sum_delta - n_tokens * k_norm AS dsir_millibits
       |  FROM perdoc, consts),
       |mean AS (
       |  SELECT CAST(SUM(dsir_millibits) AS HUGEINT) AS tot,
       |         CAST(COUNT(*) AS HUGEINT) AS n_docs
       |  FROM scored)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(dsir_millibits AS BIGINT) AS dsir_millibits,
       |       CAST(CASE WHEN CAST(dsir_millibits AS HUGEINT) * n_docs > tot
       |            THEN 1 ELSE 0 END AS INT) AS keep
       |FROM scored, mean ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map[String, Q](
    "curate_dsir" -> (curateDsir _),
    "curate_dataset_card" -> (curateDatasetCard _),
    "pipeline_pretrain_export" -> (pipelinePretrainExport _),
    "curate_classifier_score" -> (curateClassifierScore _),
    "text_pii_scrub" -> (textPiiScrub _),
    "curate_keep_drop" -> (curateKeepDrop _),
    "curate_gopher_rules" -> (curateGopherRules _),
    "curate_mix_domains" -> (curateMixDomains _),
    "curate_token_budget" -> (curateTokenBudget _),
    "curate_boilerplate" -> (curateBoilerplate _),
    "curate_lm_score" -> (curateLmScore _),
    "curate_ppl_buckets" -> (curatePplBuckets _))

  def oracles: Map[String, String] = Map(
    "curate_dsir" -> curateDsirOracle,
    "curate_dataset_card" -> curateDatasetCardOracle,
    "pipeline_pretrain_export" -> pipelinePretrainExportOracle(
      curateKeepDropOracle(
        TextAnalysis.oracles("text_quality"),
        TextAnalysis.oracles("text_langid"),
        Dedup.oracles("dedup_minhash_lsh"))),
    "curate_classifier_score" -> curateClassifierScoreOracle,
    "text_pii_scrub" -> textPiiScrubOracle,
    "curate_keep_drop" -> curateKeepDropOracle(
      TextAnalysis.oracles("text_quality"),
      TextAnalysis.oracles("text_langid"),
      Dedup.oracles("dedup_minhash_lsh")),
    "curate_gopher_rules" -> curateGopherRulesOracle,
    "curate_mix_domains" -> curateMixDomainsOracle,
    "curate_token_budget" -> curateTokenBudgetOracle,
    "curate_boilerplate" -> curateBoilerplateOracle,
    "curate_lm_score" -> curateLmScoreOracle,
    "curate_ppl_buckets" -> curatePplBucketsOracle)
}
