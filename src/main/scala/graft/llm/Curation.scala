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

  val queries: Map[String, Q] = Map[String, Q](
    "text_pii_scrub" -> (textPiiScrub _),
    "curate_keep_drop" -> (curateKeepDrop _))

  def oracles: Map[String, String] = Map(
    "text_pii_scrub" -> textPiiScrubOracle,
    "curate_keep_drop" -> curateKeepDropOracle(
      TextAnalysis.oracles("text_quality"),
      TextAnalysis.oracles("text_langid"),
      Dedup.oracles("dedup_minhash_lsh")))
}
