package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables.load

/** Adversarial-scale stress corpora for the dedup family (VERDICT r4 §6):
  * the skew patterns that break naive dedup at 100 TB, planted
  * DETERMINISTICALLY as a pure SQL-expressible derivation of `documents`,
  * so the DuckDB oracle can re-derive the identical corpus and replay the
  * identical algorithm over it — the same correctness contract as every
  * other key, now under skew.
  *
  * Planted structure:
  *  - a hot shingle shared by (almost) the WHOLE corpus — the frequency
  *    cap must drop it, or the inverted-index self-join goes quadratic in
  *    corpus size;
  *  - a shingle group sitting EXACTLY at the corpus-relative cap boundary
  *    (df = n/25 = the cap when n ≥ 500) — retained, generating the
  *    worst-case allowed candidate mass (cap²/2 pairs), none of which may
  *    reach the output;
  *  - a group one past the boundary (df = cap+1) — dropped entirely;
  *  - a giant near-duplicate cluster (10% of the corpus, 7 text variants,
  *    J ≥ 0.85 across variants) — connected components must label it as
  *    ONE cluster without materializing anything quadratic in its size
  *    beyond the verified pair list;
  *  - a 5-document chain whose adjacent links share 90% of their text but
  *    whose ENDS share nothing above threshold — pair-level dedup
  *    over-deletes here; only transitive clustering handles it.
  */
object DedupStress {

  type Q = (SparkSession, String) => DataFrame

  // ---- word pools (lowercase alpha only — survive the tokenizer intact) ----
  private val chainHotW: Array[String] =
    ("alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo " +
      "lima mike november oscar papa quebec romeo sierra tango uniform " +
      "victor whiskey xray yankee zulu acorn birch").split(' ')

  private val chainGiantW: Array[String] =
    Array.tabulate(54)(i => f"orb${i + 1}%02d")

  private def window(pool: Array[String], start: Int, len: Int = 20): String =
    pool.slice(start, start + len).mkString(" ")

  // ---- corpus 1: hot/boundary shingles + a 3-doc chain (ngram path) --------
  // Chain docs 1/11/21 carry 20-word windows shifted by 4 over a 28-word
  // pool: adjacent J = 14/22 ≈ 0.636 (≥ 0.6 — a pair), ends J = 10/26 ≈
  // 0.385 (< 0.6 — not a pair). Everyone else gets the universal hot
  // phrase (df = n-3 ≫ cap → dropped), doc_id%25==3 adds the at-boundary
  // phrase (df = n/25 = cap → retained), doc_id%25==7 plus doc 12 adds
  // the one-past phrase (df = cap+1 → dropped).
  private[llm] def skewHot(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") === 1, lit(window(chainHotW, 0)))
        .when(col("doc_id") === 11, lit(window(chainHotW, 4)))
        .when(col("doc_id") === 21, lit(window(chainHotW, 8)))
        .otherwise(concat(col("text"), lit(" hotone hottwo hotthree"),
          when(col("doc_id") % 25 === 3,
            lit(" capone captwo capthree capfour")).otherwise(lit("")),
          when(col("doc_id") % 25 === 7 || col("doc_id") === 12,
            lit(" ovone ovtwo ovthree ovfour")).otherwise(lit(""))))
        .as("text"))

  private def skewHotCte: String =
    s"""skewhot AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id = 1 THEN '${window(chainHotW, 0)}'
       |         WHEN doc_id = 11 THEN '${window(chainHotW, 4)}'
       |         WHEN doc_id = 21 THEN '${window(chainHotW, 8)}'
       |         ELSE text || ' hotone hottwo hotthree' ||
       |           CASE WHEN doc_id % 25 = 3 THEN ' capone captwo capthree capfour' ELSE '' END ||
       |           CASE WHEN doc_id % 25 = 7 OR doc_id = 12 THEN ' ovone ovtwo ovthree ovfour' ELSE '' END
       |    END AS text
       |  FROM documents)""".stripMargin

  def dedupSkewNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupNgramJaccardOver(s, skewHot(s, dir))

  private val dedupSkewNgramOracle = Dedup.ngramJaccardOracleFrom(
    s"$skewHotCte,\n${Dedup.shingledSqlFrom("skewhot")}")

  // ---- corpus 2: giant cluster + 15-doc chain (LSH + clustering path) ------
  // doc_id%10==0 (10% of the corpus) becomes one near-dup family: 12 shared
  // core words + a variant suffix keyed by doc_id%7 — same-variant docs are
  // exact dups (J=1, identical minhash bands → certain candidates), and
  // cross-variant J = 11/13 ≈ 0.846, so the family must collapse to ONE
  // cluster labeled doc 0. Docs 3,13,…,143 carry 40-word windows shifted
  // by 1 over a 54-word pool: adjacent J = 37/39 ≈ 0.949 (band-hit
  // probability 1-(1-J⁴)⁴ ≈ 0.9987 per link, with J ≈ 0.86 skip-one
  // edges as redundancy — the deterministic minhash outcome is pinned by
  // this spec), while the chain ENDS share only 26 words → J = 24/52 ≈
  // 0.462 < 0.5: the chain clusters only transitively, never directly.
  private val giantCore =
    "gcone gctwo gcthree gcfour gcfive gcsix gcseven gceight gcnine gcten gceleven gctwelve variant "

  private val chainIds: Seq[Int] = (0 to 14).map(i => 3 + 10 * i)

  private[llm] def skewGiant(s: SparkSession, dir: String): DataFrame = {
    val giant = when(col("doc_id") % 10 === 0,
      concat(lit(giantCore), (col("doc_id") % 7).cast("string")))
    val withChain = chainIds.zipWithIndex.foldLeft(giant) {
      case (acc, (id, i)) =>
        acc.when(col("doc_id") === id, lit(window(chainGiantW, i, 40)))
    }
    load(s, dir, "documents").select(col("doc_id"),
      withChain.otherwise(col("text")).as("text"))
  }

  private def skewGiantCte: String = {
    val chainCases = chainIds.zipWithIndex.map { case (id, i) =>
      s"WHEN doc_id = $id THEN '${window(chainGiantW, i, 40)}'"
    }.mkString("\n         ")
    s"""skewgiant AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 10 = 0 THEN '$giantCore' || CAST(doc_id % 7 AS VARCHAR)
       |         $chainCases
       |         ELSE text END AS text
       |  FROM documents)""".stripMargin
  }

  def dedupSkewClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupClustersOver(s, skewGiant(s, dir))

  private val dedupSkewClustersOracle = Dedup.clustersOracleFrom(
    s"$skewGiantCte,\n${Dedup.lshCtesFrom("skewgiant")}", "skewgiant")

  val queries: Map[String, Q] = Map[String, Q](
    "dedup_skew_ngram" -> (dedupSkewNgram _),
    "dedup_skew_clusters" -> (dedupSkewClusters _))

  val oracles: Map[String, String] = Map(
    "dedup_skew_ngram" -> dedupSkewNgramOracle,
    "dedup_skew_clusters" -> dedupSkewClustersOracle)
}
