package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function surface of the reference (SURVEY.md §2.7), as pure
  * `Column` functions. Semantics pinned by the reference:
  *
  *  - unparseable numerics default to 0.0, NOT null
  *    (ref `monday_etl_automated.py:305-309,381-385`)
  *  - unparseable dates are null (ref `monday_etl_automated.py:263-267`)
  *  - timeline strings split on " - " yield dates only when exactly 2 parts
  *    (ref `monday_etl_automated.py:312-319`)
  *  - board_relation JSON carries `linkedPulseIds[0].linkedPulseId`
  *    (ref `monday_etl_automated.py:390-395`)
  *
  * All of these use `try_*` expressions so behavior is identical whether or
  * not `spark.sql.ansi.enabled` is set (Spark 4 defaults it on).
  */
object Scalars {

  /** `float(text)` with swallow-on-error → 0.0 default.
    * Empty string is also unparseable → 0.0, matching the reference's
    * truthy-check-then-float flow. */
  def castFloatZero(c: Column): Column =
    coalesce(c.try_cast("double"), lit(0.0))

  /** `strptime('%Y-%m-%d')`, null on failure. */
  def parseDate(c: Column): Column =
    to_date(try_to_timestamp(c, lit("yyyy-MM-dd")))

  /** ISO-8601 timestamp, `Z` handled natively, null on failure
    * (ref `etl_final_fix.py:23-31` normalizes Z→+00:00 by hand; Spark's
    * parser accepts both). */
  def parseTimestampIso(c: Column): Column = try_to_timestamp(c)

  /** `"2025-01-01 - 2025-03-31"` → (start, end); both null unless the split
    * yields exactly 2 parts. The reference assigns start then end inside one
    * try-block (`monday_etl_automated.py:312-319`), so a failed START parse
    * aborts before end is assigned: "garbage - 2025-03-31" → (null, null),
    * while "2025-01-01 - garbage" → (2025-01-01, null). end is therefore
    * gated on start parsing. */
  def splitTimeline(c: Column): (Column, Column) = {
    val parts = split(c, " - ")
    val start = when(size(parts) === 2, parseDate(trim(element_at(parts, 1))))
    val end = when(size(parts) === 2 && start.isNotNull,
      parseDate(trim(element_at(parts, 2))))
    (start, end)
  }

  /** Extract `linkedPulseIds[0].linkedPulseId` from a board_relation JSON
    * payload; null on malformed/absent. */
  def linkedPulseId(c: Column): Column =
    get_json_object(c, "$.linkedPulseIds[0].linkedPulseId")

  /** `((latest - prior) / prior) * 100` (ref `advanced_monitoring.py:403-405`).
    * Rounded in the decimal domain — see Analytics "exact-rounding helpers"
    * for why round(double, 2) is not portable across engines. */
  def pctChange(latest: Column, prior: Column): Column =
    round(((latest - prior) / prior * 100).cast("decimal(28,6)"), 2)
      .cast("double")

  /** Empty-string-is-missing: '' → null so `coalesce(default)` applies
    * (ref truthy check `monday_etl_automated.py:259-261`). */
  def nonEmpty(c: Column): Column = when(length(c) > 0, c)

  /** Mergeable corpus fingerprint for the round-trip keys: SUM of per-row
    * 60-bit md5 prefixes (id ␁ payload) in DECIMAL(38,0), rendered as a
    * string. The old formulation — md5 over collect_list of every text in
    * the group — carried the WHOLE group's corpus as aggregation state,
    * which is exactly the per-group-state-proportional-to-data pattern
    * that dies at 100 TB. The sum is commutative and map-side combining
    * (constant state per group); binding the row id into each hash keeps
    * any single-row corruption, loss, duplication, or id swap detectable,
    * which is the property the round-trip keys actually assert. 60-bit
    * terms in a 38-digit decimal leave ~2^66 rows of headroom before
    * overflow. Oracle twin: [[corpusFpSql]]. */
  def corpusFp(id: Column, payload: Column): Column =
    sum(conv(substring(md5(concat(id.cast("string"), lit("\u0001"), payload)),
        1, 15), 16, 10).cast("decimal(38,0)"))
      .cast("string")

  /** DuckDB formulation of [[corpusFp]]: same per-row hash (md5 agrees
    * across engines on UTF-8), same exact DECIMAL(38,0) sum, same plain
    * integer string rendering. */
  def corpusFpSql(id: String, payload: String): String =
    s"CAST(CAST(SUM(CAST(CAST(concat('0x', substr(md5(concat(CAST($id AS VARCHAR), chr(1), $payload)), 1, 15)) AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR)"
}
