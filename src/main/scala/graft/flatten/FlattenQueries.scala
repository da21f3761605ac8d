package graft.flatten

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked query keys for the flatten layer (SURVEY.md §2.2).
  *
  * Both engines parse the SAME raw GraphQL JSON fixture independently: Spark
  * through `Flatten` (explicit schema + explode + dispatch), DuckDB through
  * `read_json` + `unnest` + `list_filter` lambdas. Nothing is pre-flattened
  * for the oracle — it re-derives every pinned parse semantic from the raw
  * documents, so a drift in any default/error rule shows up as a hash
  * mismatch.
  */
object FlattenQueries {

  type Q = (SparkSession, String) => DataFrame

  private def root = Flatten.fixtureRoot

  /** Shared oracle prologue: files → (extraction_date, item) rows. */
  private def itemsCte(boardDir: String): String =
    s"""WITH raw AS (
       |  SELECT filename, data
       |  FROM read_json('$root/$boardDir/*.json', filename=true)
       |),
       |boards AS (
       |  SELECT CAST(regexp_extract(filename, '(\\d{4}-\\d{2}-\\d{2})', 1) AS DATE) AS ed,
       |         unnest(data.boards) AS board
       |  FROM raw),
       |items AS (
       |  SELECT ed, unnest(board.items_page.items) AS item FROM boards)""".stripMargin

  /** First non-empty-text column_values entry by id → its text. */
  private def t(id: String, src: String = "item.column_values"): String =
    s"list_filter($src, c -> c.id = '$id' AND c.text IS NOT NULL AND c.text <> '')[1].text"

  /** Same, dispatched on column.type. Non-status types take the LAST
    * non-empty entry (the reference loop overwrites per match); status is
    * first-wins — mirrors Flatten.cvTextByType. */
  private def tt(tpe: String, src: String = "sub.column_values",
      firstWins: Boolean = false): String = {
    val idx = if (firstWins) "1" else "-1"
    s"list_filter($src, c -> c.column.type = '$tpe' AND c.text IS NOT NULL AND c.text <> '')[$idx].text"
  }

  /** Numbers dispatch adds the reference's parse guard: only a
    * float-parseable text overwrites, so the LAST parseable non-empty
    * entry wins — mirrors Flatten.cvNumbersText. "Parseable" is the pinned
    * plain-decimal grammar (Flatten.NumberGrammar), NOT the engine-native
    * TRY_CAST: native casts disagree across Python/Spark/DuckDB on exotic
    * literals ('1_000', 'inf'), so the guard's accept-set is defined by the
    * shared regex in both engines. */
  private def ttNum(src: String = "sub.column_values"): String =
    s"list_filter($src, c -> c.column.type = 'numbers' AND c.text IS NOT NULL AND c.text <> '' AND regexp_matches(c.text, '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$$'))[-1].text"

  private def v(id: String, src: String = "item.column_values"): String =
    s"list_filter($src, c -> c.id = '$id' AND c.text IS NOT NULL AND c.text <> '')[1].value"

  private def linkedSql(relId: String): String =
    s"""CASE WHEN json_valid(${v(relId)})
       |            THEN json_extract_string(${v(relId)}, '$$.linkedPulseIds[0].linkedPulseId') END AS linked_subitem_id,
       |       ${t(relId)} AS linked_subitem_name""".stripMargin

  private val tail =
    """TRY_CAST(item.created_at AS TIMESTAMP) AS created_at,
      |       TRY_CAST(item.updated_at AS TIMESTAMP) AS updated_at,
      |       ed AS extraction_date, CAST(ed AS TIMESTAMP) AS extraction_timestamp""".stripMargin

  private val flattenProjectsOracle =
    s"""${itemsCte("projects")}
       |SELECT item.id AS project_id, item.name AS project_name,
       |       ${t("person")} AS po,
       |       CAST(try_strptime(${t("date4")}, '%Y-%m-%d') AS DATE) AS data_avvio,
       |       ${t("status__1")} AS var_non_var,
       |       ${t("status_1")} AS circolo,
       |       ${t("status0")} AS tipologia,
       |       ${t("status1")} AS stato_pipeline,
       |       ${t("status6")} AS aperto_chiuso,
       |       $tail
       |FROM items ORDER BY extraction_date, CAST(project_id AS BIGINT)""".stripMargin

  private val flattenSubitemsOracle =
    s"""${itemsCte("projects")},
       |subs AS (
       |  SELECT ed, item.id AS project_id, unnest(item.subitems) AS sub FROM items),
       |ext AS (
       |  SELECT ed, project_id, sub,
       |         ${tt("timeline")} AS tl,
       |         ${ttNum()} AS num
       |  FROM subs)
       |SELECT sub.id AS subitem_id, project_id, sub.name AS subitem_name,
       |       ${tt("person")} AS po,
       |       CASE WHEN len(str_split(tl, ' - ')) = 2
       |            THEN CAST(try_strptime(trim(str_split(tl, ' - ')[1]), '%Y-%m-%d') AS DATE) END AS timeline_start,
       |       CASE WHEN len(str_split(tl, ' - ')) = 2
       |             AND try_strptime(trim(str_split(tl, ' - ')[1]), '%Y-%m-%d') IS NOT NULL
       |            THEN CAST(try_strptime(trim(str_split(tl, ' - ')[2]), '%Y-%m-%d') AS DATE) END AS timeline_end,
       |       COALESCE(TRY_CAST(num AS DOUBLE), 0.0) AS revenue_amount,
       |       ${tt("status", firstWins = true)} AS status,
       |       CAST(NULL AS VARCHAR) AS tipologia,
       |       TRY_CAST(sub.created_at AS TIMESTAMP) AS created_at,
       |       TRY_CAST(sub.updated_at AS TIMESTAMP) AS updated_at,
       |       ed AS extraction_date, CAST(ed AS TIMESTAMP) AS extraction_timestamp
       |FROM ext ORDER BY extraction_date, CAST(subitem_id AS BIGINT)""".stripMargin

  private val flattenPersonnelOracle =
    s"""${itemsCte("personnel")}
       |SELECT item.id AS cost_id, item.name AS cost_name,
       |       ${t("person")} AS person,
       |       COALESCE(TRY_CAST(${t("numbers")} AS DOUBLE), 0.0) AS amount,
       |       ${linkedSql("board_relation1")},
       |       $tail
       |FROM items ORDER BY extraction_date, CAST(cost_id AS BIGINT)""".stripMargin

  private val flattenTravelOracle =
    s"""${itemsCte("travel")}
       |SELECT item.id AS cost_id, item.name AS cost_name,
       |       ${t("person")} AS person,
       |       COALESCE(TRY_CAST(${t("numbers")} AS DOUBLE), 0.0) AS amount,
       |       CAST(try_strptime(${t("date")}, '%Y-%m-%d') AS DATE) AS date,
       |       ${t("status")} AS stato,
       |       ${t("dropdown")} AS pagata_con,
       |       ${linkedSql("board_relation39")},
       |       $tail
       |FROM items ORDER BY extraction_date, CAST(cost_id AS BIGINT)""".stripMargin

  private val flattenSuppliersOracle =
    s"""${itemsCte("suppliers")}
       |SELECT item.id AS cost_id, item.name AS cost_name,
       |       COALESCE(TRY_CAST(${t("numbers")} AS DOUBLE), 0.0) AS imponibile,
       |       ${t("status")} AS tipologia,
       |       ${t("status_1")} AS stato_ordine,
       |       COALESCE(TRY_CAST(${t("numbers8")} AS DOUBLE), 0.0) AS iva,
       |       ${linkedSql("board_relation")},
       |       $tail
       |FROM items ORDER BY extraction_date, CAST(cost_id AS BIGINT)""".stripMargin

  /** Honest parent-child denormalization: the children arrive NESTED under
    * the parent (as the API returns them) and a single explode carries the
    * parent columns down — the join is free, no shuffle anywhere in the plan
    * (ref `monday_etl_automated.py:283-289`). Replaces the round-1
    * join→collect_list→explode round-trip. */
  def joinParentChildDenorm(s: SparkSession, dir: String): DataFrame =
    Flatten.items(s, s"$root/projects")
      .select(col("extraction_date"),
        col("item.id").as("project_id"), col("item.name").as("project_name"),
        explode(col("item.subitems")).as("sub"))
      .select(col("extraction_date"), col("project_id"), col("project_name"),
        col("sub.id").as("subitem_id"), col("sub.name").as("subitem_name"))
      .orderBy(col("extraction_date"), col("subitem_id").cast("long"))

  private val joinParentChildDenormOracle =
    s"""${itemsCte("projects")}
       |SELECT ed AS extraction_date, item.id AS project_id,
       |       item.name AS project_name,
       |       sub.id AS subitem_id, sub.name AS subitem_name
       |FROM (SELECT ed, item, unnest(item.subitems) AS sub FROM items) t
       |ORDER BY extraction_date, CAST(subitem_id AS BIGINT)""".stripMargin

  /** The reference's FLAGSHIP analytics over the ACTUAL flattened tables —
    * flatten → snapshot join → daily metrics with LAG, end-to-end under one
    * oracle (ref `advanced_monitoring.py:51-81` applied to the output of
    * `monday_etl_automated.py:238-324`). The DuckDB side re-derives the
    * flattened relations from the raw JSON and runs the same analytics, so
    * a drift in EITHER layer fails the hash. */
  def flattenDailyMetrics(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val subs = Flatten.subitems(s)
    val daily = Flatten.projects(s).as("p")
      .join(subs.as("sub"),
        col("p.project_id") === col("sub.project_id") &&
          col("p.extraction_date") === col("sub.extraction_date"), "left")
      .groupBy(col("p.extraction_date").as("extraction_date"))
      .agg(
        countDistinct(col("p.project_id")).as("total_projects"),
        count(col("sub.subitem_id")).as("total_subitems"),
        count(when(col("sub.revenue_amount") > 0, col("sub.subitem_id")))
          .as("subitems_with_revenue"),
        round(sum(col("sub.revenue_amount").cast("decimal(18,4)")), 2)
          .as("rev_dec"))
    val w = Window.orderBy(col("extraction_date")) // lint:series-grain (day-grain snapshot series)
    daily.select(col("extraction_date"), col("total_projects"),
        col("total_subitems"), col("subitems_with_revenue"),
        col("rev_dec").cast("double").as("total_revenue"),
        (col("rev_dec") - lag(col("rev_dec"), 1).over(w)).cast("double")
          .as("revenue_change"))
      .orderBy(col("extraction_date"))
  }

  private val flattenDailyMetricsOracle =
    s"""${itemsCte("projects")},
       |projects AS (SELECT ed, item.id AS project_id FROM items),
       |subs AS (
       |  SELECT ed, item.id AS project_id, unnest(item.subitems) AS sub FROM items),
       |subitems AS (
       |  SELECT ed, project_id, sub.id AS subitem_id,
       |         COALESCE(TRY_CAST(${ttNum()} AS DOUBLE), 0.0) AS revenue_amount
       |  FROM subs),
       |daily AS (
       |  SELECT p.ed AS extraction_date,
       |         COUNT(DISTINCT p.project_id) AS total_projects,
       |         COUNT(s.subitem_id) AS total_subitems,
       |         COUNT(CASE WHEN s.revenue_amount > 0 THEN s.subitem_id END) AS subitems_with_revenue,
       |         ROUND(SUM(CAST(s.revenue_amount AS DECIMAL(18,4))), 2) AS rev_dec
       |  FROM projects p LEFT JOIN subitems s
       |    ON p.project_id = s.project_id AND p.ed = s.ed
       |  GROUP BY 1)
       |SELECT extraction_date, total_projects, total_subitems, subitems_with_revenue,
       |       CAST(rev_dec AS DOUBLE) AS total_revenue,
       |       CAST(rev_dec - LAG(rev_dec) OVER (ORDER BY extraction_date) AS DOUBLE) AS revenue_change
       |FROM daily ORDER BY extraction_date""".stripMargin

  private def sorted(df: DataFrame, idCol: String): DataFrame =
    df.orderBy(col("extraction_date"), col(idCol).cast("long"))

  val queries: Map[String, Q] = Map[String, Q](
    "flatten_projects" -> ((s, _) => sorted(Flatten.projects(s), "project_id")),
    "flatten_subitems" -> ((s, _) => sorted(Flatten.subitems(s), "subitem_id")),
    "flatten_personnel" -> ((s, _) => sorted(Flatten.personnel(s), "cost_id")),
    "flatten_travel" -> ((s, _) => sorted(Flatten.travel(s), "cost_id")),
    "flatten_suppliers" -> ((s, _) => sorted(Flatten.suppliers(s), "cost_id")),
    "join_parent_child_denorm" -> (joinParentChildDenorm _),
    "flatten_daily_metrics" -> (flattenDailyMetrics _))

  val oracles: Map[String, String] = Map(
    "flatten_projects" -> flattenProjectsOracle,
    "flatten_subitems" -> flattenSubitemsOracle,
    "flatten_personnel" -> flattenPersonnelOracle,
    "flatten_travel" -> flattenTravelOracle,
    "flatten_suppliers" -> flattenSuppliersOracle,
    "join_parent_child_denorm" -> joinParentChildDenormOracle,
    "flatten_daily_metrics" -> flattenDailyMetricsOracle)
}
