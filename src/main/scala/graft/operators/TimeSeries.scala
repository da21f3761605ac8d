package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables.load

/** Time-series analytics over the `events` stream table (the reference's
  * cost/usage board — SURVEY.md §1.2, FIXTURES.md): calendar gap-filling,
  * linear interpolation, funnel analysis, and cohort retention. These are
  * the operators the reference's monitoring suite (`advanced_monitoring.py`
  * day-over-day reports) grows into once the day grain has holes and the
  * question becomes per-entity trajectories rather than global dailies.
  *
  * Portability contract (same as Dedup/PipelinePrep): money is quantized to
  * integer cents before any arithmetic, interpolation is integer division
  * (Spark `div` and DuckDB `//` both truncate toward zero — verified), so
  * the DuckDB oracle replays every value bit-for-bit.
  *
  * Scale notes (100 TB posture) are on each operator.
  */
object TimeSeries {

  type Q = (SparkSession, String) => DataFrame

  private def events(s: SparkSession, dir: String) = load(s, dir, "events")

  /** Exact integer cents: `value` ships as an exactly-2dp double, so
    * value*100 is within 1 ulp of an integer and both engines round it to
    * the same one. */
  private val cents: Column = expr("CAST(round(value * 100) AS BIGINT)")

  // ---- shared: per-user daily purchase series + its dense calendar ---------
  // obs is one hash-agg on (user_id, day); the calendar comes from each
  // user's own [min(day), max(day)] span via sequence+explode, so grid size
  // is bounded by users × span-days — never a global cross join against a
  // calendar dimension. The left join and every window below share the
  // user_id hash partitioning, so the whole family is ONE shuffle of the
  // aggregated series (not of raw events) end-to-end; at 100 TB the raw
  // scan prunes to event_type='purchase' at the parquet row-group level
  // (PushedFilters) and the per-user series that shuffles is ~span-days
  // rows per user, thousands of times smaller than the event log.
  private def dailyGrid(s: SparkSession, dir: String): DataFrame = {
    val obs = events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(cents).as("cents"))
    val grid = obs.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    grid.join(obs, Seq("user_id", "day"), "left")
  }

  private val dailyGridSql =
    """obs AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY 1)),
      |ser AS (
      |  SELECT g.user_id, g.day, o.cents
      |  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.day = g.day)""".stripMargin

  // ---- ts_fill_gaps ---------------------------------------------------------
  // Calendar densification + forward fill: every user gets one row per day
  // of their active span; days with no purchases carry the last observed
  // daily total (last-observation-carried-forward, the standard series
  // repair before any day-over-day computation). The first grid day per
  // user is observed by construction, so filled_cents is never null.
  def tsFillGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyGrid(s, dir)
      .withColumn("filled_cents", last(col("cents"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("cents").isNull)
      .orderBy(col("user_id"), col("day"))
  }

  private val tsFillGapsOracle =
    s"""WITH $dailyGridSql
       |SELECT user_id, day, cents,
       |       last_value(cents IGNORE NULLS) OVER (
       |         PARTITION BY user_id ORDER BY day
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
       |       cents IS NULL AS is_gap
       |FROM ser ORDER BY user_id, day""".stripMargin

  // ---- ts_interpolate -------------------------------------------------------
  // Linear interpolation across interior gaps: a missing day takes
  // prev + (next - prev) * (day - prev_day) / (next_day - prev_day), all in
  // integer cents with truncating division, so both engines compute the
  // identical bigint. Neighbor lookup is two windows over the same user_id
  // partitioning the grid join already established (no extra exchange —
  // forward pass carries the last observed (day, cents), backward pass the
  // first upcoming one). Grid spans are per-user min..max, so every gap row
  // has both neighbors by construction.
  def tsInterpolate(s: SparkSession, dir: String): DataFrame = {
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("cents").isNotNull, col("day"))
    dailyGrid(s, dir)
      .withColumn("prev_day", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("prev_cents", last(col("cents"), ignoreNulls = true).over(wPrev))
      .withColumn("next_day", first(obsDay, ignoreNulls = true).over(wNext))
      .withColumn("next_cents", first(col("cents"), ignoreNulls = true).over(wNext))
      .withColumn("interp_cents",
        when(col("cents").isNotNull, col("cents")).otherwise(
          expr("""prev_cents + ((next_cents - prev_cents) *
                 |CAST(datediff(day, prev_day) AS BIGINT)) div
                 |CAST(datediff(next_day, prev_day) AS BIGINT)""".stripMargin)))
      .select(col("user_id"), col("day"), col("cents"), col("interp_cents"))
      .orderBy(col("user_id"), col("day"))
  }

  private val tsInterpolateOracle =
    s"""WITH $dailyGridSql,
       |nb AS (
       |  SELECT user_id, day, cents,
       |    last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER (
       |      PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
       |    last_value(cents IGNORE NULLS) OVER (
       |      PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_cents,
       |    first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER (
       |      PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day,
       |    first_value(cents IGNORE NULLS) OVER (
       |      PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_cents
       |  FROM ser)
       |SELECT user_id, day, cents,
       |       CASE WHEN cents IS NOT NULL THEN cents
       |            ELSE prev_cents + ((next_cents - prev_cents) *
       |                 date_diff('day', prev_day, day)) //
       |                 date_diff('day', prev_day, next_day)
       |       END AS interp_cents
       |FROM nb ORDER BY user_id, day""".stripMargin

  // ---- window_funnel --------------------------------------------------------
  // Conversion funnel view → click → purchase within a 1-hour window of the
  // opening view (the windowFunnel analysis ClickHouse popularized): a user
  // reaches level 2 if some click follows some view within the hour, level
  // 3 if a purchase then follows that click still inside the same hour.
  // Relational form: two equi-joins on user_id with time-band predicates —
  // candidate pairs are bounded by per-user event rate × window length
  // (~0.1 events/hour here), never a per-user cross product of full
  // histories. At 100 TB the event log is bucketed by user_id so both
  // joins are shuffle-free zipper joins; the distinct-user counts are
  // map-side-combining hash aggs on a bigint key.
  def windowFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    def step(t: String, asCol: String) =
      ev.filter(col("event_type") === t)
        .select(col("user_id"), col("ts").as(asCol))
    val v = step("view", "tv")
    val c = step("click", "tc")
    val p = step("purchase", "tp")
    val vc = v.join(c, Seq("user_id"))
      .filter(col("tc") > col("tv") &&
        col("tc") <= col("tv") + expr("INTERVAL 1 HOUR"))
    val vcp = vc.join(p, Seq("user_id"))
      .filter(col("tp") > col("tc") &&
        col("tp") <= col("tv") + expr("INTERVAL 1 HOUR"))
    def lvl(df: DataFrame, n: Int, name: String) =
      df.agg(countDistinct(col("user_id")).as("n_users"))
        .select(lit(n).as("step"), lit(name).as("step_name"), col("n_users"))
    lvl(v, 1, "view").unionAll(lvl(vc, 2, "click")).unionAll(lvl(vcp, 3, "purchase"))
      .orderBy(col("step"))
  }

  private val windowFunnelOracle =
    """WITH v AS (SELECT user_id, ts AS tv FROM events WHERE event_type = 'view'),
      |c AS (SELECT user_id, ts AS tc FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts AS tp FROM events WHERE event_type = 'purchase'),
      |vc AS (
      |  SELECT v.user_id, tv, tc FROM v JOIN c ON v.user_id = c.user_id
      |  WHERE tc > tv AND tc <= tv + INTERVAL 1 HOUR),
      |vcp AS (
      |  SELECT vc.user_id FROM vc JOIN p ON vc.user_id = p.user_id
      |  WHERE tp > tc AND tp <= tv + INTERVAL 1 HOUR)
      |SELECT 1 AS step, 'view' AS step_name, COUNT(DISTINCT user_id) AS n_users FROM v
      |UNION ALL
      |SELECT 2, 'click', COUNT(DISTINCT user_id) FROM vc
      |UNION ALL
      |SELECT 3, 'purchase', COUNT(DISTINCT user_id) FROM vcp
      |ORDER BY step""".stripMargin

  // ---- cohort_retention -----------------------------------------------------
  // Day-grain cohort retention over purchases: a user's cohort is their
  // first purchase day; each later active day contributes to that cohort's
  // (cohort_day, day_offset) cell. The output is the classic retention
  // triangle (n_users per cohort per offset). Two hash aggs on user_id +
  // one broadcast-sized join back (first-day table is one row per user —
  // at 100 TB it still shuffles on user_id rather than broadcasting, but
  // the join input is the DISTINCT (user, day) activity set, not raw
  // events, so the heavy log is touched exactly once).
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val act = events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val firsts = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    act.join(firsts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  private val cohortRetentionOracle =
    """WITH act AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |  FROM events WHERE event_type = 'purchase'),
      |firsts AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1)
      |SELECT f.cohort_day,
      |       date_diff('day', f.cohort_day, a.day) AS day_offset,
      |       COUNT(DISTINCT a.user_id) AS n_users
      |FROM act a JOIN firsts f ON a.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- window_rolling_distinct ----------------------------------------------
  // Rolling 7-day distinct active users per day (the WAU curve): COUNT
  // DISTINCT over a sliding window cannot ride a running aggregate
  // (distinct doesn't decompose), so each (user, day) activity fact is
  // EXPLODED into the ≤7 report days it contributes to and the count
  // becomes a plain per-day hash-agg — contribution-list expansion, the
  // standard exact formulation. Cost: activity×7 rows through one
  // map-side-combining distinct + one agg; the raw event log is touched
  // once (the DISTINCT (user, day) projection). At 100 TB the exact
  // distinct swaps for an HLL sketch union over the same exploded frame
  // (mergeable, same plan shape) — noted, exact kept for the oracle.
  // Report days are clipped to the observed activity grid so the curve
  // never extends past the data.
  def windowRollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val act = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val grid = act.select(col("day")).distinct()
    act.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
      .distinct()
      .join(grid, Seq("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n_active_7d"))
      .orderBy(col("day"))
  }

  private val windowRollingDistinctOracle =
    """WITH act AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |grid AS (SELECT DISTINCT day FROM act)
      |SELECT g.day, COUNT(DISTINCT a.user_id) AS n_active_7d
      |FROM grid g JOIN act a
      |  ON a.day BETWEEN g.day - 6 AND g.day
      |GROUP BY g.day ORDER BY g.day""".stripMargin

  // ---- window_ewma ----------------------------------------------------------
  // Exponentially weighted moving average over the global daily revenue
  // series — the smoothing every monitoring dashboard reaches for once a
  // plain moving average lags too far behind level shifts (the flagship
  // LAG report's day-over-day delta is its roughest cousin; anomaly_daily_
  // mad is its robust sibling). α = 1/2 over a trailing 8-day window, so
  // the weights are EXACT powers of two: a day at distance δ contributes
  // cents·2^(7−δ), and the EWMA is one integer-ratio num/den with a single
  // double division at the end — both engines compute the identical
  // bigints and the identical correctly-rounded quotient, no fp
  // accumulation anywhere. Missing days simply contribute nothing (their
  // weight mass drops out of the denominator — the standard irregular-
  // series EWMA). Topology: everything happens on the DAY-GRAIN aggregate
  // (tens of rows per month at any corpus size — same posture as
  // anomaly_daily_mad); the distance self-join is series×8 rows.
  def windowEwma(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    daily.as("a").join(daily.as("b"),
        datediff(col("a.day"), col("b.day")).between(0, 7))
      .groupBy(col("a.day").as("day"))
      .agg(max(when(col("a.day") === col("b.day"), col("b.cents"))).as("cents"),
        sum(expr("b.cents * shiftleft(1L, 7 - datediff(a.day, b.day))"))
          .as("ewma_num"),
        sum(expr("shiftleft(1L, 7 - datediff(a.day, b.day))")).as("ewma_den"))
      .withColumn("ewma_cents", expr(
        """cast(round(cast(cast(ewma_num as double) / cast(ewma_den as double)
          |  as decimal(28,6)), 2) as double)""".stripMargin))
      .orderBy(col("day"))
  }

  private val windowEwmaOracle =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1)
      |SELECT a.day,
      |       CAST(MAX(CASE WHEN a.day = b.day THEN b.cents END) AS BIGINT) AS cents,
      |       CAST(SUM(b.cents * (CAST(1 AS BIGINT) << (7 - (a.day - b.day)))) AS BIGINT) AS ewma_num,
      |       CAST(SUM(CAST(1 AS BIGINT) << (7 - (a.day - b.day))) AS BIGINT) AS ewma_den,
      |       CAST(ROUND(CAST(CAST(SUM(b.cents * (CAST(1 AS BIGINT) << (7 - (a.day - b.day)))) AS DOUBLE)
      |         / CAST(SUM(CAST(1 AS BIGINT) << (7 - (a.day - b.day))) AS DOUBLE)
      |         AS DECIMAL(28,6)), 2) AS DOUBLE) AS ewma_cents
      |FROM daily a JOIN daily b ON a.day - b.day BETWEEN 0 AND 7
      |GROUP BY a.day ORDER BY a.day""".stripMargin

  // ---- ts_resample_ohlc -----------------------------------------------------
  // Downsample the raw event stream to HOURLY bars per event type with
  // open/high/low/close semantics — the resample-with-first/last-semantics
  // every telemetry/market pipeline runs (plain groupBy gives high/low for
  // free; OPEN and CLOSE need a deterministic within-bucket ORDER, which
  // is the actual operator here). The order is (ts, event_id) — event_id
  // is unique, so ties at the same microsecond resolve identically in
  // both engines and the bar is a pure function of the data. One window
  // pass (row_number asc + partition count) and one hash-agg, both
  // sharing the (type, hour) partitioning — a single shuffle of the
  // event slice at any scale; money in exact cents.
  def tsResampleOhlc(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
        col("ts"), col("event_id"), cents.as("c"))
    val w = Window.partitionBy(col("event_type"), col("hour"))
      .orderBy(col("ts"), col("event_id"))
    e.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy(col("event_type"), col("hour"))))
      .groupBy(col("event_type"), col("hour"))
      .agg(max(when(col("rn") === 1, col("c"))).as("open_c"),
        max(col("c")).as("high_c"),
        min(col("c")).as("low_c"),
        max(when(col("rn") === col("cnt"), col("c"))).as("close_c"),
        count(lit(1)).as("n_events"),
        sum(col("c")).as("vol_c"))
      .orderBy(col("event_type"), col("hour"))
  }

  private val tsResampleOhlcOracle =
    """WITH e AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id,
      |         CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events WHERE event_type = 'purchase'),
      |r AS (
      |  SELECT *,
      |         ROW_NUMBER() OVER (PARTITION BY event_type, hour
      |           ORDER BY ts, event_id) AS rn,
      |         COUNT(*) OVER (PARTITION BY event_type, hour) AS cnt
      |  FROM e)
      |SELECT event_type, hour,
      |       CAST(MAX(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS open_c,
      |       CAST(MAX(c) AS BIGINT) AS high_c,
      |       CAST(MIN(c) AS BIGINT) AS low_c,
      |       CAST(MAX(CASE WHEN rn = cnt THEN c END) AS BIGINT) AS close_c,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(c) AS BIGINT) AS vol_c
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- window_streaks -------------------------------------------------------
  // Event-pattern detection relationally (the MATCH_RECOGNIZE / CEP-lite
  // class): per user, maximal runs of STRICTLY increasing purchase
  // amounts in event order — "escalating spend" streaks, the classic
  // gaps-and-islands formulation: up = 1 when this purchase exceeds the
  // previous (first row: 0), streak id = running count of non-ups, then
  // one hash-agg per (user, streak). Order is (ts, event_id) — unique, so
  // both engines segment identically; strictness (>) makes ties break
  // streaks deterministically. Output per user: longest run + number of
  // runs ≥ 3. Two window passes + two aggs, ALL sharing the user_id hash
  // partitioning — one shuffle of the purchase slice at any scale (the
  // same posture as window_islands, which segments by time gap where this
  // segments by VALUE direction).
  def windowStreaks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val p = events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), cents.as("c"))
      .withColumn("up", when(col("c") > lag(col("c"), 1).over(w), 1).otherwise(0))
      .withColumn("grp", sum(lit(1) - col("up")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    p.groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("user_id"))
      .agg(max(col("run_len")).as("longest_run"),
        sum(when(col("run_len") >= 3, 1L).otherwise(0L)).as("n_runs3"),
        count(lit(1)).as("n_runs"))
      .orderBy(col("user_id"))
  }

  private val windowStreaksOracle =
    """WITH p AS (
      |  SELECT user_id, ts, event_id,
      |         CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events WHERE event_type = 'purchase'),
      |u AS (
      |  SELECT user_id, ts, event_id, c,
      |         CASE WHEN c > lag(c) OVER (PARTITION BY user_id
      |                ORDER BY ts, event_id) THEN 1 ELSE 0 END AS up
      |  FROM p),
      |g AS (
      |  SELECT user_id,
      |         SUM(1 - up) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM u),
      |runs AS (
      |  SELECT user_id, grp, COUNT(*) AS run_len FROM g GROUP BY 1, 2)
      |SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS longest_run,
      |       CAST(SUM(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_runs3,
      |       COUNT(*) AS n_runs
      |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin

  // ---- window_zscore_rolling ------------------------------------------------
  // Rolling z-score of daily revenue against its trailing 30 observations
  // — the PARAMETRIC anomaly detector beside anomaly_daily_mad's robust
  // median/MAD (a monitoring stack runs both: z-score reacts faster, MAD
  // survives broken days): mean and population variance come from exact
  // window sums (Σc as BIGINT, Σc² as scale-0 DECIMAL — cents² would
  // overflow a bigint window sum), each cast to double once, z computed
  // stepwise with the identical IEEE shape both sides; emitted only when
  // the window holds ≥ 10 observations with positive variance (early and
  // degenerate days stay NULL rather than fabricating a score). Runs
  // entirely on the day-grain series — same posture as anomaly_daily_mad.
  def windowZscoreRolling(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val w = Window.orderBy(col("day")).rowsBetween(-29, 0) // lint:series-grain (day-grain)
    daily
      .withColumn("n_w", count(lit(1)).over(w))
      .withColumn("s1", sum(col("cents")).over(w))
      .withColumn("s2", sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).over(w))
      .withColumn("mean", expr("cast(s1 as double) / cast(n_w as double)"))
      .withColumn("variance", expr(
        "cast(s2 as double) / cast(n_w as double) - mean * mean"))
      .withColumn("z", expr(
        """case when n_w >= 10 and variance > 0.0
          |then cast(round(cast(
          |  (cast(cents as double) - mean) / sqrt(variance)
          |as decimal(28,8)), 4) as double) end""".stripMargin))
      .select(col("day"), col("cents"), col("n_w"), col("z"))
      .orderBy(col("day"))
  }

  private val windowZscoreRollingOracle =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |win AS (
      |  SELECT day, cents,
      |         COUNT(*) OVER w AS n_w,
      |         CAST(SUM(cents) OVER w AS BIGINT) AS s1,
      |         SUM(CAST(cents AS HUGEINT) * cents) OVER w AS s2
      |  FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)),
      |m AS (
      |  SELECT day, cents, n_w,
      |         CAST(s1 AS DOUBLE) / CAST(n_w AS DOUBLE) AS mean,
      |         CAST(s2 AS DOUBLE) / CAST(n_w AS DOUBLE) AS r2
      |  FROM win),
      |v AS (SELECT day, cents, n_w, mean, r2 - mean * mean AS variance FROM m)
      |SELECT day, cents, n_w,
      |       CASE WHEN n_w >= 10 AND variance > 0.0
      |            THEN CAST(ROUND(CAST(
      |              (CAST(cents AS DOUBLE) - mean) / sqrt(variance)
      |            AS DECIMAL(28,8)), 4) AS DOUBLE) END AS z
      |FROM v ORDER BY day""".stripMargin

  // ---- window_drawdown ------------------------------------------------------
  // Maximum drawdown of the cumulative daily revenue curve — running
  // cumulative sum, its running peak, and the per-day gap (how far below
  // the best-ever cumulative the series sits): the classic
  // peak-to-trough measure, here over exact integer cents so every value
  // is a bigint and no fp enters at all. Two stacked windows over the
  // same day ordering; day-grain series, metadata-sized at any corpus.
  def windowDrawdown(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val run = Window.orderBy(col("day")) // lint:series-grain (day-grain)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_cents", sum(col("cents")).over(run))
      .withColumn("peak_cents", max(col("cum_cents")).over(run))
      .withColumn("drawdown_cents", col("peak_cents") - col("cum_cents"))
      .orderBy(col("day"))
  }

  private val windowDrawdownOracle =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |c AS (
      |  SELECT day, cents,
      |         CAST(SUM(cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
      |           AND CURRENT ROW) AS BIGINT) AS cum_cents
      |  FROM daily)
      |SELECT day, cents, cum_cents,
      |       CAST(MAX(cum_cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
      |         AND CURRENT ROW) AS BIGINT) AS peak_cents,
      |       CAST(MAX(cum_cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
      |         AND CURRENT ROW) - cum_cents AS BIGINT) AS drawdown_cents
      |FROM c ORDER BY day""".stripMargin

  // ---- ts_changepoint_cusum -------------------------------------------------
  // CUSUM changepoint detection on the daily revenue series (Page 1954)
  // — the "did the level shift, and WHEN" monitor behind regression
  // alerts: the cumulative sum of deviations from the series mean peaks
  // exactly where the level changes. Exactness device: the mean is the
  // rational S/N, so the day-d statistic is kept SCALED BY N —
  // C_d·N = N·Σ_{i≤d} cents_i − d·S, pure BIGINT (DECIMAL at petabyte
  // cents) — and both engines compare identical integers; the flagged
  // changepoint is argmax |C_d·N| with the earlier day on ties. Scale:
  // one fact-grain agg to day grain, then day-grain windows
  // (lint:series-grain — bounded by the calendar, not the corpus).
  def tsChangepointCusum(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val run = Window.orderBy(col("day")) // lint:series-grain (day-grain)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seq = Window.orderBy(col("day")) // lint:series-grain (day-grain)
    val withC = daily
      .withColumn("cum_cents", sum(col("cents")).over(run))
      .withColumn("d", row_number().over(seq).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("cusum_n", col("cum_cents") * col("n") - col("d") * col("s"))
    val peak = withC.agg(max(abs(col("cusum_n"))).as("peak"))
    val flagged = withC.crossJoin(broadcast(peak))
    val cp = flagged.filter(abs(col("cusum_n")) === col("peak"))
      .agg(min(col("day")).as("cp_day"))
    flagged.crossJoin(broadcast(cp))
      .withColumn("is_changepoint", col("day") === col("cp_day"))
      .select(col("day"), col("cents"), col("cusum_n"), col("is_changepoint"))
      .orderBy(col("day"))
  }

  private val tsChangepointCusumOracle =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s FROM daily),
      |c AS (
      |  SELECT day, cents,
      |         CAST(SUM(cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
      |           AND CURRENT ROW) AS BIGINT) AS cum_cents,
      |         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS d
      |  FROM daily),
      |k AS (
      |  SELECT day, cents, cum_cents * n - d * s AS cusum_n FROM c, tot),
      |p AS (SELECT MAX(ABS(cusum_n)) AS peak FROM k),
      |cp AS (SELECT MIN(day) AS cp_day FROM k, p WHERE ABS(cusum_n) = peak)
      |SELECT day, cents, CAST(cusum_n AS BIGINT) AS cusum_n,
      |       day = (SELECT cp_day FROM cp) AS is_changepoint
      |FROM k ORDER BY day""".stripMargin

  // ---- ts_autocorr ----------------------------------------------------------
  // Lag-1..7 autocorrelation of the daily revenue series — the
  // seasonality probe run before any forecasting/anomaly model is
  // trusted (a weekly cycle shows as a lag-7 peak; a near-zero ACF says
  // the daily series is noise and a day-grain model is pointless).
  // Exactness: with n days, total S and x_t integer cents, the n²-scaled
  // deviation is dev_t = n·x_t − S (exact BIGINT), and the lag-k
  // numerator Σ dev_t·dev_{t+k} is exact in DECIMAL(38,0) (Spark) /
  // HUGEINT (DuckDB) — the n² factor cancels in the ratio, which is
  // frozen as sign·(|num_k|·10⁶ div num_0) so both engines report the
  // identical integer PPM (truncating division on nonnegative operands —
  // the floor-vs-trunc divergence on negatives never arises). Topology:
  // one fact→day hash agg (map-side combine), then everything runs at
  // day grain: the t-index window is series-grain, the lag join is a
  // 7-way self-equi-join of the tiny day relation, and num_0 broadcasts
  // as a 1-row aggregate. 100 TB adds fact rows, not days.
  def tsAutocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val seq = Window.orderBy(col("day")) // lint:series-grain (day-grain)
    val dev = daily
      .withColumn("t", row_number().over(seq).cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("t"), (col("n") * col("cents") - col("s")).as("dev"))
    val num0 = dev
      .agg(sum(expr("CAST(dev AS DECIMAL(38,0)) * dev")).as("n0"))
    val shifted = dev
      .select(explode(expr("sequence(1, 7)")).as("lag_k"),
        col("t"), col("dev").as("dev_a"))
      .select(col("lag_k"), (col("t") + col("lag_k")).as("t"), col("dev_a"))
    shifted.join(dev, Seq("t"))
      .groupBy(col("lag_k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("CAST(dev_a AS DECIMAL(38,0)) * dev")).as("nk"))
      .crossJoin(broadcast(num0))
      .select(col("lag_k").cast("int").as("lag_k"), col("n_pairs"),
        (when(col("nk") < 0, -1L).otherwise(1L) *
          expr("(abs(nk) * 1000000) div n0")).as("acf_ppm"))
      .orderBy(col("lag_k"))
  }

  private val tsAutocorrOracle =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |               CAST(SUM(cents) AS BIGINT) AS s FROM daily),
      |b AS (SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, cents FROM daily),
      |d AS (SELECT t, CAST(n AS HUGEINT) * cents - s AS dev FROM b, tot),
      |n0 AS (SELECT SUM(dev * dev) AS n0 FROM d),
      |p AS (
      |  SELECT k.lag_k, a.dev AS dev_a, c.dev AS dev_b
      |  FROM (SELECT unnest(generate_series(1, 7)) AS lag_k) k
      |  JOIN d a ON true
      |  JOIN d c ON c.t = a.t + k.lag_k),
      |num AS (
      |  SELECT lag_k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |         SUM(dev_a * dev_b) AS nk
      |  FROM p GROUP BY 1)
      |SELECT CAST(lag_k AS INT) AS lag_k, n_pairs,
      |       CAST(CASE WHEN nk < 0 THEN -1 ELSE 1 END
      |            * ((abs(nk) * 1000000) // n0) AS BIGINT) AS acf_ppm
      |FROM num, n0 ORDER BY lag_k""".stripMargin

  // ---- ts_cross_corr --------------------------------------------------------
  // Lagged CROSS-correlation between two daily series — purchase revenue
  // vs view volume, both off the events stream — at lags −5..+5: the lead/lag probe behind
  // "does activity lead revenue by k days?" monitoring questions (the CCF
  // of classical time-series practice, Box & Jenkins). Exactness follows
  // ts_autocorr: with n common days, deviations dev_t = n·x_t − S are
  // exact BIGINTs and every lag-k numerator Σ devA_t·devB_{t+k} is exact
  // DECIMAL(38,0)/HUGEINT. Normalization needs √(Σda²·Σdb²), whose square
  // overflows any fixed decimal — so each norm takes the sample_temperature
  // isqrt device instead (floor(sqrt(double)) with the exact ±1 integer
  // correction, valid while isqrt ≤ ~1e15 — far past the fixture's day
  // grain) and the statistic freezes as sign·(|num_k|·10⁶ div ra div rb):
  // identical truncating arithmetic in both engines, within integer
  // truncation of Pearson. Topology: two fact→day hash aggs, then
  // everything is day-grain: the t-index window is series-grain, the lag
  // join is an 11-way self-equi-join of the tiny common-day relation, and
  // norms broadcast as a 1-row aggregate. 100 TB adds fact rows, not days.
  def tsCrossCorr(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val a = ev.filter(col("event_type") === "purchase")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(cents).as("a"))
    val b = ev.filter(col("event_type") === "view")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("b"))
    val both = a.join(b, Seq("day"))
    val tot = both.agg(count(lit(1)).as("n"),
      sum(col("a")).as("sa"), sum(col("b")).as("sb"))
    val seq0 = Window.orderBy(col("day")) // lint:series-grain (day-grain)
    val dev = both
      .withColumn("t", row_number().over(seq0).cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("t"), (col("n") * col("a") - col("sa")).as("da"),
        (col("n") * col("b") - col("sb")).as("db"))
    val isqrtCase = (r0: String, v: String) =>
      s"""CASE WHEN ($r0 + 1) * ($r0 + 1) <= $v THEN $r0 + 1
         |     WHEN $r0 * $r0 > $v THEN $r0 - 1 ELSE $r0 END""".stripMargin
    val norms = dev.agg(
        sum(expr("CAST(da AS DECIMAL(38,0)) * da")).as("n0a"),
        sum(expr("CAST(db AS DECIMAL(38,0)) * db")).as("n0b"))
      .withColumn("ra0",
        floor(sqrt(col("n0a").cast("double"))).cast("decimal(38,0)"))
      .withColumn("rb0",
        floor(sqrt(col("n0b").cast("double"))).cast("decimal(38,0)"))
      .select(expr(isqrtCase("ra0", "n0a")).as("ra"),
        expr(isqrtCase("rb0", "n0b")).as("rb"))
    val shifted = dev
      .select(explode(expr("sequence(-5, 5)")).as("lag_k"),
        col("t"), col("da"))
      .select(col("lag_k"), (col("t") + col("lag_k")).as("t"), col("da"))
    shifted.join(dev.select(col("t"), col("db")), Seq("t"))
      .groupBy(col("lag_k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("CAST(da AS DECIMAL(38,0)) * db")).as("nk"))
      .crossJoin(broadcast(norms))
      .select(col("lag_k").cast("int").as("lag_k"), col("n_pairs"),
        (when(col("nk") < 0, -1L).otherwise(1L) *
          expr("((abs(nk) * 1000000) div ra) div rb").cast("long"))
          .as("ccf_ppm"))
      .orderBy(col("lag_k"))
  }

  private val tsCrossCorrOracle =
    """WITH da_ AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS a
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |db_ AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS b
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |cmn AS (SELECT da_.day, a, b FROM da_ JOIN db_ USING (day)),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |               CAST(SUM(a) AS BIGINT) AS sa,
      |               CAST(SUM(b) AS BIGINT) AS sb FROM cmn),
      |idx AS (SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, a, b FROM cmn),
      |d AS (SELECT t, CAST(n AS HUGEINT) * a - sa AS da,
      |             CAST(n AS HUGEINT) * b - sb AS db FROM idx, tot),
      |n0 AS (SELECT SUM(da * da) AS n0a, SUM(db * db) AS n0b FROM d),
      |r0 AS (SELECT n0a, n0b,
      |              CAST(FLOOR(SQRT(CAST(n0a AS DOUBLE))) AS HUGEINT) AS ra0,
      |              CAST(FLOOR(SQRT(CAST(n0b AS DOUBLE))) AS HUGEINT) AS rb0
      |       FROM n0),
      |norms AS (
      |  SELECT CASE WHEN (ra0 + 1) * (ra0 + 1) <= n0a THEN ra0 + 1
      |              WHEN ra0 * ra0 > n0a THEN ra0 - 1 ELSE ra0 END AS ra,
      |         CASE WHEN (rb0 + 1) * (rb0 + 1) <= n0b THEN rb0 + 1
      |              WHEN rb0 * rb0 > n0b THEN rb0 - 1 ELSE rb0 END AS rb
      |  FROM r0),
      |p AS (
      |  SELECT k.lag_k, a2.da, c.db
      |  FROM (SELECT unnest(generate_series(-5, 5)) AS lag_k) k
      |  JOIN d a2 ON true
      |  JOIN d c ON c.t = a2.t + k.lag_k),
      |num AS (
      |  SELECT lag_k, CAST(COUNT(*) AS BIGINT) AS n_pairs, SUM(da * db) AS nk
      |  FROM p GROUP BY 1)
      |SELECT CAST(lag_k AS INT) AS lag_k, n_pairs,
      |       CAST(CASE WHEN nk < 0 THEN -1 ELSE 1 END
      |            * (((abs(nk) * 1000000) // ra) // rb) AS BIGINT) AS ccf_ppm
      |FROM num, norms ORDER BY lag_k""".stripMargin

  // ---- ts_seasonal_decompose ---------------------------------------------
  // Classical additive decomposition of the daily revenue series:
  // trend = centered 7-day moving average (defined only where the full
  // window exists — edges stay null rather than fabricating a shorter
  // average), seasonal = per-ISO-weekday mean of the detrended values,
  // residual = observed − trend − seasonal. The trend/seasonal split is
  // what turns "revenue moved" into "revenue moved beyond its weekly
  // rhythm" — the input anomaly models and capacity forecasts actually
  // want. Exact integers throughout: cents, truncating div for both
  // means (Spark `div` and DuckDB `//` both truncate toward zero, so
  // NEGATIVE detrended values agree too — pinned in the spec), and ISO
  // weekday (1=Mon..7) on both engines so the join key can't be off by
  // the Sunday-origin disagreement of the default dow functions.
  // Topology: one fact→day agg, a series-grain centered window, a 7-row
  // weekday agg broadcast back. 100 TB adds fact rows, not days.
  /** The decomposition frame (day, cents, trend, dow, seasonal, resid),
    * unordered — shared by the per-day key and the strength monitor. */
  private def seasonalDecomposed(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3) // lint:series-grain (day-grain)
    val detr = daily
      .withColumn("w_sum", sum(col("cents")).over(w7))
      .withColumn("w_n", count(lit(1)).over(w7))
      .withColumn("trend",
        when(col("w_n") === 7, expr("w_sum div 7")))
      .withColumn("dow", expr("extract(dayofweek_iso FROM day)").cast("int"))
      .withColumn("detrended", col("cents") - col("trend"))
    val seasonal = detr
      .groupBy(col("dow"))
      .agg(expr("sum(detrended) div count(detrended)").as("seasonal"))
    detr.join(broadcast(seasonal), Seq("dow"))
      .select(col("day"), col("cents"), col("trend"), col("dow"),
        col("seasonal"),
        (col("cents") - col("trend") - col("seasonal")).as("resid"))
  }

  def tsSeasonalDecompose(s: SparkSession, dir: String): DataFrame =
    seasonalDecomposed(s, dir).orderBy(col("day"))

  // ---- ts_seasonal_strength -------------------------------------------------
  // Hyndman's STRENGTH OF SEASONALITY off the decomposition: F_s =
  // max(0, 1 − Var(resid)/Var(seasonal+resid)) — the one scalar that says
  // whether the weekly rhythm is real enough to model (F_s near 0: the
  // "seasonal" component is noise; near 1: the series is dominated by its
  // weekly cycle). Exactness: on interior days both resid and detrended
  // (= seasonal+resid) are exact BIGINTs, so both variances ride the
  // n²-scaled-deviation device (dev = n·x − S, sums in DECIMAL(38,0) /
  // HUGEINT — the n² factors cancel in the ratio) and the strength is
  // frozen as 10⁶ − (num_resid·10⁶ div num_detr), clamped at 0 — exact
  // truncating division of nonnegative integers in both engines. One
  // extra |interior-days|-grain aggregate over the decomposition frame.
  def tsSeasonalStrength(s: SparkSession, dir: String): DataFrame = {
    val interior = seasonalDecomposed(s, dir)
      .filter(col("trend").isNotNull)
      .select(col("resid"), (col("seasonal") + col("resid")).as("detr"))
    val tot = interior.agg(count(lit(1)).as("n"),
      sum(col("resid")).as("sr"), sum(col("detr")).as("sd"))
    interior.crossJoin(broadcast(tot))
      .select(
        (col("n") * col("resid") - col("sr")).as("dev_r"),
        (col("n") * col("detr") - col("sd")).as("dev_d"), col("n"))
      .agg(max(col("n")).as("n_days"),
        sum(expr("CAST(dev_r AS DECIMAL(38,0)) * dev_r")).as("num_r"),
        sum(expr("CAST(dev_d AS DECIMAL(38,0)) * dev_d")).as("num_d"))
      .select(col("n_days"),
        expr("greatest(0L, 1000000L - (num_r * 1000000) div num_d)")
          .as("strength_ppm"))
  }

  private val tsSeasonalStrengthOracle =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |tr AS (
      |  SELECT day, cents,
      |         CASE WHEN COUNT(*) OVER w = 7
      |              THEN CAST(SUM(cents) OVER w AS BIGINT) // 7 END AS trend,
      |         CAST(date_part('isodow', day) AS INT) AS dow
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |se AS (
      |  SELECT dow,
      |         CAST(SUM(cents - trend) AS BIGINT)
      |           // COUNT(CASE WHEN trend IS NOT NULL THEN 1 END) AS seasonal
      |  FROM tr WHERE trend IS NOT NULL GROUP BY dow),
      |f AS (
      |  SELECT t.cents - t.trend - s.seasonal AS resid,
      |         t.cents - t.trend AS detr
      |  FROM tr t JOIN se s ON s.dow = t.dow WHERE t.trend IS NOT NULL),
      |tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
      |               CAST(SUM(resid) AS HUGEINT) AS sr,
      |               CAST(SUM(detr) AS HUGEINT) AS sd FROM f),
      |num AS (
      |  SELECT MAX(n) AS n_days,
      |         SUM((n * resid - sr) * (n * resid - sr)) AS num_r,
      |         SUM((n * detr - sd) * (n * detr - sd)) AS num_d
      |  FROM f, tot)
      |SELECT CAST(n_days AS BIGINT) AS n_days,
      |       CAST(GREATEST(0, 1000000 - (num_r * 1000000) // num_d) AS BIGINT)
      |         AS strength_ppm
      |FROM num""".stripMargin

  private val tsSeasonalDecomposeOracle =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |tr AS (
      |  SELECT day, cents,
      |         CASE WHEN COUNT(*) OVER w = 7
      |              THEN CAST(SUM(cents) OVER w AS BIGINT) // 7 END AS trend,
      |         CAST(date_part('isodow', day) AS INT) AS dow
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |se AS (
      |  SELECT dow,
      |         CAST(SUM(cents - trend) AS BIGINT)
      |           // COUNT(CASE WHEN trend IS NOT NULL THEN 1 END) AS seasonal
      |  FROM tr WHERE trend IS NOT NULL GROUP BY dow)
      |SELECT t.day, t.cents, t.trend, t.dow, s.seasonal,
      |       t.cents - t.trend - s.seasonal AS resid
      |FROM tr t JOIN se s ON s.dow = t.dow
      |ORDER BY t.day""".stripMargin

  // ---- ts_twa ----------------------------------------------------------------
  // TIME-WEIGHTED average per user series — the irregular-sampling
  // aggregate (TimescaleDB's time_weight / kdb's wavg-over-time): a plain
  // AVG over-weights bursts of closely spaced events; the honest mean of a
  // step signal is the LOCF integral Σ value·Δt over the observed span.
  // Everything stays exact: values in cents, gaps in integer micros
  // (unix_micros/epoch_us — the window_session convention), the integral
  // as a DECIMAL(38,0) sum (cents·micros ~1e15/pair; a year-long 100 TB
  // series overflows BIGINT's 9.2e18), and the ratio frozen by the exact
  // floor ((num·1e6 − mod) / den) in the decimal domain — the PCA-overflow
  // lesson: only the final quotient lands in a LONG. num is provably
  // non-negative (values are positive cents), so truncation and floor
  // agree and Spark's %-floor matches DuckDB's // exactly. Users with
  // one event have no observed span and are excluded (den = 0).
  // Plan: ONE shuffle on user_id shared by the lead() window and the
  // final user-grain agg — the sessionization topology.
  def tsTwa(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = load(s, dir, "events").select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    e.withColumn("nus", lead(col("us"), 1).over(w))
      .filter(col("nus").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        sum((col("nus") - col("us")).cast("decimal(38,0)") *
          col("cents").cast("decimal(38,0)")).as("num"),
        sum(col("nus") - col("us")).as("den"),
        count(lit(1)).as("n_gaps"))
      .select(col("user_id"), col("n_gaps"), col("den").as("span_us"),
        expr("""CAST((num * 1000000 - (num * 1000000) % CAST(den AS DECIMAL(38,0)))
               |     / CAST(den AS DECIMAL(38,0)) AS BIGINT)""".stripMargin)
          .as("twa_micents"))
      .orderBy(col("user_id"))
  }

  private val tsTwaOracle =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |g AS (
      |  SELECT user_id, cents, us,
      |         LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nus
      |  FROM e)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |       CAST(SUM(nus - us) AS BIGINT) AS span_us,
      |       CAST(SUM(CAST(nus - us AS HUGEINT) * cents) * 1000000
      |            // CAST(SUM(nus - us) AS HUGEINT) AS BIGINT) AS twa_micents
      |FROM g WHERE nus IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- ts_holt_linear ---------------------------------------------------------
  // Holt's linear-trend double exponential smoothing over the global daily
  // revenue series, plus the 7-day-ahead forecast l + 7·b — the FIRST
  // forecasting operator in the suite (everything before this describes
  // the past; window_ewma is the level-only special case that cannot see
  // a trend). State recursion with α = β = 1/4:
  //     l_t = (x_t + 3·(l_{t−1} + b_{t−1})) div 4
  //     b_t = (l_t − l_{t−1} + 3·b_{t−1}) div 4,   l_1 = x_1, b_1 = 0
  // kept ENTIRELY in integer cents: powers-of-two smoothing weights mean
  // the only non-ring operation is `div` (truncation toward zero — the
  // module's verified Spark-div/DuckDB-`//` contract), so both engines
  // walk bit-identical states for every t with no fp accumulation and no
  // per-step rounding rule to align. Topology is the two-altitude shape
  // every per-entity recursion here uses: the fact scan collapses
  // DISTRIBUTED (one map-side-combining hash-agg to day grain — the only
  // part that grows with data), then the recursion — inherently
  // sequential in t, O(days) ≈ thousands at ANY corpus size — runs as a
  // sort_array + single aggregate() fold over the day-grain array
  // (metadata-sized, the BPE/report precedent). The DuckDB oracle replays
  // the identical recursion as a recursive CTE over the day index.
  def tsHoltLinear(s: SparkSession, dir: String): DataFrame =
    holtFromDaily(load(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents")))

  /** The fold over an arbitrary (day DATE, cents BIGINT) series — split out
    * so the spec can drive it with planted constant/ramp series against an
    * independent plain-Scala replay of the recursion. */
  private[operators] def holtFromDaily(daily: DataFrame): DataFrame =
    holtStates(daily)
      .select(col("day"), col("cents"),
        col("l").as("level_cents"), col("b").as("trend_cents"),
        (col("l") + lit(7L) * col("b")).as("forecast_7d_cents"))
      .orderBy(col("day"))

  /** The raw per-day smoothing states (day, cents, l, b, pred) where
    * `pred` is the ONE-STEP-AHEAD forecast made BEFORE observing the day
    * (l_{t−1} + b_{t−1}; null on the first day) — the honest out-of-sample
    * prediction ts_forecast_residual scores. */
  private[operators] def holtStates(daily: DataFrame): DataFrame = {
    val lastLB = "element_at(acc, -1).l + element_at(acc, -1).b"
    val lNew = s"(x.cents + 3 * ($lastLB)) div 4"
    val fold =
      s"""aggregate(
         |  xs,
         |  cast(array() as array<struct<day:date,cents:bigint,l:bigint,b:bigint,pred:bigint>>),
         |  (acc, x) -> if(size(acc) = 0,
         |    array(named_struct('day', x.day, 'cents', x.cents,
         |                       'l', x.cents, 'b', cast(0 as bigint),
         |                       'pred', cast(null as bigint))),
         |    concat(acc, array(named_struct(
         |      'day', x.day, 'cents', x.cents,
         |      'l', $lNew,
         |      'b', (($lNew) - element_at(acc, -1).l
         |            + 3 * element_at(acc, -1).b) div 4,
         |      'pred', $lastLB)))))""".stripMargin
    daily
      .agg(sort_array(collect_list(struct(col("day"), col("cents")))).as("xs"))
      .select(explode(expr(fold)).as("r"))
      .select(col("r.day").as("day"), col("r.cents").as("cents"),
        col("r.l").as("l"), col("r.b").as("b"), col("r.pred").as("pred"))
  }

  private val tsHoltLinearOracle =
    """WITH RECURSIVE daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT day, cents, ROW_NUMBER() OVER (ORDER BY day) AS i FROM daily),
      |hw AS (
      |  SELECT i, day, cents, cents AS l, CAST(0 AS BIGINT) AS b
      |  FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT t.i, t.day, t.cents, t.l, (t.l - t.lp + 3 * t.bp) // 4 AS b
      |  FROM (
      |    SELECT d.i, d.day, d.cents,
      |           (d.cents + 3 * (hw.l + hw.b)) // 4 AS l,
      |           hw.l AS lp, hw.b AS bp
      |    FROM hw JOIN idx d ON d.i = hw.i + 1) t)
      |SELECT day, cents, CAST(l AS BIGINT) AS level_cents,
      |       CAST(b AS BIGINT) AS trend_cents,
      |       CAST(l + 7 * b AS BIGINT) AS forecast_7d_cents
      |FROM hw ORDER BY day""".stripMargin

  // ---- ts_forecast_residual -----------------------------------------------------
  // MODEL-BASED anomaly detection — the third detector beside the
  // parametric z-score and the static-baseline median/MAD: score each day
  // by its ONE-STEP-AHEAD Holt forecast error (the prediction made before
  // the day was observed — the honest out-of-sample residual forecasting
  // evaluation uses), then flag residuals that sit outside 3·1.4826·MAD
  // of the residual distribution. A trending series defeats the static
  // detectors (every recent day looks anomalous against a stale median);
  // subtracting the forecast first is what lets the cutoff adapt to
  // drift. Everything stays exact: residuals in integer cents off the
  // bit-identical smoothing states, LOWER medians ((n+1) div 2 with a day
  // tie-break — real series values, no fractional midpoint), the flag by
  // integer cross-multiply (dev·10000 > mad·44478; 44478 = 3·1.4826·10⁴).
  // Day-grain throughout (the anomaly_daily_mad posture): the fact scan
  // collapses distributed, the scoring runs on thousands of rows at any
  // corpus size.
  def tsForecastResidual(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = holtStates(load(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents")))
      .filter(col("pred").isNotNull)
      .select(col("day"), col("cents"), col("pred"),
        (col("cents") - col("pred")).as("resid"))
    val all = Window.partitionBy() // lint:series-grain (day-grain)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byResid = Window.orderBy(col("resid"), col("day")) // lint:series-grain (day-grain)
    val withMed = st
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("rn", row_number().over(byResid))
      .withColumn("med",
        max(when(col("rn") === expr("(n + 1) div 2"), col("resid"))).over(all))
      .withColumn("dev", abs(col("resid") - col("med")))
    val byDev = Window.orderBy(col("dev"), col("day")) // lint:series-grain (day-grain)
    withMed
      .withColumn("rn2", row_number().over(byDev))
      .withColumn("mad",
        max(when(col("rn2") === expr("(n + 1) div 2"), col("dev"))).over(all))
      .select(col("day"), col("cents"), col("pred").as("pred_cents"),
        col("resid").as("resid_cents"), col("med"), col("dev"), col("mad"),
        (col("dev") * 10000L > col("mad") * 44478L).as("is_anomaly"))
      .orderBy(col("day"))
  }

  private val tsForecastResidualOracle =
    """WITH RECURSIVE daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT day, cents, ROW_NUMBER() OVER (ORDER BY day) AS i FROM daily),
      |hw AS (
      |  SELECT i, day, cents, cents AS l, CAST(0 AS BIGINT) AS b,
      |         CAST(NULL AS BIGINT) AS pred
      |  FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT t.i, t.day, t.cents, t.l, (t.l - t.lp + 3 * t.bp) // 4 AS b,
      |         t.pred
      |  FROM (
      |    SELECT d.i, d.day, d.cents,
      |           (d.cents + 3 * (hw.l + hw.b)) // 4 AS l,
      |           hw.l AS lp, hw.b AS bp, hw.l + hw.b AS pred
      |    FROM hw JOIN idx d ON d.i = hw.i + 1) t),
      |res AS (
      |  SELECT day, cents, pred, cents - pred AS resid
      |  FROM hw WHERE pred IS NOT NULL),
      |nn AS (SELECT COUNT(*) AS n FROM res),
      |medr AS (
      |  SELECT resid AS med FROM (
      |    SELECT resid, ROW_NUMBER() OVER (ORDER BY resid, day) AS rn FROM res) t, nn
      |  WHERE rn = (n + 1) // 2),
      |devs AS (
      |  SELECT r.day, r.cents, r.pred, r.resid, m.med,
      |         ABS(r.resid - m.med) AS dev
      |  FROM res r, medr m),
      |madr AS (
      |  SELECT dev AS mad FROM (
      |    SELECT dev, day, ROW_NUMBER() OVER (ORDER BY dev, day) AS rn FROM devs) t, nn
      |  WHERE rn = (n + 1) // 2)
      |SELECT d.day, d.cents, CAST(d.pred AS BIGINT) AS pred_cents,
      |       CAST(d.resid AS BIGINT) AS resid_cents,
      |       CAST(d.med AS BIGINT) AS med, CAST(d.dev AS BIGINT) AS dev,
      |       CAST(m.mad AS BIGINT) AS mad,
      |       d.dev * 10000 > m.mad * 44478 AS is_anomaly
      |FROM devs d, madr m ORDER BY d.day""".stripMargin

  val queries: Map[String, Q] = Map[String, Q](
    "ts_holt_linear" -> (tsHoltLinear _),
    "ts_forecast_residual" -> (tsForecastResidual _),
    "ts_twa" -> (tsTwa _),
    "ts_seasonal_decompose" -> (tsSeasonalDecompose _),
    "ts_seasonal_strength" -> (tsSeasonalStrength _),
    "ts_autocorr" -> (tsAutocorr _),
    "ts_cross_corr" -> (tsCrossCorr _),
    "ts_changepoint_cusum" -> (tsChangepointCusum _),
    "window_zscore_rolling" -> (windowZscoreRolling _),
    "window_drawdown" -> (windowDrawdown _),
    "window_streaks" -> (windowStreaks _),
    "ts_fill_gaps" -> (tsFillGaps _),
    "ts_interpolate" -> (tsInterpolate _),
    "window_funnel" -> (windowFunnel _),
    "cohort_retention" -> (cohortRetention _),
    "window_ewma" -> (windowEwma _),
    "ts_resample_ohlc" -> (tsResampleOhlc _),
    "window_rolling_distinct" -> (windowRollingDistinct _))

  val oracles: Map[String, String] = Map(
    "ts_holt_linear" -> tsHoltLinearOracle,
    "ts_forecast_residual" -> tsForecastResidualOracle,
    "ts_twa" -> tsTwaOracle,
    "ts_autocorr" -> tsAutocorrOracle,
    "ts_cross_corr" -> tsCrossCorrOracle,
    "ts_seasonal_decompose" -> tsSeasonalDecomposeOracle,
    "ts_seasonal_strength" -> tsSeasonalStrengthOracle,
    "ts_changepoint_cusum" -> tsChangepointCusumOracle,
    "window_zscore_rolling" -> windowZscoreRollingOracle,
    "window_drawdown" -> windowDrawdownOracle,
    "window_streaks" -> windowStreaksOracle,
    "ts_fill_gaps" -> tsFillGapsOracle,
    "ts_interpolate" -> tsInterpolateOracle,
    "window_funnel" -> windowFunnelOracle,
    "cohort_retention" -> cohortRetentionOracle,
    "window_ewma" -> windowEwmaOracle,
    "ts_resample_ohlc" -> tsResampleOhlcOracle,
    "window_rolling_distinct" -> windowRollingDistinctOracle)
}
