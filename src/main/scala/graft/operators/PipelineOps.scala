package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables.load

/** Warehouse-pipeline operators beyond the reference's own surface (r4):
  * sessionization, SCD2 interval builds, runtime-filter (bloom) join
  * pruning, deterministic train/holdout splits, and pivot/unpivot
  * reshapes. Each is a first-class `queries` key with a DuckDB oracle that
  * independently re-derives the answer from the raw tables.
  *
  * Scale posture: every operator here is a single hash-partitioned window
  * or aggregation over its natural key (user_id / join key / pivot group)
  * — no driver-side loops over data, no all-pairs joins, no collect of
  * anything larger than one scalar or one bloom sketch.
  */
object PipelineOps {

  type Q = (SparkSession, String) => DataFrame

  // ---- window_session: gap-based sessionization -----------------------------
  // The canonical event-stream operator (GA/clickstream "session = events
  // separated by < gap"): one window partitioned by user to flag session
  // starts (lag + gap compare), a running sum to number them, then a
  // per-session aggregate. Both windows share ONE shuffle on user_id — the
  // session_seq sum and the lag ride the same sort, and the groupBy keys
  // (user_id, session_seq) are a prefix-extension of the window partition,
  // so Catalyst reuses the partitioning. At 100 TB this is the standard
  // topology: shuffle by user once, never materialize cross-user state.
  // The gap compare is exact integer micros (unix_micros / epoch_us) —
  // no float time arithmetic to diverge between engines.
  private val SessionGapUs = 12L * 3600 * 1000000 // 12 hours, exact µs

  def windowSession(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value").cast("decimal(18,4)")), 2).cast("double")
          .as("session_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  private val windowSessionOracle =
    s"""WITH ev AS (
       |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events),
       |flagged AS (
       |  SELECT user_id, ts, event_id, value,
       |         CASE WHEN lag(ts) OVER w IS NULL
       |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $SessionGapUs
       |              THEN 1 ELSE 0 END AS is_new
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts, value,
       |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM flagged)
       |SELECT user_id, session_seq, COUNT(*) AS n_events,
       |       MIN(ts) AS session_start, MAX(ts) AS session_end,
       |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS session_value
       |FROM sess GROUP BY user_id, session_seq
       |ORDER BY user_id, session_seq""".stripMargin

  // ---- scd2_intervals: change log → type-2 dimension ------------------------
  // Slowly-changing-dimension build: treat each user's event_type stream as
  // a state log, compress consecutive repeats (lag compare), and emit
  // validity intervals [valid_from, valid_to) via lead(), open-ended for
  // the current state. This is how a snapshot/CDC feed becomes a queryable
  // dimension. Two window passes over the SAME (user_id sort) shuffle; at
  // scale the interval table is orders of magnitude smaller than the log.
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(col("user_id"), col("event_type").as("state"),
        col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("state"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("state"))
  }

  private val scd2IntervalsOracle =
    """WITH ev AS (
      |  SELECT user_id, event_type AS state, CAST(ts AS TIMESTAMP) AS ts, event_id
      |  FROM events),
      |changed AS (
      |  SELECT user_id, state, ts, event_id
      |  FROM (SELECT *, lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
      |        FROM ev) t
      |  WHERE prev_state IS NULL OR prev_state <> state)
      |SELECT user_id, state, ts AS valid_from,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      |FROM changed
      |ORDER BY user_id, valid_from, state""".stripMargin

  // ---- join_scd2_asof: temporal join against the SCD2 dimension -------------
  // The consumer of scd2_intervals: every event joins the dimension state
  // that was valid AT its timestamp (equi on user_id, half-open interval
  // [valid_from, valid_to) on time — open-ended for the current state).
  // This is how a fact stream reads a type-2 dimension "AS OF" event time.
  // Topology: equi-key SortMergeJoin on user_id with the range predicate
  // evaluated post-match — per-user interval counts are tiny (state
  // changes, not events), so the range check never blows up a key group;
  // at 100 TB both sides shuffle once on user_id and the interval side is
  // orders of magnitude smaller than the fact side. Every event matches
  // EXACTLY one interval (intervals tile each user's timeline from their
  // first event), which the spec pins by row conservation.
  def joinScd2Asof(s: SparkSession, dir: String): DataFrame = {
    val dim = scd2Intervals(s, dir)
      .select(col("user_id"), col("state"), col("valid_from"), col("valid_to"))
    val ev = load(s, dir, "events").select(col("user_id"), col("ts"))
    ev.join(dim, Seq("user_id"))
      .filter(col("ts") >= col("valid_from") &&
        (col("valid_to").isNull || col("ts") < col("valid_to")))
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("state"))
  }

  private val joinScd2AsofOracle =
    """WITH ev AS (
      |  SELECT user_id, event_type AS state, CAST(ts AS TIMESTAMP) AS ts, event_id
      |  FROM events),
      |changed AS (
      |  SELECT user_id, state, ts, event_id
      |  FROM (SELECT *, lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
      |        FROM ev) t
      |  WHERE prev_state IS NULL OR prev_state <> state),
      |iv AS (
      |  SELECT user_id, state, ts AS valid_from,
      |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM changed)
      |SELECT i.state, COUNT(*) AS n_events,
      |       COUNT(DISTINCT e.user_id) AS n_users
      |FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
      |JOIN iv i ON i.user_id = e.user_id
      |         AND e.ts >= i.valid_from
      |         AND (i.valid_to IS NULL OR e.ts < i.valid_to)
      |GROUP BY 1 ORDER BY state""".stripMargin

  // ---- join_bloom_prefilter: runtime-filter join pruning --------------------
  // The scan-reduction pattern for selective dim joins at scale: build an
  // exact-key bloom filter from the (filtered, small) dimension side — ONE
  // action over the dim, the only driver-side artifact is the sketch
  // itself — broadcast it, and drop fact rows BEFORE the join shuffle.
  // False positives are eliminated by the exact join that follows, so the
  // result is algebraically identical to the plain join (which is exactly
  // what the oracle states — the pruning provably preserves the answer).
  // This hand-rolls what Spark's runtime row-level filtering does under
  // AQE for shuffle joins; expressing it explicitly makes the knob (fpp,
  // expected keys) visible and testable. The membership test is Spark's
  // own codegen `BloomFilterMightContain` expression (the one AQE's
  // runtime filters inject), so the prefilter stays inside the fact
  // scan's whole-stage-codegen span — PipelineOpsSpec asserts the plan.
  def joinBloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    val cust = load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val bloom = cust.stat.bloomFilter("c_custkey",
      math.max(cust.count(), 1L), 0.01)
    load(s, dir, "orders")
      .filter(graft.expressions.BloomSupport.mightContain(bloom, col("o_custkey")))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")), 2).cast("double")
          .as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val joinBloomPrefilterOracle =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- sample_split_hash: deterministic train/holdout split -----------------
  // The split every training pipeline needs: assignment must be a PURE
  // FUNCTION of the stable key — reproducible across runs, engines and
  // cluster sizes, unlike sample()/rand(seed) whose output depends on
  // partitioning. First md5 byte of the id → 256 buckets, < 230 → train
  // (230/256 ≈ 89.8%); per-row projection, shuffle-free, and the same
  // expression works as a WHERE clause to materialize either side.
  def sampleSplitHash(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int").as("bucket"))
      .select(col("doc_id"),
        when(col("bucket") < 230, "train").otherwise("holdout").as("split"))
      .orderBy(col("doc_id"))

  private val sampleSplitHashOracle =
    """SELECT doc_id,
      |       CASE WHEN (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |              + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 230
      |            THEN 'train' ELSE 'holdout' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- sample_importance: quality-weighted Bernoulli sampling ---------------
  // The soft version of curate_keep_drop's hard threshold: each doc is kept
  // with probability equal to its quality score (the importance-sampling
  // step of data recipes that UPWEIGHT good text instead of binarizing).
  // Like sample_split_hash, the coin is md5(doc_id) — a pure function of
  // the stable key, so the SAMPLE is reproducible across runs, engines and
  // partitionings: keep iff bucket(0..255) < floor(score * 256). Both
  // engines floor the identical double, so no boundary can disagree.
  // Per-row over the quality projection — shuffle-free.
  def sampleImportance(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextAnalysis.textQuality(s, dir)
      .select(col("doc_id"), col("score"))
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int"))
      .withColumn("keep",
        col("bucket") < floor(col("score") * 256).cast("int"))
      .orderBy(col("doc_id"))

  private def sampleImportanceOracle(qualityOracle: String): String =
    s"""WITH q AS ($qualityOracle),
       |b AS (
       |  SELECT doc_id, score,
       |         (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
       |           + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
       |  FROM q)
       |SELECT doc_id, score, bucket,
       |       bucket < CAST(FLOOR(score * 256) AS INT) AS keep
       |FROM b ORDER BY doc_id""".stripMargin

  // ---- agg_pivot / agg_unpivot: reshape operators ---------------------------
  // Pivot with PINNED values: passing the value list skips the extra
  // distinct-scan Spark otherwise runs to discover pivot columns — at
  // 100 TB that implicit scan is a full pass over the fact table, so
  // pinning is the rule, not an optimization. The oracle states the same
  // reshape as conditional aggregation (which is exactly what Catalyst
  // lowers pivot to).
  def aggPivot(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum(col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double"))
      .orderBy(col("o_orderpriority"))

  private val aggPivotOracle =
    """SELECT o_orderpriority,
      |       CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS "F",
      |       CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS "O",
      |       CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // Unpivot (melt): wide one-row metric panel → long (metric, value) rows —
  // the inverse reshape, used to feed generic metric sinks. Spark 3.4+
  // native `unpivot` (an Expand node: no shuffle, no join).
  def aggUnpivot(s: SparkSession, dir: String): DataFrame = {
    def m(c: String) =
      round(sum(col(c).cast("decimal(18,4)")), 2).cast("double")
    load(s, dir, "lineitem")
      .agg(m("l_quantity").as("sum_qty"),
        m("l_extendedprice").as("sum_price"),
        m("l_discount").as("sum_disc"))
      .unpivot(Array.empty[Column],
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
      .orderBy(col("metric"))
  }

  private val aggUnpivotOracle =
    """WITH agg AS (
      |  SELECT CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
      |         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
      |         CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc
      |  FROM lineitem)
      |SELECT 'sum_qty' AS metric, sum_qty AS value FROM agg
      |UNION ALL SELECT 'sum_price' AS metric, sum_price AS value FROM agg
      |UNION ALL SELECT 'sum_disc' AS metric, sum_disc AS value FROM agg
      |ORDER BY metric""".stripMargin

  // ---- merge_upsert ---------------------------------------------------------
  // MERGE (CDC apply): a deterministic changeset — deletes for key%13=0,
  // status/price updates for key%10=0 (not deleted), inserts at -key for
  // key%97=0 (o_orderkey >= 1 at every scale factor, so negated keys are
  // provably outside the base domain — no collision at any SF) — is
  // applied onto the orders snapshot with
  // delete-wins > update > insert > keep semantics. Spark-first MERGE is a
  // single full-outer hash join on the key plus a row-level CASE: one
  // shuffle of each side at any scale (or zero with co-bucketed layouts),
  // hot keys handled by AQE skew split — the copy-on-write path every
  // Delta/Iceberg MERGE lowers to. The changeset is a pure function of the
  // base table, so the oracle replays the identical join relationally.
  /** The deterministic changeset BOTH the MERGE and its recorded change
    * feed derive from — single source of truth for the %13/%10/%97
    * predicates and the update expression, so the applied merge and the
    * CDF it records cannot drift apart (they previously re-stated the
    * rules verbatim in two places). Six columns: (key, op, old_status,
    * old_total, new_status, new_total) — preimages for the feed, op +
    * postimages for the merge. */
  private[graft] def mergeChangeset(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "orders")
      .select(col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("total"))
    val deletes = base.filter(col("key") % 13 === 0)
      .select(col("key"), lit("D").as("op"),
        col("status").as("old_status"), col("total").as("old_total"),
        lit(null).cast("string").as("new_status"),
        lit(null).cast("double").as("new_total"))
    val updates = base.filter(col("key") % 10 === 0 && col("key") % 13 =!= 0)
      .select(col("key"), lit("U").as("op"),
        col("status").as("old_status"), col("total").as("old_total"),
        lit("X").as("new_status"),
        round((col("total") * lit(1.1)).cast("decimal(18,4)"), 2)
          .cast("double").as("new_total"))
    val inserts = base.filter(col("key") % 97 === 0 && col("key") > 0)
      .select((-col("key")).as("key"), lit("I").as("op"),
        lit(null).cast("string").as("old_status"),
        lit(null).cast("double").as("old_total"),
        lit("N").as("new_status"), col("total").as("new_total"))
    deletes.unionAll(updates).unionAll(inserts)
  }

  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "orders")
      .select(col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("total"))
    val changes = mergeChangeset(s, dir)
      .select(col("key"), col("op"), col("new_status"), col("new_total"))
    base.join(changes, Seq("key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("key"),
        when(col("op").isNotNull, col("new_status")).otherwise(col("status"))
          .as("status"),
        when(col("op").isNotNull, col("new_total")).otherwise(col("total"))
          .as("total"),
        coalesce(col("op"), lit("K")).as("last_op"))
      .orderBy(col("key"))
  }

  /** The row-level change feed the MERGE above emits — what a CDF-enabled
    * table records at commit time: delete preimages, insert postimages,
    * and update pre/post image pairs. The writer KNOWS its changes, so
    * recording them is one small extra write at commit; `table_changes`
    * then answers from the commit log alone instead of diffing two full
    * snapshots (TableQueries.tableIncrementalRead reads this feed back
    * through VersionedTable's `C` manifest records). */
  def mergeChangeFeed(s: SparkSession, dir: String): DataFrame = {
    val cs = mergeChangeset(s, dir)
    val deletes = cs.filter(col("op") === "D")
      .select(col("key"), col("old_status").as("status"),
        col("old_total").as("total"), lit("delete").as("change"))
    val pre = cs.filter(col("op") === "U")
      .select(col("key"), col("old_status").as("status"),
        col("old_total").as("total"), lit("update_pre").as("change"))
    val post = cs.filter(col("op") === "U")
      .select(col("key"), col("new_status").as("status"),
        col("new_total").as("total"), lit("update_post").as("change"))
    val inserts = cs.filter(col("op") === "I")
      .select(col("key"), col("new_status").as("status"),
        col("new_total").as("total"), lit("insert").as("change"))
    deletes.unionAll(inserts).unionAll(pre).unionAll(post)
  }

  private val mergeUpsertOracle =
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status, o_totalprice AS total
      |  FROM orders),
      |changes AS (
      |  SELECT key, 'D' AS op, CAST(NULL AS VARCHAR) AS new_status,
      |         CAST(NULL AS DOUBLE) AS new_total
      |  FROM base WHERE key % 13 = 0
      |  UNION ALL
      |  SELECT key, 'U', 'X',
      |         CAST(ROUND(CAST(total * 1.1 AS DECIMAL(18,4)), 2) AS DOUBLE)
      |  FROM base WHERE key % 10 = 0 AND key % 13 <> 0
      |  UNION ALL
      |  SELECT -key, 'I', 'N', total
      |  FROM base WHERE key % 97 = 0 AND key > 0)
      |SELECT COALESCE(b.key, c.key) AS key,
      |       CASE WHEN c.op IS NOT NULL THEN c.new_status ELSE b.status END AS status,
      |       CASE WHEN c.op IS NOT NULL THEN c.new_total ELSE b.total END AS total,
      |       COALESCE(c.op, 'K') AS last_op
      |FROM base b FULL OUTER JOIN changes c ON c.key = b.key
      |WHERE c.op IS NULL OR c.op <> 'D'
      |ORDER BY key""".stripMargin

  // ---- join_full_outer_diff -------------------------------------------------
  // Snapshot reconciliation through a batch FULL OUTER join — the audit
  // every daily-reload pipeline runs when two snapshot vintages disagree
  // ("what changed between yesterday's load and today's?"): today's
  // snapshot is derived from yesterday's by planted key arithmetic
  // (drop every 97th key → REMOVED, double every 89th surviving total →
  // CHANGED, append fresh negative keys → ADDED), full-outer on the key,
  // and each row classifies from null-side structure + value compare.
  // The report is per-class counts + an exact-cents delta — the numbers
  // a reconciliation dashboard shows. This is the batch full-outer the
  // join family lacked (the streaming siblings ride watermark eviction;
  // here both null sides materialize in one pass). At 100 TB both
  // snapshots hash-partition on the key — one co-partitioned shuffle
  // each, no broadcast (both sides are table-sized by construction).
  def joinFullOuterDiff(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "orders")
      .select(col("o_orderkey").as("key"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val today = base.filter(col("key") % 97 =!= 0)
      .withColumn("cents",
        when(col("key") % 89 === 0, col("cents") * 2).otherwise(col("cents")))
      // fresh keys are -(key+1): strictly negative, so the degenerate
      // key 0 (where -key = key would collide with its own removal)
      // cannot alias a surviving row
      .unionAll(base.filter(col("key") % 101 === 0)
        .select((-(col("key") + 1)).as("key"), col("cents")))
    val diff = base.as("a").join(today.as("b"), col("a.key") === col("b.key"),
        "full_outer")
      .select(
        coalesce(col("a.key"), col("b.key")).as("key"),
        when(col("a.key").isNull, lit("added"))
          .when(col("b.key").isNull, lit("removed"))
          .when(col("a.cents") =!= col("b.cents"), lit("changed"))
          .otherwise(lit("unchanged")).as("class"),
        (coalesce(col("b.cents"), lit(0L)) - coalesce(col("a.cents"), lit(0L)))
          .as("delta_cents"))
    diff.groupBy(col("class"))
      .agg(count(lit(1)).as("n"),
        sum(col("delta_cents")).as("delta_cents"),
        min(col("key")).as("min_key"),
        max(col("key")).as("max_key"))
      .orderBy(col("class"))
  }

  private val joinFullOuterDiffOracle =
    """WITH base AS (
      |  SELECT o_orderkey AS key,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |today AS (
      |  SELECT key,
      |         CASE WHEN key % 89 = 0 THEN cents * 2 ELSE cents END AS cents
      |  FROM base WHERE key % 97 <> 0
      |  UNION ALL
      |  SELECT -(key + 1) AS key, cents FROM base WHERE key % 101 = 0),
      |diff AS (
      |  SELECT COALESCE(a.key, b.key) AS key,
      |         CASE WHEN a.key IS NULL THEN 'added'
      |              WHEN b.key IS NULL THEN 'removed'
      |              WHEN a.cents <> b.cents THEN 'changed'
      |              ELSE 'unchanged' END AS class,
      |         COALESCE(b.cents, 0) - COALESCE(a.cents, 0) AS delta_cents
      |  FROM base a FULL OUTER JOIN today b ON a.key = b.key)
      |SELECT class, COUNT(*) AS n,
      |       CAST(SUM(delta_cents) AS BIGINT) AS delta_cents,
      |       CAST(MIN(key) AS BIGINT) AS min_key,
      |       CAST(MAX(key) AS BIGINT) AS max_key
      |FROM diff GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- join_spatial_grid ----------------------------------------------------
  // Grid-blocked SPATIAL distance self-join — "all pairs within radius r"
  // without an all-pairs join, the blocking every geo pipeline uses
  // before a distance predicate (geohash/S2 cells are this same idea on
  // the sphere): points land in a uniform grid with CELL SIZE = r, so
  // every pair within r is in the same or an adjacent cell — one side
  // explodes to its 3×3 neighborhood and the join is pure equi on the
  // cell, with the exact integer distance check post-match. Coordinates
  // derive from md5 of the key (the proven 4-hex device), so both
  // engines place every point identically and the oracle replays the
  // whole thing. Candidate volume ∝ points × local density — never n²;
  // at 100 TB both sides hash-partition on the cell key and skew is
  // bounded by the densest cell (salt cells further if needed — the
  // join_skew_salted device composes).
  private val GridCell = 1024L // cell edge == radius, in 16-bit grid units
  def joinSpatialGrid(s: SparkSession, dir: String): DataFrame = {
    val pts = load(s, dir, "customer")
      .select(col("c_custkey").as("id"))
      .withColumn("x",
        conv(substring(md5(col("id").cast("string")), 1, 4), 16, 10).cast("long"))
      .withColumn("y",
        conv(substring(md5(col("id").cast("string")), 5, 4), 16, 10).cast("long"))
      .withColumn("cx", expr(s"x div $GridCell"))
      .withColumn("cy", expr(s"y div $GridCell"))
    val nb = pts.select(col("id").as("id_b"), col("x").as("xb"),
        col("y").as("yb"), col("cx").as("cbx"), col("cy").as("cby"))
      .withColumn("d", explode(expr(
        "transform(sequence(0, 8), i -> struct(i div 3 - 1 AS dx, i % 3 - 1 AS dy))")))
      .select(col("id_b"), col("xb"), col("yb"),
        (col("cbx") + col("d.dx")).as("cx"), (col("cby") + col("d.dy")).as("cy"))
    pts.join(nb, Seq("cx", "cy"))
      .filter(col("id") < col("id_b"))
      .withColumn("dist2",
        (col("x") - col("xb")) * (col("x") - col("xb")) +
          (col("y") - col("yb")) * (col("y") - col("yb")))
      .filter(col("dist2") <= GridCell * GridCell)
      .select(col("id").as("id_a"), col("id_b"), col("dist2"))
      // no distinct needed (r10 ADVICE): each point occupies exactly ONE
      // grid cell, so a candidate pair meets through exactly one (dx,dy)
      // offset — the 9 exploded neighbor cells of b are distinct, and
      // a's single cell can equal at most one of them. A distinct here
      // was a full extra shuffle of the matched pairs for nothing.
      .orderBy(col("id_a"), col("id_b"))
  }

  private val joinSpatialGridOracle =
    s"""WITH pts AS (
       |  SELECT c_custkey AS id,
       |         CAST((instr('0123456789abcdef', substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) - 1) * 4096
       |            + (instr('0123456789abcdef', substring(md5(CAST(c_custkey AS VARCHAR)), 2, 1)) - 1) * 256
       |            + (instr('0123456789abcdef', substring(md5(CAST(c_custkey AS VARCHAR)), 3, 1)) - 1) * 16
       |            + (instr('0123456789abcdef', substring(md5(CAST(c_custkey AS VARCHAR)), 4, 1)) - 1) AS BIGINT) AS x,
       |         CAST((instr('0123456789abcdef', substring(md5(CAST(c_custkey AS VARCHAR)), 5, 1)) - 1) * 4096
       |            + (instr('0123456789abcdef', substring(md5(CAST(c_custkey AS VARCHAR)), 6, 1)) - 1) * 256
       |            + (instr('0123456789abcdef', substring(md5(CAST(c_custkey AS VARCHAR)), 7, 1)) - 1) * 16
       |            + (instr('0123456789abcdef', substring(md5(CAST(c_custkey AS VARCHAR)), 8, 1)) - 1) AS BIGINT) AS y
       |  FROM customer)
       |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
       |FROM pts a JOIN pts b
       |  ON a.id < b.id
       | AND abs((a.x // $GridCell) - (b.x // $GridCell)) <= 1
       | AND abs((a.y // $GridCell) - (b.y // $GridCell)) <= 1
       | AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       |       <= $GridCell * $GridCell
       |ORDER BY id_a, id_b""".stripMargin

  // ---- sample_time_split ----------------------------------------------------
  // TEMPORAL train/test split + leakage audit — the split an ML pipeline
  // must use when examples have timestamps (hash splits leak the future
  // into training): cutoff = first day + 3/4 of the observed span
  // (integer day arithmetic on the data's own min/max, so the boundary
  // is a pure function of the data), events before it train, the rest
  // test — and the report carries the LEAKAGE count: users active on
  // both sides, exactly the population whose test rows are
  // non-independent of training (what a grouped/user-level split would
  // have to hold out). One scan tags map-side against a broadcast
  // 2-value bound row; the audit is a user-grain agg — no second scan
  // of the event log.
  def sampleTimeSplit(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(expr("date_add(d0, CAST(datediff(d1, d0) * 3 div 4 AS INT))")
        .as("cutoff"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("split",
        when(col("day") < col("cutoff"), lit("train")).otherwise(lit("test")))
    val leak = tagged.select(col("user_id"), col("split")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sides"))
      .filter(col("n_sides") === 2)
      .agg(count(lit(1)).as("n_leak_users"))
    tagged.groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("day")).as("first_day"),
        max(col("day")).as("last_day"))
      .crossJoin(broadcast(leak))
      .orderBy(col("split"))
  }

  private val sampleTimeSplitOracle =
    """WITH ev AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id FROM events),
      |b AS (
      |  SELECT MIN(day) + CAST((MAX(day) - MIN(day)) * 3 // 4 AS INT) AS cutoff
      |  FROM ev),
      |tagged AS (
      |  SELECT day, user_id,
      |         CASE WHEN day < (SELECT cutoff FROM b) THEN 'train'
      |              ELSE 'test' END AS split
      |  FROM ev),
      |leak AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_leak_users FROM (
      |    SELECT user_id FROM (SELECT DISTINCT user_id, split FROM tagged) t
      |    GROUP BY user_id HAVING COUNT(*) = 2))
      |SELECT split, COUNT(*) AS n_events,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |       MIN(day) AS first_day, MAX(day) AS last_day,
      |       (SELECT n_leak_users FROM leak) AS n_leak_users
      |FROM tagged GROUP BY split ORDER BY split""".stripMargin

  // ---- join_interval_overlap ----------------------------------------------
  // INTERVAL × INTERVAL overlap join — both sides are ranges (order
  // validity windows here; IP blocks, sessions, sensor epochs in the
  // wild), pairs match when [sa,ea] ∩ [sb,eb] ≠ ∅. The point-in-range
  // key (join_range_bucketed) explodes the POINT side; with two interval
  // sides the standard scale plan is BUCKET-AND-CREDIT: each interval
  // explodes into the 7-day buckets it spans, the join is pure equi on
  // (user, bucket), and a candidate pair is EMITTED ONLY FROM its first
  // shared bucket — bucket = max(start-bucket_a, start-bucket_b), which
  // every overlapping pair shares exactly once — so no distinct() ever
  // reshuffles the matched pairs (the r10 spatial-grid lesson, applied
  // to 1-D ranges). The exact overlap predicate runs as a residual
  // filter after the equi-match. Scale: candidate volume ∝ intervals ×
  // local density per bucket, never |A|×|B|; both sides hash-partition
  // on (user, bucket), so a dense user composes with the salting device.
  def joinIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val epoch = lit("1970-01-01")
    def side(par: Int, len: Int, ka: String) =
      load(s, dir, "orders")
        .filter(col("o_orderkey") % 2 === par)
        .select(col("o_custkey").as("user_id"),
          col("o_orderkey").as(ka),
          to_date(col("o_orderdate")).as(s"s_$ka"),
          date_add(to_date(col("o_orderdate")), len).as(s"e_$ka"))
        .withColumn(s"bs_$ka",
          floor(datediff(col(s"s_$ka"), epoch) / 7))
        .withColumn(s"be_$ka",
          floor(datediff(col(s"e_$ka"), epoch) / 7))
    val a = side(0, 3, "a")
      .withColumn("bucket",
        explode(expr("sequence(bs_a, be_a)")))
    val b = side(1, 4, "b")
      .withColumn("bucket",
        explode(expr("sequence(bs_b, be_b)")))
    a.join(b, Seq("user_id", "bucket"))
      // credit to the FIRST shared bucket: exactly one emission per pair
      .filter(col("bucket") === greatest(col("bs_a"), col("bs_b")))
      // residual: the exact overlap test
      .filter(col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .select(col("user_id"), col("a"), col("b"),
        col("s_a"), col("e_a"), col("s_b"), col("e_b"),
        (datediff(least(col("e_a"), col("e_b")),
          greatest(col("s_a"), col("s_b"))) + 1).as("overlap_days"))
      .orderBy(col("user_id"), col("a"), col("b"))
  }

  private val joinIntervalOverlapOracle =
    """WITH sa AS (
      |  SELECT o_custkey AS user_id, o_orderkey AS a,
      |         CAST(o_orderdate AS DATE) AS s_a,
      |         CAST(o_orderdate AS DATE) + 3 AS e_a
      |  FROM orders WHERE o_orderkey % 2 = 0),
      |sb AS (
      |  SELECT o_custkey AS user_id, o_orderkey AS b,
      |         CAST(o_orderdate AS DATE) AS s_b,
      |         CAST(o_orderdate AS DATE) + 4 AS e_b
      |  FROM orders WHERE o_orderkey % 2 = 1)
      |SELECT sa.user_id, sa.a, sb.b, s_a, e_a, s_b, e_b,
      |       CAST(date_diff('day', greatest(s_a, s_b), least(e_a, e_b)) + 1 AS INT)
      |         AS overlap_days
      |FROM sa JOIN sb ON sa.user_id = sb.user_id
      |  AND s_a <= e_b AND s_b <= e_a
      |ORDER BY sa.user_id, sa.a, sb.b""".stripMargin

  // ---- sample_group_holdout ---------------------------------------------
  // GROUP-wise holdout — the third split beside the row-hash
  // (sample_split_hash) and temporal (sample_time_split) modes: every
  // event of a user lands on ONE side, decided by md5(user_id) (the
  // pure-function coin, ~90/10 at the 230/256 threshold). This is the
  // leakage-free eval split when examples CORRELATE within a group —
  // a row-wise split trains on half a user's history and evaluates on
  // the rest, inflating metrics exactly like the future-leak
  // sample_time_split audits. The report carries n_leaked_users (users
  // seen on both sides) as an ORACLE-CHECKED column, not a comment
  // claim — it is 0 by construction because the coin is a function of
  // the group key alone. Scale: the side tag is a per-row projection
  // (shuffle-free); the side totals are one map-side-combining agg with
  // a user-grain distinct; the leak audit re-uses the same (user, split)
  // distinct frame.
  def sampleGroupHoldout(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("split",
        when(conv(substring(md5(col("user_id").cast("string")), 1, 2), 16, 10)
          .cast("int") < 230, "train").otherwise("holdout"))
    val sides = ev.groupBy(col("split"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
    val leaks = ev.select(col("user_id"), col("split")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("ns"))
      .filter(col("ns") > 1)
      .agg(count(lit(1)).as("n_leaked_users"))
    sides.crossJoin(broadcast(leaks)).orderBy(col("split"))
  }

  private val sampleGroupHoldoutOracle =
    """WITH ev AS (
      |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
      |         CASE WHEN (instr('0123456789abcdef', substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16
      |                 + (instr('0123456789abcdef', substring(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1) < 230
      |              THEN 'train' ELSE 'holdout' END AS split
      |  FROM events),
      |sides AS (
      |  SELECT split, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |         CAST(COUNT(*) AS BIGINT) AS n_events,
      |         CAST(SUM(cents) AS BIGINT) AS cents
      |  FROM ev GROUP BY split),
      |leaks AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_leaked_users FROM (
      |    SELECT user_id FROM (SELECT DISTINCT user_id, split FROM ev) t
      |    GROUP BY user_id HAVING COUNT(*) > 1) u)
      |SELECT s.split, s.n_users, s.n_events, s.cents, l.n_leaked_users
      |FROM sides s, leaks l ORDER BY s.split""".stripMargin

  // ---- window_waterfall_alloc ----------------------------------------------
  // The payment-allocation WATERFALL — the receivables/settlement operator
  // every billing pipeline runs: apply each customer's payment pool
  // against their invoices in strict date order until it runs out, and
  // report per invoice how much was covered (paid / partial / unpaid).
  // The naive formulation is a sequential loop over invoices; the
  // closed form is two prefix sums — with pool B and invoice amounts a_i
  // in order, alloc_i = clamp(B − Σ_{j<i} a_j, 0, a_i) — so the whole
  // waterfall is ONE window (running sum over the customer's invoice
  // sequence) plus a projection. The pool here is the deterministic
  // 40%-settlement scenario — B = (2·Σa) div 5 per customer — so the
  // fixture provably exercises all three outcomes (paid prefix, one
  // partial, unpaid tail) at every SF (a fixed external pool degenerates:
  // at sf0.001 no event-value pool covers even one invoice). Invoices =
  // the customer's orders by (date, orderkey). Everything is exact
  // integer cents, and the one exchange is the customer-key window
  // shuffle (the pool rides the SAME partitioning as a second window
  // aggregate — zero extra exchange): the textbook "sequential business
  // rule turned prefix-scan" at any scale.
  def windowWaterfallAlloc(s: SparkSession, dir: String): DataFrame = {
    val inv = load(s, dir, "orders")
      .select(col("o_custkey").as("user_id"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("amount_cents"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("d"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inv.withColumn("pool_cents",
        expr("2 * sum(amount_cents) over (partition by user_id) div 5"))
      .withColumn("cum_cents", sum(col("amount_cents")).over(w))
      .withColumn("alloc_cents", expr(
        """greatest(0L, least(amount_cents,
          |  pool_cents - (cum_cents - amount_cents)))""".stripMargin))
      .withColumn("outstanding_cents", col("amount_cents") - col("alloc_cents"))
      .withColumn("status",
        when(col("outstanding_cents") === 0, "paid")
          .when(col("alloc_cents") > 0, "partial")
          .otherwise("unpaid"))
      .select(col("user_id"), col("o_orderkey"), col("d"),
        col("amount_cents"), col("alloc_cents"),
        col("outstanding_cents"), col("status"))
      .orderBy(col("user_id"), col("d"), col("o_orderkey"))
  }

  private val windowWaterfallAllocOracle =
    """WITH inv AS (
      |  SELECT o_custkey AS user_id, o_orderkey,
      |         CAST(o_orderdate AS DATE) AS d,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS amount_cents
      |  FROM orders),
      |run AS (
      |  SELECT user_id, o_orderkey, d, amount_cents,
      |         2 * SUM(amount_cents) OVER (PARTITION BY user_id) // 5 AS pool_cents,
      |         SUM(amount_cents) OVER (
      |           PARTITION BY user_id ORDER BY d, o_orderkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
      |  FROM inv)
      |SELECT user_id, o_orderkey, d, amount_cents,
      |       CAST(GREATEST(0, LEAST(amount_cents,
      |         pool_cents - (cum_cents - amount_cents))) AS BIGINT) AS alloc_cents,
      |       CAST(amount_cents - GREATEST(0, LEAST(amount_cents,
      |         pool_cents - (cum_cents - amount_cents))) AS BIGINT) AS outstanding_cents,
      |       CASE WHEN amount_cents - GREATEST(0, LEAST(amount_cents,
      |              pool_cents - (cum_cents - amount_cents))) = 0 THEN 'paid'
      |            WHEN GREATEST(0, LEAST(amount_cents,
      |              pool_cents - (cum_cents - amount_cents))) > 0 THEN 'partial'
      |            ELSE 'unpaid' END AS status
      |FROM run ORDER BY user_id, d, o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map[String, Q](
    "window_waterfall_alloc" -> (windowWaterfallAlloc _),
    "sample_group_holdout" -> (sampleGroupHoldout _),
    "join_interval_overlap" -> (joinIntervalOverlap _),
    "sample_time_split" -> (sampleTimeSplit _),
    "join_spatial_grid" -> (joinSpatialGrid _),
    "join_full_outer_diff" -> (joinFullOuterDiff _),
    "window_session" -> (windowSession _),
    "scd2_intervals" -> (scd2Intervals _),
    "join_scd2_asof" -> (joinScd2Asof _),
    "join_bloom_prefilter" -> (joinBloomPrefilter _),
    "sample_split_hash" -> (sampleSplitHash _),
    "sample_importance" -> (sampleImportance _),
    "agg_pivot" -> (aggPivot _),
    "agg_unpivot" -> (aggUnpivot _),
    "merge_upsert" -> (mergeUpsert _))

  val oracles: Map[String, String] = Map(
    "sample_group_holdout" -> sampleGroupHoldoutOracle,
    "join_interval_overlap" -> joinIntervalOverlapOracle,
    "sample_time_split" -> sampleTimeSplitOracle,
    "join_spatial_grid" -> joinSpatialGridOracle,
    "join_full_outer_diff" -> joinFullOuterDiffOracle,
    "window_session" -> windowSessionOracle,
    "window_waterfall_alloc" -> windowWaterfallAllocOracle,
    "scd2_intervals" -> scd2IntervalsOracle,
    "join_scd2_asof" -> joinScd2AsofOracle,
    "join_bloom_prefilter" -> joinBloomPrefilterOracle,
    "sample_split_hash" -> sampleSplitHashOracle,
    "sample_importance" -> sampleImportanceOracle(
      graft.llm.TextAnalysis.oracles("text_quality")),
    "agg_pivot" -> aggPivotOracle,
    "agg_unpivot" -> aggUnpivotOracle,
    "merge_upsert" -> mergeUpsertOracle)
}
