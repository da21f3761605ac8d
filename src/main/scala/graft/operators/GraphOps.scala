package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables.load

/** Graph analytics over a derived co-occurrence graph — the message-passing
  * superstep topology beyond dedup_clusters' connected components.
  *
  * The graph: suppliers are vertices, and a directed edge s1→s2 exists when
  * both supplied the same order (the co-supply graph — symmetric by
  * construction, cycles everywhere, the shape PageRank is interesting on).
  *
  * Portability contract: ranks are BIGINT micros (1.0 = 1,000,000), every
  * per-edge contribution is truncated integer division (`rank div deg` —
  * Spark `div` and DuckDB `//` agree), and the damping update is integer
  * multiply-then-div — so two engines running entirely different execution
  * strategies produce bit-identical ranks.
  */
object GraphOps {

  type Q = (SparkSession, String) => DataFrame

  // ---- graph_pagerank -------------------------------------------------------
  // Two exact power-method supersteps of PageRank (damping 0.85, uniform
  // init, unnormalized — the relative ordering is the product). Each
  // superstep is the canonical Pregel round as plain relational ops: join
  // ranks onto edges by src (messages), hash-agg by dst (combine), map the
  // damping update — at 100 TB edges hash-partition by src once and both
  // supersteps reuse that layout; per-superstep cost is one shuffle of
  // (dst, contribution) pairs, exactly the dedup_clusters CC topology.
  // Iterating further repeats the same two joins (convergence would be a
  // driver-side scalar, as in CC); two fixed rounds keep the oracle a
  // finite CTE chain.
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    val pairs = load(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    // materialize the edge list ONCE (localCheckpoint, the dedup_clusters
    // lifecycle): without it Catalyst re-executes the pairs self-join +
    // distinct inside deg AND inside every superstep — 4 recomputes of the
    // most expensive stage. Unreplicated blocks, same re-runnable-batch
    // trade as documented in Dedup.scala.
    val edges = pairs.as("a").join(pairs.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") =!= col("b.sk"))
      .select(col("a.sk").as("src"), col("b.sk").as("dst"))
      .distinct()
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint() // joined in every superstep — k rows, pin it too
    // TRUE vertex set = every distinct supplier, not just edge sources: a
    // supplier that never co-supplies an order (isolated vertex) has no
    // edges but still holds the (1-d) damping-floor rank of 150000 micros.
    val nodes = pairs.select(col("sk").as("node")).distinct()
      .localCheckpoint() // k rows, joined in every superstep

    // r0 = 1.0 (scaled 1e6) for every vertex
    def step(rank: DataFrame): DataFrame = {
      val contrib = edges
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      nodes.join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) +
            expr("850000 * coalesce(contrib, 0L) div 1000000")).as("r"))
    }
    val r0 = nodes.select(col("node"), lit(1000000L).as("r"))
    val r2 = step(step(r0))
    r2.select(col("node").as("suppkey"), col("r").as("rank_micros"))
      .orderBy(col("suppkey"))
  }

  private val graphPagerankOracle =
    """WITH pairs AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT a.sk AS src, b.sk AS dst
      |  FROM pairs a JOIN pairs b ON a.ok = b.ok AND a.sk <> b.sk),
      |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
      |nodes AS (SELECT DISTINCT sk AS node FROM pairs),
      |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
      |c1 AS (
      |  SELECT e.dst, CAST(SUM(r0.r // d.deg) AS BIGINT) AS contrib
      |  FROM edges e JOIN r0 ON r0.node = e.src JOIN deg d ON d.src = e.src
      |  GROUP BY e.dst),
      |r1 AS (
      |  SELECT n.node,
      |         CAST(150000 + (850000 * COALESCE(c1.contrib, 0)) // 1000000 AS BIGINT) AS r
      |  FROM nodes n LEFT JOIN c1 ON c1.dst = n.node),
      |c2 AS (
      |  SELECT e.dst, CAST(SUM(r1.r // d.deg) AS BIGINT) AS contrib
      |  FROM edges e JOIN r1 ON r1.node = e.src JOIN deg d ON d.src = e.src
      |  GROUP BY e.dst),
      |r2 AS (
      |  SELECT n.node,
      |         CAST(150000 + (850000 * COALESCE(c2.contrib, 0)) // 1000000 AS BIGINT) AS r
      |  FROM nodes n LEFT JOIN c2 ON c2.dst = n.node)
      |SELECT node AS suppkey, r AS rank_micros
      |FROM r2 ORDER BY suppkey""".stripMargin

  val queries: Map[String, Q] = Map[String, Q](
    "graph_pagerank" -> (graphPagerank _))

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> graphPagerankOracle)
}
