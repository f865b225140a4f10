package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MULTI-SOURCE k-HOP BFS over the co-purchase graph — exact hop
  * distance from a seed set, the "blast radius" primitive behind
  * recall/impact analysis (which parts are within 2 substitution hops
  * of a recalled brand), graph feature engineering (distance-to-seed
  * as a model feature), and taint propagation.
  *
  * Spark-first frontier expansion — the plan GraphX's Pregel lowers
  * to, without the RDD layer:
  *
  *  - per round, the NEW frontier (nodes first reached last round)
  *    joins the prepared edge table on src — one shuffle keyed by
  *    node, Σ frontier-degree rows out;
  *  - reached-set subtraction is a left-anti join against the running
  *    `dist` table — also node-keyed, so AQE coalesces both into the
  *    same exchange layout;
  *  - per-round state is ONE (node, dist) table, checkpointed to
  *    truncate lineage ([[graft.util.Checkpoints]] — same round
  *    hygiene as [[PageRank]]); the edge build (the lineitem
  *    self-join) is paid once and checkpointed.
  *
  * Frontiers MONOTONICALLY SHRINK on high-expansion graphs (each node
  * enters at its first distance and never again), so round cost is
  * bounded by edges incident to the new frontier — the textbook
  * distributed BFS cost. Hop count is a fixed small k (3): at 100 TB
  * the k rounds are k node-keyed shuffles, no iteration-to-fixpoint.
  *
  * The ORACLE unrolls the same k rounds as pure SQL set algebra
  * (neighbors minus already-reached), a genuinely independent
  * formulation with no frontier bookkeeping. */
object Bfs {

  val bfsHops = 3

  /** Hop distance (0..maxHops) of every node reachable from `seeds`
    * within maxHops over undirected `edges(src, dst)`. */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int = bfsHops)
      : DataFrame = {
    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0))
    var frontier = dist.select("node")
    var release: () => Unit = () => ()
    for (h <- 1 to maxHops) {
      val next = edges.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(h))
      val (ck, rel) = graft.util.Checkpoints.checkpointTracked(
        dist.unionAll(next))
      release(); release = rel
      dist = ck
      frontier = dist.filter(col("dist") === h).select("node")
    }
    dist
  }

  /** Driver query: hop distance from the Brand#11 parts over the
    * co-purchase graph, ≤ 3 hops. */
  def qBfs(spark: SparkSession, dir: String): DataFrame = {
    val edges =
      PageRank.coPurchaseEdgesMemo(spark, dir).select("src", "dst")
    val seeds = Tables(spark, dir, "part")
      .filter(col("p_brand") === "Brand#11")
      .select(col("p_partkey").as("node"))
      // seeds that never appear in lineitem are still distance 0
    bfs(edges, seeds).select(col("node").as("p_partkey"),
      col("dist").cast("long").as("hops"))
  }

  /** Unrolled set-algebra oracle: d1 = N(d0) \ d0, d2 = N(d1) \ (d0∪d1),
    * d3 = N(d2) \ (d0∪d1∪d2). */
  val qBfsSql: String =
    """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      |d0 AS (SELECT DISTINCT p_partkey AS node FROM part
      |       WHERE p_brand = 'Brand#11'),
      |d1 AS (
      |  SELECT DISTINCT e.dst AS node FROM edges e JOIN d0 ON e.src = d0.node
      |  WHERE e.dst NOT IN (SELECT node FROM d0)),
      |d2 AS (
      |  SELECT DISTINCT e.dst AS node FROM edges e JOIN d1 ON e.src = d1.node
      |  WHERE e.dst NOT IN (SELECT node FROM d0)
      |    AND e.dst NOT IN (SELECT node FROM d1)),
      |d3 AS (
      |  SELECT DISTINCT e.dst AS node FROM edges e JOIN d2 ON e.src = d2.node
      |  WHERE e.dst NOT IN (SELECT node FROM d0)
      |    AND e.dst NOT IN (SELECT node FROM d1)
      |    AND e.dst NOT IN (SELECT node FROM d2))
      |SELECT node AS p_partkey, CAST(0 AS BIGINT) AS hops FROM d0
      |UNION ALL
      |SELECT node, CAST(1 AS BIGINT) FROM d1
      |UNION ALL
      |SELECT node, CAST(2 AS BIGINT) FROM d2
      |UNION ALL
      |SELECT node, CAST(3 AS BIGINT) FROM d3""".stripMargin
}
