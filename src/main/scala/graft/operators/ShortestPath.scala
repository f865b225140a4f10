package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** BOUNDED-HOP WEIGHTED SHORTEST PATH — Bellman-Ford's min-plus
  * relaxation over the co-purchase graph, the weighted counterpart of
  * [[Bfs]]: BFS answers "how many hops", this answers "what's the
  * CHEAPEST route", and the two genuinely differ — a 2-hop path
  * through strong co-purchase ties can undercut a weak direct edge,
  * so a node's cost can keep IMPROVING after it is first reached
  * (the case [[graft.BfsSpec]]'s first-reach semantics forbids, and
  * the one this operator's spec pins).
  *
  * Per round, the relaxation is one shuffle: current costs join edges
  * on src (node-keyed), candidate costs union the standing table, and
  * `min` per node re-reduces — the min-plus monoid, associative and
  * idempotent, so the round is also exactly the merge a streaming or
  * incremental variant would run. k rounds = exact cheapest cost over
  * paths of ≤ k edges (the bounded-horizon contract — at 100 TB you
  * run horizon rounds, not to fixpoint; negative cycles can't bite
  * because costs are positive). Per-round state is one (node, cost)
  * table, checkpointed like every iterative operator here.
  *
  * Edge cost is INTEGER: 10⁶ div w (strong ties are cheap), so every
  * candidate cost is an exact long and the ORACLE unrolls the k
  * rounds bit-for-bit (the PageRank/BFS replay posture). */
object ShortestPath {

  val spHops = 3
  private val costScale = 1000000L

  /** Min cost to each node reachable from `seeds` within `maxHops`
    * edges over `edges(src, dst, w)`. */
  def shortestPath(edges: DataFrame, seeds: DataFrame,
                   maxHops: Int = spHops): DataFrame = {
    // integer div, not `/`: Spark's `/` on longs is DOUBLE division,
    // and the oracle's `//` truncates — `div` matches it exactly
    val weighted = edges.select(col("src"), col("dst"),
      expr(s"$costScale div w").as("cost"))
    var dist = seeds.select(col("node")).distinct()
      .withColumn("cost", lit(0L))
    var release: () => Unit = () => ()
    for (_ <- 1 to maxHops) {
      val relaxed = weighted
        .join(dist.withColumnRenamed("node", "src")
          .withColumnRenamed("cost", "dcost"), "src")
        .select(col("dst").as("node"), (col("dcost") + col("cost")).as("cost"))
      val next = dist.unionAll(relaxed)
        .groupBy("node").agg(min(col("cost")).as("cost"))
      val (ck, rel) = graft.util.Checkpoints.checkpointTracked(next)
      release(); release = rel
      dist = ck
    }
    dist
  }

  /** Driver query: cheapest substitution route from the Brand#11 parts
    * over co-purchase ties, ≤ 3 edges. */
  def qShortestPath(spark: SparkSession, dir: String): DataFrame = {
    val edges = PageRank.coPurchaseEdgesMemo(spark, dir)
    val seeds = Tables(spark, dir, "part")
      .filter(col("p_brand") === "Brand#11")
      .select(col("p_partkey").as("node"))
    shortestPath(edges, seeds)
      .select(col("node").as("p_partkey"), col("cost"))
  }

  /** Unrolled min-plus oracle: r_{i} = min per node over r_{i-1} ∪
    * relax(r_{i-1}). */
  val qShortestPathSql: String = {
    val rounds = (1 to spHops).map { i =>
      s"""r$i AS (
         |  SELECT node, MIN(cost) AS cost FROM (
         |    SELECT node, cost FROM r${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, r.cost + e.cost AS cost
         |    FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |  ) GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |edges AS (
       |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
       |    CAST($costScale // COUNT(*) AS BIGINT) AS cost
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
       |  GROUP BY 1, 2),
       |r0 AS (
       |  SELECT DISTINCT p_partkey AS node, CAST(0 AS BIGINT) AS cost
       |  FROM part WHERE p_brand = 'Brand#11'),
       |$rounds
       |SELECT node AS p_partkey, cost FROM r$spHops""".stripMargin
  }
}
