package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Integer-exact PageRank over the co-purchase graph — graph analytics
  * expressed Spark-first (DataFrame joins + partial aggregation, the
  * same plan GraphX's Pregel would lower to, without the RDD layer):
  *
  *  - GRAPH BUILD: parts are nodes; an order containing parts i and j
  *    contributes a directed edge both ways, weighted by co-occurrence
  *    count. The lineitem self-join on l_orderkey is co-partitioned
  *    (one shuffle keys both sides), and its output is bounded by
  *    Σ orders(size²) — linear in lineitem volume for bounded basket
  *    sizes, the market-basket standard.
  *  - ITERATION: classic damped PageRank, 3 rounds, ALL INTEGER: ranks
  *    live in units of 10⁻¹² of the total mass; each round moves
  *    (850·r·w) div (1000·out) along every edge (truncating div agrees
  *    between Spark, Java and DuckDB) and re-bases with the uniform
  *    15% term. No floats anywhere, so the driver's DuckDB oracle
  *    replays every round bit-for-bit (the bpe_train/winnow unroll
  *    technique) — a hash-checked fixed-point graph computation.
  *
  * Scale shape per round: one shuffle keying edges by src (join rank +
  * out-degree), one partial-agg shuffle regrouping contributions by
  * dst — the canonical distributed PageRank cost, Σ edges per round.
  * The edge set is checkpointed once ([[graft.util.Checkpoints]]) so
  * the self-join is paid once, not per round; per-round state is one
  * (node, rank) table. Hub skew (a part in every order) is the AQE
  * skew-join case; the rank table never exceeds |nodes|. */
object PageRank {

  val prIters = 3
  /** Total rank mass (micro⁶-units): big enough that truncation noise
    * is ~10⁻⁷ relative even at 10⁶ nodes, small enough that
    * 850·rank·w stays far inside long range. */
  val prMass = 1000000000000L
  private val baseMass = prMass * 15 / 100 // exact: 1.5e11

  def coPurchaseEdges(li: DataFrame): DataFrame = {
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("src"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("dst"))
    a.join(b, "ok").filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** Broadcast the rank table into the edge scan while |nodes| is
    * broadcast-sized (each node is 16 bytes; 10⁷ nodes ≈ 160 MB, the
    * executor-memory edge of sanity) — each round is then ONE pass
    * over the checkpointed edges with a map-side hash join and a
    * partial aggregation, no edge shuffle at all. Beyond it, fall
    * back to the shuffled join (the classic distributed PageRank
    * round). The driver knows n exactly, so the choice is explicit
    * rather than left to Catalyst's post-aggregation size guess. */
  private val broadcastNodeLimit = 10000000L

  /** Per-(session, dir) memoized co-purchase edge table — the ONE
    * lineitem self-join that five graph queries (pagerank, label
    * propagation, BFS, shortest path, triangles) each paid
    * independently in a sweep (~2-4 s apiece at sf0.1).
    * localCheckpoint pins it once per session+dir; Bench's
    * dependency-tracked eviction releases it after its last dependent
    * query, and Verify's transient sweep leaves memoized blocks alone
    * (the boilerplate/lm/ivf artifact posture). */
  def coPurchaseEdgesMemo(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionCache.memoize(spark, "copurchase", dir) {
      coPurchaseEdges(graft.Tables(spark, dir, "lineitem"))
        .localCheckpoint()
    }

  def pagerank(li: DataFrame, iters: Int = prIters,
               edgesIn: Option[DataFrame] = None): DataFrame =
    pagerankFrom(li.select(col("l_partkey").as("node")).distinct(),
      edgesIn.getOrElse(coPurchaseEdges(li)), iters)

  /** The iteration core over a prepared graph — `nodes` one `node`
    * column (isolated nodes included: they carry base rank), `rawEdges`
    * the weighted (src, dst, w) table. Shared by the batch operator
    * and [[graft.streaming.GraphStore]]'s live readout. */
  def pagerankFrom(nodes: DataFrame, rawEdges: DataFrame,
                   iters: Int = prIters): DataFrame = {
    // out-degree is folded onto the edges ONCE at build time, so the
    // per-round plan touches a single prepared table
    val out = rawEdges.groupBy(col("src").as("osrc"))
      .agg(sum(col("w")).as("outw"))
    val (edges, _) = graft.util.Checkpoints.checkpointTracked(
      rawEdges.join(out, col("src") === col("osrc")).drop("osrc"))
    val n = nodes.count() // |nodes| — the oracle recomputes it in SQL
    var r = nodes.withColumn("rank", lit(prMass / n))
    var release: () => Unit = () => ()
    for (i <- 1 to iters) {
      val rankSide = r.withColumnRenamed("node", "src")
      val contrib = edges
        .join(if (n <= broadcastNodeLimit) broadcast(rankSide)
              else rankSide, "src")
        .select(col("dst"),
          expr("(850 * rank * w) div (1000 * outw)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      val next = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(baseMass / n) + coalesce(col("s"), lit(0L))).as("rank"))
      if (i < iters) {
        // truncate lineage per round; release the previous round's
        // blocks once the new round is materialized
        val (ck, rel) = graft.util.Checkpoints.checkpointTracked(next)
        release(); release = rel
        r = ck
      } else r = next
    }
    r.select(col("node").as("p_partkey"), col("rank"))
  }

  def qPagerank(spark: SparkSession, dir: String): DataFrame =
    pagerank(Tables(spark, dir, "lineitem"),
      edgesIn = Some(coPurchaseEdgesMemo(spark, dir)))

  /** Full-replay oracle: graph build + every rank round unrolled. */
  val qPagerankSql: String = {
    val per = (1 to prIters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    $baseMass // (SELECT n FROM nn)
         |      + COALESCE(CAST(SUM(
         |          (850 * r.rank * e.w) // (1000 * o.outw)) AS BIGINT), 0)
         |      AS rank
         |  FROM nodes n
         |  LEFT JOIN edges e ON e.dst = n.node
         |  LEFT JOIN r${i - 1} r ON r.node = e.src
         |  LEFT JOIN outw o ON o.src = e.src
         |  GROUP BY n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |edges AS (
       |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
       |    CAST(COUNT(*) AS BIGINT) AS w
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
       |  GROUP BY 1, 2),
       |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw
       |  FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT l_partkey AS node FROM li),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS (SELECT node, $prMass // (SELECT n FROM nn) AS rank
       |  FROM nodes),
       |$per
       |SELECT node AS p_partkey, rank FROM r$prIters""".stripMargin
  }
}
