package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Community detection by synchronous label propagation (Raghavan et
  * al. 2007) over the co-purchase graph — the third whole-graph
  * analytic next to [[PageRank]] and [[Triangles]], in the same
  * integer-exact, oracle-replayable style.
  *
  * Each round, every node adopts the label with the LARGEST total
  * incident edge weight among its neighbors, ties broken by the
  * smallest label — a deterministic argmax, so the whole computation
  * is a pure function of the graph and both engines replay it
  * bit-for-bit (asynchronous/randomized LPA variants converge faster
  * but are irreproducible by construction — wrong trade for a
  * hash-checked engine). Fixed [[lpRounds]] rounds: LPA is used as a
  * bounded-cost partitioner at scale (a few sweeps give most of the
  * modularity), not run to its oscillation-prone fixpoint.
  *
  * Plan shape per round — two partial-agg shuffles, Σ edges work:
  *  1. edges ⨝ labels keyed on src (the label table broadcasts while
  *     |nodes| permits, [[PageRank]]'s explicit dial);
  *  2. groupBy (dst, label) SUM(w) — partial-aggregated, keys bounded
  *     by the edge count;
  *  3. per-dst argmax via max(struct(sum, −label)) — an ordinary
  *     aggregate, NO window: max over the lexicographic struct order
  *     picks highest sum then smallest label, one more partial agg.
  * The edge set is checkpointed once; per-round state is one
  * (node, label) table. Isolated nodes can't occur (every co-purchase
  * node has ≥1 edge by construction). */
object LabelProp {

  val lpRounds = 3

  def labelPropagate(li: DataFrame, rounds: Int = lpRounds,
                     edgesIn: Option[DataFrame] = None): DataFrame =
    labelPropagateFrom(
      li.select(col("l_partkey").as("node")).distinct(),
      edgesIn.getOrElse {
        val (e, _) = graft.util.Checkpoints.checkpointTracked(
          PageRank.coPurchaseEdges(li))
        e
      }, rounds)

  /** The propagation core over a prepared graph — shared by the batch
    * operator and [[graft.streaming.GraphStore]]'s live readout. */
  def labelPropagateFrom(nodes: DataFrame, edges: DataFrame,
                         rounds: Int = lpRounds): DataFrame = {
    val n = nodes.count()
    val bcast = n <= 10000000L
    var lab = nodes.withColumn("label", col("node"))
    var release: () => Unit = () => ()
    for (i <- 1 to rounds) {
      val labSide = lab.withColumnRenamed("node", "src")
      val next = edges
        .join(if (bcast) broadcast(labSide) else labSide, "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(sum(col("w")).as("s"))
        .groupBy("node")
        .agg(max(struct(col("s"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
      if (i < rounds) {
        val (ck, rel) = graft.util.Checkpoints.checkpointTracked(next)
        release(); release = rel
        lab = ck
      } else lab = next
    }
    lab.select(col("node").as("p_partkey"), col("label").as("community"))
  }

  /** Per-(session, dir) memoized LPA labeling — [[GraphStats]]'
    * modularity readout re-reads the SAME partition q_label_prop
    * publishes, so the 3-sweep propagation is paid once per session,
    * not per consumer (the [[PageRank.coPurchaseEdgesMemo]] posture). */
  def labelPropMemo(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionCache.memoize(spark, "labelprop", dir) {
      labelPropagate(Tables(spark, dir, "lineitem"),
        edgesIn = Some(PageRank.coPurchaseEdgesMemo(spark, dir)))
        .localCheckpoint()
    }

  def qLabelProp(spark: SparkSession, dir: String): DataFrame =
    labelPropMemo(spark, dir)

  /** Full-replay oracle prefix: graph build + every argmax round
    * unrolled (the [[PageRank.qPagerankSql]] technique; the argmax is
    * the row_number-over-(sum desc, label asc) formulation, which
    * equals the engine's struct-max by the same total order). Ends at
    * the final round's label table l`lpRounds`; [[GraphStats]]'
    * modularity oracle composes it so both queries pin ONE community
    * definition. Kept plain ANSI (no MATERIALIZED hints): the
    * LabelPropSpec cross-check parses this text through Spark too. */
  val labelPropCtes: String = {
    val per = (1 to lpRounds).map { i =>
      s"""l$i AS (
         |  SELECT node, label FROM (
         |    SELECT e.dst AS node, l.label,
         |      row_number() OVER (
         |        PARTITION BY e.dst
         |        ORDER BY SUM(e.w) DESC, l.label ASC) AS rk
         |    FROM edges e JOIN l${i - 1} l ON l.node = e.src
         |    GROUP BY e.dst, l.label) t
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |edges AS (
       |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
       |    CAST(COUNT(*) AS BIGINT) AS w
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
       |  GROUP BY 1, 2),
       |l0 AS (SELECT DISTINCT l_partkey AS node, l_partkey AS label
       |  FROM li),
       |$per""".stripMargin
  }

  val qLabelPropSql: String =
    s"""WITH $labelPropCtes
       |SELECT node AS p_partkey, label AS community
       |FROM l$lpRounds""".stripMargin
}
