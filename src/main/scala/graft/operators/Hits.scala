package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** INTEGER-EXACT HITS (Kleinberg 1999, "Authoritative sources in a
  * hyperlinked environment") — the hubs-and-authorities companion to
  * [[PageRank]]: authorities are nodes good edges point TO, hubs are
  * nodes that point AT good authorities, the mutually-recursive pair
  * a = Eᵀh, h = Ea normalized each half-step. Directed structure
  * comes from orienting the shared co-purchase graph low→high key
  * (src < dst) — the same orientation [[Triangles]] counts under, so
  * hubs (low keys that co-occur widely) and authorities (high keys
  * widely co-occurred with) are genuinely different readouts.
  *
  * DETERMINISM. The classic L2 normalization is float; this engine
  * normalizes each half-step to total mass 10¹² by integer division
  * (score·mass div Σ) — the same fixed-point convention as
  * [[PageRank.prMass]], so the DuckDB oracle replays every half-step
  * bit-for-bit (3 rounds unrolled). Raw sums are Θ(mass·Σw) —
  * DECIMAL(38,0)/HUGEINT holds the product score·mass before the
  * collapsing division.
  *
  * SCALE SHAPE per half-step: one join keying the oriented edge table
  * by the live score side + one partial-agg regroup — Σ edges work, 6
  * half-steps total; the edge table is built once
  * ([[PageRank.coPurchaseEdgesMemo]]) and the score table never
  * exceeds |nodes|. The 1-row normalizer is a broadcast crossJoin. */
object Hits {

  val hitsIters = 3
  val hitsMass: Long = PageRank.prMass // 10¹²

  /** Oriented co-purchase edges: keep the src < dst direction of the
    * symmetric co-purchase table. */
  def orientedEdges(edges: DataFrame): DataFrame =
    edges.filter(col("src") < col("dst"))

  def hits(li: DataFrame, edgesIn: Option[DataFrame] = None,
           iters: Int = hitsIters): DataFrame =
    hitsFrom(li.select(col("l_partkey").as("node")).distinct(),
      edgesIn.getOrElse(PageRank.coPurchaseEdges(li)), iters)

  /** The iteration core over a prepared graph (symmetric weighted
    * edges; orientation applied here) — shared by the batch operator
    * and [[graft.streaming.GraphStore]]'s live readout. */
  def hitsFrom(nodes: DataFrame, rawEdges: DataFrame,
               iters: Int = hitsIters): DataFrame = {
    val (edges, _) = graft.util.Checkpoints.checkpointTracked(
      orientedEdges(rawEdges))
    val n = nodes.count()
    def normalized(raw: DataFrame, outCol: String): DataFrame = {
      // raw: (node, raw) over edge endpoints only; re-anchor to the
      // full node set and rescale to total mass by exact division
      val tot = raw.agg(sum("raw").as("t"))
      nodes.join(raw, Seq("node"), "left").crossJoin(broadcast(tot))
        .select(col("node"),
          coalesce(
            expr(s"cast((cast(raw as decimal(38,0)) * ${hitsMass}L) div t" +
              " as bigint)"),
            lit(0L)).as(outCol))
    }
    var h = nodes.withColumn("h", lit(hitsMass / n))
    var a: DataFrame = null
    var release: () => Unit = () => ()
    for (i <- 1 to iters) {
      val aRaw = edges
        .join(h.select(col("node").as("src"), col("h")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("h") * col("w")).as("raw"))
      a = normalized(aRaw, "a")
      val (aCk, relA) = graft.util.Checkpoints.checkpointTracked(a)
      a = aCk
      val hRaw = edges
        .join(a.select(col("node").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum(col("a") * col("w")).as("raw"))
      val next = normalized(hRaw, "h")
      if (i < iters) {
        val (ck, rel) = graft.util.Checkpoints.checkpointTracked(next)
        release(); release = () => { rel(); relA() }
        h = ck
      } else h = next
    }
    h.join(a, Seq("node"))
      .select(col("node").as("p_partkey"), col("h").as("hub"),
        col("a").as("auth"))
  }

  def qHits(spark: SparkSession, dir: String): DataFrame =
    hits(Tables(spark, dir, "lineitem"),
      edgesIn = Some(PageRank.coPurchaseEdgesMemo(spark, dir)))

  /** Full-replay oracle: graph build + every normalized half-step,
    * 2·[[hitsIters]] CTE blocks. */
  val qHitsSql: String = {
    val sb = new StringBuilder
    for (i <- 1 to hitsIters) {
      sb.append(
        s"""a${i}_raw AS MATERIALIZED (
           |  SELECT e.dst AS node,
           |    CAST(SUM(p.h * e.w) AS BIGINT) AS raw
           |  FROM edges e JOIN h${i - 1} p ON p.node = e.src
           |  GROUP BY 1),
           |a${i}_tot AS (SELECT SUM(raw) AS t FROM a${i}_raw),
           |a$i AS MATERIALIZED (
           |  SELECT n.node,
           |    COALESCE(CAST((CAST(r.raw AS HUGEINT) * $hitsMass)
           |      // tt.t AS BIGINT), 0) AS a
           |  FROM nodes n
           |  LEFT JOIN a${i}_raw r ON r.node = n.node
           |  CROSS JOIN a${i}_tot tt),
           |h${i}_raw AS MATERIALIZED (
           |  SELECT e.src AS node,
           |    CAST(SUM(p.a * e.w) AS BIGINT) AS raw
           |  FROM edges e JOIN a$i p ON p.node = e.dst
           |  GROUP BY 1),
           |h${i}_tot AS (SELECT SUM(raw) AS t FROM h${i}_raw),
           |h$i AS MATERIALIZED (
           |  SELECT n.node,
           |    COALESCE(CAST((CAST(r.raw AS HUGEINT) * $hitsMass)
           |      // tt.t AS BIGINT), 0) AS h
           |  FROM nodes n
           |  LEFT JOIN h${i}_raw r ON r.node = n.node
           |  CROSS JOIN h${i}_tot tt),
           |""".stripMargin)
    }
    s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |edges AS MATERIALIZED (
       |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
       |    CAST(COUNT(*) AS BIGINT) AS w
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2),
       |nodes AS MATERIALIZED (SELECT DISTINCT l_partkey AS node FROM li),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |h0 AS MATERIALIZED (SELECT node, $hitsMass // (SELECT n FROM nn) AS h
       |  FROM nodes),
       |${sb.toString.stripSuffix(",\n").stripSuffix(",")}
       |SELECT h.node AS p_partkey, h.h AS hub, a.a AS auth
       |FROM h$hitsIters h JOIN a$hitsIters a ON a.node = h.node"""
      .stripMargin
  }
}
