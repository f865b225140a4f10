package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Triangle counting + global clustering coefficient over the
  * co-purchase graph (the same graph [[PageRank]] ranks) — the second
  * classic whole-graph analytic, expressed Spark-first as three
  * equi-joins with a DEGREE-ORDERED ORIENTATION so the join fan-out is
  * bounded the way the literature demands.
  *
  * Naive triangle enumeration joins the edge list with itself on a
  * shared endpoint: the wedge count is Σ d(v)², which one celebrity hub
  * (a part in every order) turns quadratic. The standard fix (Cohen's
  * MapReduce triangle counting; Schank–Wagner's forward algorithm)
  * orients every undirected edge from its (degree, id)-SMALLER endpoint
  * to its larger one: out-degree is then bounded by O(√m) for ANY
  * degree distribution, each triangle has exactly ONE node with two
  * outgoing triangle edges (the degree-smallest corner), and the wedge
  * join generates Σ dout(v)² = O(m^1.5) candidates total — the
  * worst-case-optimal bound, hub-proof by construction.
  *
  * Plan shape: (1) the co-purchase pair build is the market-basket
  * self-join on l_orderkey (co-partitioned, one shuffle, output bounded
  * by Σ basket² — [[PageRank.coPurchaseEdges]]'s precedent); (2) degrees
  * are one partial-agg pass over the deduped edge list; (3) the wedge
  * self-join keys on the oriented source — a plain shuffle hash join;
  * (4) the closing-edge join keys on the candidate (v, w) pair against
  * the oriented edge list. Nothing broadcasts the corpus, nothing
  * collects rows; the two checkpoints pin the edge list (scanned 3×)
  * and the oriented list (scanned 3×) exactly once. All-integer output,
  * so the oracle replays it bit-for-bit.
  *
  * Orientation ties are broken by node id — (deg, id) is a TOTAL order,
  * compared lexicographically (no packed key, so no numeric-range
  * precondition on ids or degrees at any scale).
  */
object Triangles {

  /** Distinct undirected co-purchase edges (u < v), one row per pair. */
  def undirectedEdges(li: DataFrame): DataFrame = {
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("u"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("v"))
    a.join(b, "ok").filter(col("u") < col("v"))
      .select("u", "v").distinct()
  }

  /** One row: |V|, |E|, wedge count Σ d(d−1)/2, triangle count, and the
    * global clustering coefficient 3·T/W in exact integer permille. */
  def triangleStats(li: DataFrame,
                    undIn: Option[DataFrame] = None): DataFrame =
    triangleStatsFrom(undIn.getOrElse {
      val (u, _) = graft.util.Checkpoints.checkpointTracked(
        undirectedEdges(li))
      u
    })

  /** The counting core over a prepared distinct (u < v) edge table —
    * shared by the batch operator and
    * [[graft.streaming.GraphStore]]'s live readout. */
  def triangleStatsFrom(und: DataFrame): DataFrame = {
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
    // orient from (deg, id)-smaller to larger; keep the head's key so
    // the wedge join can order its two heads without re-joining degrees
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val (oriented, _) = graft.util.Checkpoints.checkpointTracked(
      withDeg.select(
        when(lowFirst, col("u")).otherwise(col("v")).as("src"),
        when(lowFirst, col("v")).otherwise(col("u")).as("dst"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("dd")))
    // wedges at the degree-smallest corner: two out-edges of one src,
    // heads ordered by the same (deg, id) total order — the closing
    // edge, if present, is oriented exactly v → w
    val o1 = oriented.select(col("src"), col("dst").as("v"), col("dd").as("d1"))
    val o2 = oriented.select(col("src"), col("dst").as("w"), col("dd").as("d2"))
    val tri = o1.join(o2, "src")
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("v") < col("w")))
      .join(oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"))
      .agg(count(lit(1)).as("n_triangles"))
    deg.agg(count(lit(1)).as("n_nodes"),
        expr("sum(d * (d - 1) div 2)").as("n_wedges"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("3000 * n_triangles div n_wedges").as("clustering_permille"))
  }

  def qTriangles(spark: SparkSession, dir: String): DataFrame =
    // the (u < v) half of the memoized weighted edge table IS the
    // distinct undirected pair set — the memo's blocks back all three
    // scans, so no second checkpoint is taken
    triangleStats(Tables(spark, dir, "lineitem"),
      undIn = Some(PageRank.coPurchaseEdgesMemo(spark, dir)
        .filter(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))))

  val qTrianglesSql: String =
    """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
      |und AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |deg AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
      |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und) t
      |  GROUP BY node),
      |oriented AS (
      |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v)
      |           THEN und.u ELSE und.v END AS src,
      |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v)
      |           THEN und.v ELSE und.u END AS dst,
      |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v)
      |           THEN dv.d ELSE du.d END AS dd
      |  FROM und
      |  JOIN deg du ON du.node = und.u
      |  JOIN deg dv ON dv.node = und.v),
      |tri AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS t
      |  FROM oriented o1
      |  JOIN oriented o2 ON o1.src = o2.src
      |    AND (o1.dd < o2.dd OR (o1.dd = o2.dd AND o1.dst < o2.dst))
      |  JOIN oriented o3 ON o3.src = o1.dst AND o3.dst = o2.dst),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |    CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
      |  FROM deg)
      |SELECT agg.n_nodes,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
      |  agg.n_wedges, tri.t AS n_triangles,
      |  CAST(3000 * tri.t // agg.n_wedges AS BIGINT) AS clustering_permille
      |FROM agg, tri""".stripMargin
}
