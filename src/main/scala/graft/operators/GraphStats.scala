package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** WHOLE-GRAPH QUALITY READOUTS over the co-purchase graph — the two
  * numbers that tell you whether the graph suite's outputs MEAN
  * anything:
  *
  *  - [[qModularity]]: Newman-Girvan modularity of the [[LabelProp]]
  *    partition (Newman & Girvan 2004), per community — the standard
  *    "is this community structure better than chance?" score, and
  *    the acceptance test for any partitioning the pipeline ships
  *    (LPA's scaladoc claims "a few sweeps give most of the
  *    modularity"; this operator is how that claim gets a number).
  *  - [[qAssortativity]]: degree assortativity (Newman 2002) — the
  *    one-row graph fingerprint that separates hub-and-spoke retail
  *    graphs (disassortative, r < 0) from social-style graphs
  *    (assortative, r > 0), which is exactly the input the
  *    skew-handling decision ([[JoinAdvisor]], [[Salting]]) wants.
  *
  * DETERMINISM. Both ride the memoized integer edge table
  * ([[PageRank.coPurchaseEdgesMemo]]); community labels are
  * [[LabelProp]]'s deterministic argmax; every sum is exact
  * (DECIMAL(38,0)/HUGEINT for the Θ(mass²) moments); each final score
  * is ONE mirrored double expression over exact integers.
  *
  * SCALE. Modularity: two label joins over the edge table (label side
  * broadcasts under [[PageRank]]'s explicit |nodes| dial), one
  * partial-agg shuffle to the per-community table, a broadcast 1-row
  * total — Σ edges work, state bounded by |communities|.
  * Assortativity: one degree aggregation, two degree joins, one
  * 6-statistic partial agg to a single row — Σ edges work, constant
  * state. Neither adds a new corpus-sized shuffle beyond the edge
  * build every other graph query already shares. */
object GraphStats {

  /** Per-community modularity table from any (src, dst, w) edge list
    * and (p_partkey, community) labeling. */
  def modularity(edges: DataFrame, comm: DataFrame): DataFrame = {
    val cs = comm.select(col("p_partkey").as("src"),
      col("community").as("cs"))
    val cd = comm.select(col("p_partkey").as("dst"),
      col("community").as("cd"))
    val n = comm.count()
    val bcast = n <= 10000000L
    val labeled = edges
      .join(if (bcast) broadcast(cs) else cs, "src")
      .join(if (bcast) broadcast(cd) else cd, "dst")
    val per = labeled.groupBy(col("cs").as("community")).agg(
      sum(when(col("cs") === col("cd"), col("w")).otherwise(lit(0L))
        .cast(DecimalType(38, 0))).as("internal_w"),
      sum(col("w").cast(DecimalType(38, 0))).as("degree_w"))
    val nodes = comm.groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"))
    val tot = per.agg(sum(col("degree_w")).as("m2"))
    per.join(nodes, Seq("community"))
      .crossJoin(broadcast(tot))
      .selectExpr("community", "n_nodes",
        "cast(internal_w as bigint) as internal_w",
        "cast(degree_w as bigint) as degree_w",
        // q_c = win/m2 − (deg/m2)², one mirrored double expression
        """cast(round(1000000.0
          | * (cast(internal_w as double) / cast(m2 as double)
          |    - (cast(degree_w as double) / cast(m2 as double))
          |      * (cast(degree_w as double) / cast(m2 as double))))
          | as bigint) as q_contrib_micro"""
          .stripMargin.replace("\n", " "))
  }

  def qModularity(spark: SparkSession, dir: String): DataFrame =
    modularity(PageRank.coPurchaseEdgesMemo(spark, dir),
      LabelProp.labelPropMemo(spark, dir))

  val qModularitySql: String =
    s"""WITH ${LabelProp.labelPropCtes},
      |lbl AS (SELECT node, label FROM l${LabelProp.lpRounds}),
      |labeled AS (
      |  SELECT ls.label AS cs, ld.label AS cd, e.w
      |  FROM edges e
      |  JOIN lbl ls ON ls.node = e.src
      |  JOIN lbl ld ON ld.node = e.dst),
      |per AS (
      |  SELECT cs AS community,
      |    SUM(CASE WHEN cs = cd THEN w ELSE 0 END) AS internal_w,
      |    SUM(w) AS degree_w
      |  FROM labeled GROUP BY cs),
      |nodes AS (
      |  SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes
      |  FROM lbl GROUP BY label),
      |tot AS (SELECT SUM(degree_w) AS m2 FROM per)
      |SELECT p.community, n.n_nodes,
      |  CAST(p.internal_w AS BIGINT) AS internal_w,
      |  CAST(p.degree_w AS BIGINT) AS degree_w,
      |  CAST(ROUND(1000000.0
      |    * (CAST(p.internal_w AS DOUBLE) / CAST(t.m2 AS DOUBLE)
      |       - (CAST(p.degree_w AS DOUBLE) / CAST(t.m2 AS DOUBLE))
      |         * (CAST(p.degree_w AS DOUBLE) / CAST(t.m2 AS DOUBLE))))
      |    AS BIGINT) AS q_contrib_micro
      |FROM per p JOIN nodes n ON n.community = p.community
      |CROSS JOIN tot t""".stripMargin

  /** Degree assortativity over the directed-both-ways edge list with
    * UNWEIGHTED degrees (distinct-neighbor counts). */
  def assortativity(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val withDeg = edges
      .join(deg.select(col("src"), col("d").as("dx")), "src")
      .join(deg.select(col("src").as("dst"), col("d").as("dy")), "dst")
    withDeg.agg(
        count(lit(1)).as("m_edges"),
        sum(col("dx").cast(DecimalType(38, 0))).as("sx"),
        sum(col("dy").cast(DecimalType(38, 0))).as("sy"),
        sum(col("dx").cast(DecimalType(38, 0)) * col("dx")).as("sxx"),
        sum(col("dy").cast(DecimalType(38, 0)) * col("dy")).as("syy"),
        sum(col("dx").cast(DecimalType(38, 0)) * col("dy")).as("sxy"))
      .selectExpr("cast(m_edges as bigint) as m_edges",
        // r = (M·Σxy − Σx·Σy) / √((M·Σxx − Σx²)(M·Σyy − Σy²));
        // degenerate (regular graph: zero variance) → 0, surfaced by
        // the moments being present beside it
        """case when cast(m_edges as double) * cast(sxx as double)
          |       - cast(sx as double) * cast(sx as double) <= 0.0
          |     or cast(m_edges as double) * cast(syy as double)
          |       - cast(sy as double) * cast(sy as double) <= 0.0
          | then 0L else
          | cast(round(1000000.0
          |   * (cast(m_edges as double) * cast(sxy as double)
          |      - cast(sx as double) * cast(sy as double))
          |   / sqrt((cast(m_edges as double) * cast(sxx as double)
          |           - cast(sx as double) * cast(sx as double))
          |          * (cast(m_edges as double) * cast(syy as double)
          |             - cast(sy as double) * cast(sy as double))))
          |   as bigint) end as r_micro"""
          .stripMargin.replace("\n", " "))
  }

  def qAssortativity(spark: SparkSession, dir: String): DataFrame =
    assortativity(PageRank.coPurchaseEdgesMemo(spark, dir))

  val qAssortativitySql: String =
    """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
      |edges AS MATERIALIZED (
      |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
      |    CAST(COUNT(*) AS BIGINT) AS w
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      |  GROUP BY 1, 2),
      |deg AS MATERIALIZED (
      |  SELECT src, CAST(COUNT(*) AS BIGINT) AS d
      |  FROM edges GROUP BY src),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS m_edges,
      |    SUM(CAST(x.d AS HUGEINT)) AS sx,
      |    SUM(CAST(y.d AS HUGEINT)) AS sy,
      |    SUM(CAST(x.d AS HUGEINT) * x.d) AS sxx,
      |    SUM(CAST(y.d AS HUGEINT) * y.d) AS syy,
      |    SUM(CAST(x.d AS HUGEINT) * y.d) AS sxy
      |  FROM edges e
      |  JOIN deg x ON x.src = e.src
      |  JOIN deg y ON y.src = e.dst)
      |SELECT m_edges,
      |  CASE WHEN CAST(m_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0.0
      |     OR CAST(m_edges AS DOUBLE) * CAST(syy AS DOUBLE)
      |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0.0
      |  THEN 0 ELSE
      |  CAST(ROUND(1000000.0
      |    * (CAST(m_edges AS DOUBLE) * CAST(sxy AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / sqrt((CAST(m_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |           * (CAST(m_edges AS DOUBLE) * CAST(syy AS DOUBLE)
      |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
      |    AS BIGINT) END AS r_micro
      |FROM m""".stripMargin
}
