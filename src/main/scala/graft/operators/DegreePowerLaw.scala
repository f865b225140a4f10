package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** POWER-LAW DEGREE FIT (Clauset, Shalizi & Newman 2009) — the
  * "is this graph scale-free" readout next to the graph-quality
  * family (assortativity, triangles, k-core): fit the tail exponent
  * of the degree distribution by the continuous MLE
  *
  *   α̂ = 1 + n / Σ_i ln(d_i / (d_min − 1/2)),
  *
  * the estimator every network paper reports (and the prerequisite
  * for deciding whether hub-capped algorithms like the bottom-S
  * wedge sample are load-bearing — they are iff α ≲ 3).
  *
  * DETERMINISM. Degrees are exact integers off the memoized
  * co-purchase edge table; d_min is an exact MIN; each log term is
  * micronat-quantized per node ([[KaplanMeier]] convention) so the
  * denominator is an INTEGER sum; α̂ is one division of exact
  * integers. The readout also carries the exact degree extremes and
  * the α ≤ 3 heavy-tail verdict on the rounded micro value.
  *
  * SCALE. Degree table = one partial agg over the edge build shared
  * by six graph queries (memoized per session+dir); everything after
  * is |nodes|-sized sums → 1 row. */
object DegreePowerLaw {

  def degreePowerLaw(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val dmin = deg.agg(min("d").as("d_min"))
    deg.crossJoin(broadcast(dmin))
      .select(col("d"), col("d_min"),
        expr("""cast(round(1000000.0 * ln(cast(d as double)
               | / (cast(d_min as double) - 0.5))) as bigint)"""
          .stripMargin.replace("\n", " ")).as("term"))
      .groupBy("d_min")
      .agg(count(lit(1)).as("n_nodes"), max(col("d")).as("d_max"),
        sum(col("term")).as("logsum_micro"))
      .selectExpr("n_nodes", "d_min", "d_max", "logsum_micro",
        """case when logsum_micro <= 0 then 0L else
          |cast(round(1000000.0 * (1.0 + cast(n_nodes as double)
          |  * 1000000.0 / logsum_micro)) as bigint) end
          |as alpha_micro""".stripMargin.replace("\n", " "))
      .withColumn("heavy_tail",
        col("alpha_micro") > 0L && col("alpha_micro") <= 3000000L)
  }

  def qDegreePowerlaw(spark: SparkSession, dir: String): DataFrame =
    degreePowerLaw(PageRank.coPurchaseEdgesMemo(spark, dir))

  val qDegreePowerlawSql: String =
    """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
      |edges AS (
      |  SELECT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      |  GROUP BY 1, 2),
      |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
      |  FROM edges GROUP BY 1),
      |dmin AS (SELECT MIN(d) AS d_min FROM deg),
      |terms AS (
      |  SELECT d, d_min,
      |    CAST(ROUND(1000000.0 * ln(CAST(d AS DOUBLE)
      |      / (CAST(d_min AS DOUBLE) - 0.5))) AS BIGINT) AS term
      |  FROM deg, dmin),
      |agg AS (
      |  SELECT d_min, CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |    MAX(d) AS d_max, CAST(SUM(term) AS BIGINT) AS logsum_micro
      |  FROM terms GROUP BY d_min)
      |SELECT n_nodes, d_min, d_max, logsum_micro,
      |  CASE WHEN logsum_micro <= 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * (1.0 + CAST(n_nodes AS DOUBLE)
      |      * 1000000.0 / logsum_micro)) AS BIGINT) END AS alpha_micro,
      |  (CASE WHEN logsum_micro <= 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * (1.0 + CAST(n_nodes AS DOUBLE)
      |      * 1000000.0 / logsum_micro)) AS BIGINT) END) > 0
      |    AND (CASE WHEN logsum_micro <= 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * (1.0 + CAST(n_nodes AS DOUBLE)
      |      * 1000000.0 / logsum_micro)) AS BIGINT) END) <= 3000000
      |    AS heavy_tail
      |FROM agg""".stripMargin
}
