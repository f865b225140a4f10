package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** LINK PREDICTION over the co-purchase graph (Liben-Nowell &
  * Kleinberg 2007; Adamic & Adar 2003) — score non-adjacent node
  * pairs at distance 2 by their shared-neighbor structure and surface
  * the top candidates: the "you may also like" / candidate-edge
  * primitive recommendation and knowledge-graph-completion pipelines
  * run over exactly this projection. Three classic scores per pair
  * (u,v), all driven by the shared neighbors z:
  *
  *   CN  = Σ_z 1                (common neighbors)
  *   RA  = Σ_z 1/d(z)           (resource allocation, Zhou 2009)
  *   AA  = Σ_z 1/ln d(z)        (Adamic-Adar)
  *
  * SCALE SHAPE — sampled adjacency with Horvitz-Thompson scaling.
  * Enumerating all wedges is Σ_z d(z)²/2 — on this graph (median
  * degree ~115) that is 148M wedge rows at sf0.1 and quadratic in hub
  * degree at 100 TB, the blow-up the dedup family's docfreq caps
  * exist to prevent. Instead each center z contributes pairs only
  * among its s = min(d, [[lpSample]]) seeded-bottom-hash neighbors
  * (md5(z:n) order — deterministic, replayable, oracle-replicated),
  * bounding per-center work at C(S,2) ≈ 276 rows REGARDLESS of hub
  * size. Each surviving term is scaled by the inverse pair-inclusion
  * probability C(d,2)/C(s,2), making every score an unbiased
  * estimator of its exact value — and EXACTLY equal to it whenever
  * d ≤ S (the scale factor is 1), so small-degree structure is not
  * approximated at all. The per-term quantization is round-to-micro
  * of one double expression written identically in both engines (the
  * PMI/DSIR convention: one float op per term, integer sums after).
  *
  * Candidate pairs inherit the sampling (a pair is scored iff some
  * shared center sampled both sides), which is the industrial
  * trade-off: hub-only pairs — the ones AA's 1/ln weight already
  * discounts — are down-sampled, low-degree (informative) pairs are
  * kept exactly. Existing edges are removed with a left_anti against
  * the FULL edge set (never sampled), so no distance-1 pair leaks in.
  *
  * Output: top-[[lpTopK]] (u, v, cn_micro, ra_micro, aa_micro) by
  * Adamic-Adar, integer-deterministic ties broken by (u, v).
  *
  * The one corpus-scale shuffle is the adjacency repartition by z
  * (window + groupBy ride the same key); degree join is a |nodes|-row
  * broadcast-class side. Reference behavior: the engine's graph/
  * recommendation surface (settings.yaml:24-140 catalog queries). */
object LinkPredict {

  /** Per-center neighbor sample size S: wedge work ≤ C(S,2) per
    * center. 24 keeps sf0.1 at ~5M wedge rows and is exact for the
    * long tail (d ≤ 24). */
  val lpSample = 24

  val lpTopK = 20

  /** The seeded per-center hash order: md5(z:n) — the
    * WeightedSample/KMV convention, oracle-identical, and the SAME
    * order the streaming [[graft.streaming.LinkPredictStore]] ranks
    * its per-batch samples by (what makes its bottom-S state mergeable
    * into exactly this batch sample). */
  def neighborHash(z: Column, n: Column): Column =
    conv(substring(md5(concat_ws(":", z, n).cast("binary")), 1, 15),
      16, 10).cast("bigint")

  /** Core over any undirected edge set `und` (u < v, distinct). */
  def linkPredict(und: DataFrame, sample: Int = lpSample,
                  topK: Int = lpTopK): DataFrame = {
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val adj = und.select(col("u").as("z"), col("v").as("n"))
      .unionAll(und.select(col("v").as("z"), col("u").as("n")))
    // seeded bottom-S neighbor sample per center
    val ranked = adj
      .join(deg.withColumnRenamed("node", "z"), "z")
      .filter(col("d") >= 2)
      .withColumn("rk", row_number().over(Window.partitionBy("z")
        .orderBy(neighborHash(col("z"), col("n")), col("n"))))
    scoreSampledAdjacency(ranked.filter(col("rk") <= sample)
        .select("z", "n", "d"),
      und, sample, topK)
  }

  /** The scoring head over ANY bottom-S sampled adjacency — (z, n, d)
    * rows where each center carries at most `sample` neighbors in
    * md5(z:n) order and `d` is the center's FULL degree. The batch
    * path ranks the full adjacency to get here; the streaming store
    * serves its maintained sample directly. `und` is the full edge
    * set for the distance-2 left-anti (never sampled). */
  def scoreSampledAdjacency(sampledAdj: DataFrame, und: DataFrame,
                            sample: Int = lpSample,
                            topK: Int = lpTopK): DataFrame = {
    // one double expression per term, shape-identical in the oracle;
    // scale = C(d,2)/C(s,2) (≡ 1 when d ≤ S: exact, not estimated).
    // cn/ra terms are PURE IEEE arithmetic (mul/div of small exact
    // doubles — bit-identical in any engine); ln is libm-dependent, so
    // the AA term quantizes ln(d) ONCE on the small integer degree
    // domain (ln_micro, the q_lm_score micronat convention) and then
    // derives by exact integer division — never round(x/ln(d)), whose
    // half-boundary a 1-ulp libm difference can flip (observed: one
    // term in 40k differed cross-engine before this derivation).
    val sampled = sampledAdj.filter(col("d") >= 2)
      .withColumn("s", least(col("d"), lit(sample.toLong)))
      .withColumn("cn_term",
        expr("cast(round((d * (d - 1.0)) / (s * (s - 1.0)) " +
          "* 1000000.0) as bigint)"))
      .select(col("z"), col("n"), col("cn_term"),
        expr("cast(round((d * (d - 1.0)) / (s * (s - 1.0)) " +
          "* 1000000.0 / d) as bigint)").as("ra_term"),
        expr("(cn_term * 1000000L) div " +
          "cast(round(ln(d) * 1000000.0) as bigint)").as("aa_term"))
    val a = sampled.select(col("z"), col("n").as("u"),
      col("cn_term"), col("ra_term"), col("aa_term"))
    val b = sampled.select(col("z"), col("n").as("v"))
    val scored = a.join(b, "z").filter(col("u") < col("v"))
      .groupBy("u", "v")
      .agg(sum("cn_term").as("cn_micro"),
        sum("ra_term").as("ra_micro"),
        sum("aa_term").as("aa_micro"))
    scored
      .join(und, Seq("u", "v"), "left_anti") // distance-2 only
      .orderBy(col("aa_micro").desc, col("u").asc, col("v").asc)
      .limit(topK)
      .select(col("u"), col("v"), col("cn_micro"), col("ra_micro"),
        col("aa_micro"))
  }

  /** Driver query: candidate edges of the memoized co-purchase
    * graph — the sixth rider on [[PageRank.coPurchaseEdgesMemo]]'s
    * one lineitem self-join. */
  def qLinkPredict(spark: SparkSession, dir: String): DataFrame =
    linkPredict(PageRank.coPurchaseEdgesMemo(spark, dir)
      .filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v")))

  val qLinkPredictSql: String =
    s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
       |und AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |deg AS (
       |  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
       |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und) t
       |  GROUP BY node),
       |adj AS (
       |  SELECT u AS z, v AS n FROM und
       |  UNION ALL SELECT v AS z, u AS n FROM und),
       |ranked AS (
       |  SELECT z, n, d,
       |    ROW_NUMBER() OVER (PARTITION BY z ORDER BY
       |      CAST(CAST('0x' || substr(md5(CAST(z AS VARCHAR) || ':' ||
       |        CAST(n AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT), n) AS rk
       |  FROM adj JOIN deg ON adj.z = deg.node WHERE d >= 2),
       |sampled AS (
       |  SELECT z, n, cn_term,
       |    CAST(ROUND((d * (d - 1.0)) / (s * (s - 1.0))
       |      * 1000000.0 / d) AS BIGINT) AS ra_term,
       |    (cn_term * 1000000) //
       |      CAST(ROUND(LN(d) * 1000000.0) AS BIGINT) AS aa_term
       |  FROM (SELECT z, n, d, LEAST(d, $lpSample) AS s, rk,
       |          CAST(ROUND((d * (d - 1.0)) / (s * (s - 1.0))
       |            * 1000000.0) AS BIGINT) AS cn_term
       |        FROM (SELECT z, n, d, LEAST(d, $lpSample) AS s, rk
       |              FROM ranked) t0) t
       |  WHERE rk <= $lpSample),
       |wed AS (
       |  SELECT a.n AS u, b.n AS v, a.cn_term, a.ra_term, a.aa_term
       |  FROM sampled a JOIN sampled b ON a.z = b.z AND a.n < b.n),
       |sc AS (
       |  SELECT u, v, CAST(SUM(cn_term) AS BIGINT) AS cn_micro,
       |    CAST(SUM(ra_term) AS BIGINT) AS ra_micro,
       |    CAST(SUM(aa_term) AS BIGINT) AS aa_micro
       |  FROM wed GROUP BY u, v),
       |ne AS (
       |  SELECT sc.* FROM sc LEFT JOIN und
       |    ON sc.u = und.u AND sc.v = und.v
       |  WHERE und.u IS NULL)
       |SELECT u, v, cn_micro, ra_micro, aa_micro FROM ne
       |ORDER BY aa_micro DESC, u, v LIMIT $lpTopK""".stripMargin
}
