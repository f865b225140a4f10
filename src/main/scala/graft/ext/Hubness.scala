package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** HUBNESS DIAGNOSTIC (Radovanović et al. 2010) — the
  * high-dimensional pathology audit for the ANN family: in high
  * dimension a few vectors ("hubs") appear in an outsized share of
  * everyone's k-nearest-neighbor lists, silently degrading kNN
  * classification ([[Similarity.qKnnProbe]]) and graph-based indexes.
  * Measure it as the SKEWNESS of the k-occurrence distribution N_k
  * (how often each vector shows up in a probe's top-k): S > ~1 means
  * hub-dominated, near 0 means benign geometry.
  *
  * DETERMINISM. The probe set is the [[KnnShapley]] fixed-budget
  * residue class; top-k ranks break ties on vec_id; N_k and its
  * first three power sums are exact integers (zeros included via the
  * corpus count, never materialized); skewness is one
  * fully-double-cast expression over five exact integers.
  *
  * SCALE. Probe side broadcasts (fixed budget); the probe×corpus
  * scoring leg is |corpus|·|probes| with per-probe windows (the
  * [[KnnShapley]] plan, asserted non-global there); the occurrence
  * table is ≤ 10·|probes| rows. Output: 1 row. */
object Hubness {

  val hubK = 10

  /** 1-row readout: (n_vectors, n_probes, k, occ_sum, occ_max,
    * hub_id, mean_occ_micro, skew_micro, hub_dominated). `mod`
    * follows the [[KnnShapley.knnShapley]] budget convention. */
  def hubness(emb: DataFrame, mod: Long = KnnShapley.probeMod): DataFrame = {
    val probes = emb
      .filter(col("vec_id") % mod === KnnShapley.probeRes % mod)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_vec"))
    val topk = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("p_id"))
      .select(col("p_id"), col("vec_id"),
        Similarity.dot(col("embedding"), col("p_vec")).as("cosine"))
      .withColumn("j", row_number().over(Window.partitionBy("p_id")
        .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("j") <= hubK)
    val (occ, _) = graft.util.Checkpoints.checkpointTracked(
      topk.groupBy("vec_id").agg(count(lit(1)).as("o")))
    val tot = emb.agg(count(lit(1)).as("n_vectors"))
    val np = probes.agg(count(lit(1)).as("n_probes"))
    val moments = occ.agg(
      sum(col("o")).as("occ_sum"),
      sum(col("o") * col("o")).as("occ2"),
      sum(col("o") * col("o") * col("o")).as("occ3"),
      max(col("o")).as("occ_max"))
    // deterministic hub: smallest vec_id among the max-occurrence set
    // (the ≤10·|probes|-row occ table is checkpointed — one scoring
    // pass feeds both legs)
    val hub = occ.crossJoin(broadcast(moments))
      .filter(col("o") === col("occ_max"))
      .agg(min(col("vec_id")).as("hub_id"))
    moments.crossJoin(broadcast(hub))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(np))
      .selectExpr("n_vectors", "n_probes", s"$hubK as k",
        "occ_sum", "occ_max", "hub_id",
        """cast(round(1000000.0 * cast(occ_sum as double)
          | / cast(n_vectors as double)) as bigint) as mean_occ_micro"""
          .stripMargin.replace("\n", " "),
        s"$skewExpr as skew_micro")
      .withColumn("hub_dominated", col("skew_micro") > 1000000L)
  }

  /** Shared skewness text over (occ_sum, occ2, occ3, n_vectors) —
    * zeros enter through n: m = Σo/n, var = Σo²/n − m²,
    * skew = (Σo³/n − 3m·Σo²/n + 2m³) / var^1.5. */
  private def skewExpr: String =
    """case when n_vectors = 0 or
      | (cast(occ2 as double) / n_vectors
      |  - (cast(occ_sum as double) / n_vectors)
      |    * (cast(occ_sum as double) / n_vectors)) <= 0.0 then 0 else
      |cast(round(1000000.0
      |  * (cast(occ3 as double) / n_vectors
      |     - 3.0 * (cast(occ_sum as double) / n_vectors)
      |       * (cast(occ2 as double) / n_vectors)
      |     + 2.0 * (cast(occ_sum as double) / n_vectors)
      |       * (cast(occ_sum as double) / n_vectors)
      |       * (cast(occ_sum as double) / n_vectors))
      |  / pow(cast(occ2 as double) / n_vectors
      |      - (cast(occ_sum as double) / n_vectors)
      |        * (cast(occ_sum as double) / n_vectors), 1.5))
      |  as bigint) end""".stripMargin.replace("\n", " ")

  def qHubness(spark: SparkSession, dir: String): DataFrame =
    hubness(Tables(spark, dir, "embeddings"))

  val qHubnessSql: String =
    s"""WITH probes AS MATERIALIZED (
       |  SELECT vec_id AS p_id, embedding AS p_vec
       |  FROM embeddings
       |  WHERE vec_id % ${KnnShapley.probeMod} = ${KnnShapley.probeRes}),
       |scored AS (
       |  SELECT p.p_id, e.vec_id,
       |    list_sum(list_transform(list_zip(e.embedding, p.p_vec),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |      AS cosine
       |  FROM embeddings e CROSS JOIN probes p
       |  WHERE e.vec_id <> p.p_id),
       |ranked AS (
       |  SELECT p_id, vec_id,
       |    row_number() OVER (PARTITION BY p_id
       |      ORDER BY cosine DESC, vec_id ASC) AS j
       |  FROM scored),
       |occ AS MATERIALIZED (
       |  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS o
       |  FROM ranked WHERE j <= $hubK GROUP BY vec_id),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors
       |  FROM embeddings),
       |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes FROM probes),
       |agg AS (
       |  SELECT CAST(SUM(o) AS BIGINT) AS occ_sum,
       |    CAST(SUM(o * o) AS BIGINT) AS occ2,
       |    CAST(SUM(o * o * o) AS BIGINT) AS occ3,
       |    MAX(o) AS occ_max
       |  FROM occ),
       |hub AS (
       |  SELECT MIN(vec_id) AS hub_id FROM occ, agg WHERE o = occ_max)
       |SELECT n_vectors, n_probes, $hubK AS k, occ_sum, occ_max,
       |  CAST(hub_id AS BIGINT) AS hub_id,
       |  CAST(ROUND(1000000.0 * CAST(occ_sum AS DOUBLE)
       |    / CAST(n_vectors AS DOUBLE)) AS BIGINT) AS mean_occ_micro,
       |  $skewExpr AS skew_micro,
       |  $skewExpr > 1000000 AS hub_dominated
       |FROM agg, hub, tot, np""".stripMargin
}
