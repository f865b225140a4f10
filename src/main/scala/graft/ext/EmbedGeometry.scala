package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** EMBEDDING-GEOMETRY DIAGNOSTICS (Ethayarajh 2019's anisotropy;
  * the participation ratio of statistical physics) — the two health
  * numbers for an embedding space the ANN family consumes:
  *
  *  - ANISOTROPY: ‖μ‖² of the mean vector. For unit-norm embeddings
  *    the expected cosine of two random vectors EQUALS ‖μ‖², so a
  *    large value means every similarity score is inflated by a
  *    common bias direction — exactly what [[EmbedAlgebra]]'s ABTT
  *    removes; this readout says whether it NEEDS to run.
  *  - EFFECTIVE DIMENSIONALITY: the participation ratio
  *    PR = (Σ_j v_j)² / Σ_j v_j² over per-dimension variances — how
  *    many of the 64 axes actually carry signal. PR ≪ dims says the
  *    index (IVF/PQ cells) is paying for dimensions that hold
  *    nothing.
  *
  * DETERMINISM. Components micro-quantize to integers at the scan
  * ([[EmbedDrift]] convention); per-dimension Σq and Σq² are exact
  * integers in DECIMAL(38,0)/HUGEINT; per-dimension μ² and variance
  * terms are micro-quantized PER DIMENSION (integer sums over the
  * 64-row table — order-portable); PR is one double ratio of exact
  * integers. The top-variance dimension breaks ties on the smallest
  * index via a checkpointed dims table.
  *
  * SCALE. One posexplode scan → |dims| bounded integer rows →
  * 1-row readout. */
object EmbedGeometry {

  private val micro = 1e6

  def embedGeometry(emb: DataFrame): DataFrame = {
    def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    val n = emb.count()
    val (dims, _) = graft.util.Checkpoints.checkpointTracked(
      emb.select(posexplode(col("embedding")).as(Seq("j", "x")))
        .withColumn("q", round(col("x").cast("double") * micro)
          .cast("long"))
        .groupBy("j")
        .agg(sum(col("q")).as("s"), sum(d38(col("q")) * col("q")).as("qq"))
        .selectExpr("j",
          // per-dim μ² and variance in micro units (q is x·1e6, so
          // s/n/1e6 is the mean and the 1e12 rescales cancel)
          s"""cast(round(1000000.0
             | * (cast(s as double) / $n / 1000000.0)
             | * (cast(s as double) / $n / 1000000.0)) as bigint)
             | as mu2_micro""".stripMargin.replace("\n", " "),
          s"""cast(round(1000000.0 * (cast(qq as double) / $n
             | - (cast(s as double) / $n) * (cast(s as double) / $n))
             | / 1e12) as bigint) as v_micro"""
            .stripMargin.replace("\n", " ")))
    val agg = dims.agg(
      count(lit(1)).as("dims"),
      sum(col("mu2_micro")).as("mu_norm2_micro"),
      sum(col("v_micro")).as("vsum"),
      sum(d38(col("v_micro")) * col("v_micro")).as("v2sum"),
      max(col("v_micro")).as("v_max"))
    val top = dims.crossJoin(broadcast(agg.select("v_max")))
      .filter(col("v_micro") === col("v_max"))
      .agg(min(col("j")).as("top_var_dim"))
    agg.crossJoin(broadcast(top))
      .selectExpr(s"$n as n_vecs", "dims", "mu_norm2_micro",
        """case when dims = 0 then 0 else
          |cast(round(cast(vsum as double) / dims) as bigint) end
          |as mean_var_micro""".stripMargin.replace("\n", " "),
        """case when v2sum = 0 then 0 else
          |cast(round(1000000.0 * cast(vsum as double)
          |  * cast(vsum as double) / cast(v2sum as double)) as bigint)
          |end as eff_dim_micro""".stripMargin.replace("\n", " "),
        "top_var_dim",
        "mu_norm2_micro > 50000 as anisotropic")
  }

  def qEmbedGeometry(spark: SparkSession, dir: String): DataFrame =
    embedGeometry(Tables(spark, dir, "embeddings"))

  val qEmbedGeometrySql: String =
    s"""WITH q AS (
       |  SELECT j, CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
       |    AS q
       |  FROM (SELECT UNNEST(embedding) AS x,
       |          UNNEST(generate_series(0, len(embedding) - 1)) AS j
       |        FROM embeddings)),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
       |dims AS MATERIALIZED (
       |  SELECT j,
       |    CAST(ROUND(1000000.0
       |      * (CAST(SUM(q) AS DOUBLE) / (SELECT n FROM nn) / 1000000.0)
       |      * (CAST(SUM(q) AS DOUBLE) / (SELECT n FROM nn) / 1000000.0))
       |      AS BIGINT) AS mu2_micro,
       |    CAST(ROUND(1000000.0
       |      * (CAST(SUM(CAST(q AS HUGEINT) * q) AS DOUBLE)
       |           / (SELECT n FROM nn)
       |         - (CAST(SUM(q) AS DOUBLE) / (SELECT n FROM nn))
       |           * (CAST(SUM(q) AS DOUBLE) / (SELECT n FROM nn)))
       |      / 1e12) AS BIGINT) AS v_micro
       |  FROM q GROUP BY j),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS dims,
       |    CAST(SUM(mu2_micro) AS BIGINT) AS mu_norm2_micro,
       |    CAST(SUM(v_micro) AS BIGINT) AS vsum,
       |    SUM(CAST(v_micro AS HUGEINT) * v_micro) AS v2sum,
       |    MAX(v_micro) AS v_max
       |  FROM dims),
       |top AS (
       |  SELECT MIN(j) AS top_var_dim FROM dims, agg
       |  WHERE v_micro = v_max)
       |SELECT (SELECT n FROM nn) AS n_vecs, dims, mu_norm2_micro,
       |  CASE WHEN dims = 0 THEN 0 ELSE
       |    CAST(ROUND(CAST(vsum AS DOUBLE) / dims) AS BIGINT) END
       |    AS mean_var_micro,
       |  CASE WHEN v2sum = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(vsum AS DOUBLE)
       |      * CAST(vsum AS DOUBLE) / CAST(v2sum AS DOUBLE)) AS BIGINT)
       |    END AS eff_dim_micro,
       |  top_var_dim,
       |  mu_norm2_micro > 50000 AS anisotropic
       |FROM agg, top""".stripMargin
}
