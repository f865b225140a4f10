package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** DIFFERENTIALLY-PRIVATE AGGREGATE RELEASE — the publication side of
  * the privacy family ([[Anonymity]] measures re-identification risk,
  * [[Anonymity.kGeneralize]] mitigates it for row-level release,
  * [[Forget]] erases; this releases AGGREGATES with a quantified
  * privacy budget, the Dwork et al. 2006 Laplace mechanism):
  *
  *   released = true + Laplace(sensitivity / ε)
  *
  * Two statistics per group, composed under sequential composition
  * (ε_total = ε_count + ε_sum, the ledger column an auditor checks
  * against the per-dataset budget):
  *   - COUNT, sensitivity 1 (one person changes one row);
  *   - SUM of the feature CLIPPED to [0, C] — clipping is what BOUNDS
  *     the sensitivity at C; without it a single outlier row would
  *     make the sum's sensitivity unbounded and the mechanism
  *     meaningless (the standard DP-SGD/LinDP preprocessing step).
  *
  * Noise is SEEDED, not sampled: u ∈ (0,1) comes from the md5 coin of
  * (salt, group key) — the repo's seeded-sampler convention — pushed
  * through the Laplace inverse CDF
  *
  *   noise = −b · sign(u − ½) · ln(1 − 2·|u − ½|),
  *
  * so a release is REPLAYABLE (two runs of the same release publish
  * identical numbers — re-sampling noise per run would leak by
  * averaging) and the oracle replays it bit-for-bit: coin extraction
  * is integer, and the one ln/sign/abs chain evaluates the identical
  * IEEE expression tree in both engines (the lm_score posture). A
  * production deployment rotates `salt` per release and keeps it
  * secret — the salt IS the noise seed; the mechanism and its ε
  * accounting are unchanged.
  *
  * Released values are NOT post-processed (a negative released count
  * stays negative): clamping is the consumer's choice and
  * post-processing never spends budget.
  *
  * Plan shape: one scan partial-aggs to the #groups-row true table
  * (map-side combine; clipping is a scalar expression inside the
  * partial agg), the 25-row nation dim broadcasts on, and the noise
  * columns are map-only scalar math over #groups rows. Nothing
  * corpus-sized shuffles; at 100 TB the cost is the one scan. */
object DpRelease {

  /** Per-statistic budgets (micro-ε) and their Laplace scales. */
  val epsCountMicro = 250000L
  val epsSumMicro = 250000L
  /** Clip ceiling for the balance sum, in cents: 10 000.00. */
  val clipCents = 1000000L
  private val bCount = 1e6 / epsCountMicro // sensitivity 1 / ε
  private val bSum = clipCents * 1e6 / epsSumMicro // sensitivity C / ε
  /** Release seed — rotate per release in production. */
  val salt = "graft-dp-r12"

  /** Seeded Laplace(scale) noise for a group key: md5-coin uniform
    * through the inverse CDF. `u` is offset by ½ ulp of the 32-bit
    * lattice so 1 − 2·|u − ½| never hits 0 (ln's pole). */
  private def lapNoise(key: Column, tag: String, scale: Double): Column = {
    val u = (conv(substring(
        md5(concat(lit(salt + ":" + tag + ":"), key).cast("binary")),
        1, 8), 16, 10).cast("double") + 0.5) / 4294967296.0
    val c = u - 0.5
    -lit(scale) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
  }

  /** DP release over (k, cents) rows with a `name` dim attached by
    * the caller; one row per group. */
  def dpRelease(rows: DataFrame, dims: DataFrame): DataFrame = {
    val trueAgg = rows.groupBy("k").agg(
      count(lit(1)).as("n_true"),
      sum(least(greatest(col("cents"), lit(0L)), lit(clipCents)))
        .as("sum_true_cents"))
    val key = col("k").cast("string")
    trueAgg.join(broadcast(dims), Seq("k"))
      .withColumn("n_released",
        col("n_true") +
          round(lapNoise(key, "count", bCount)).cast(LongType))
      .withColumn("sum_released_cents",
        col("sum_true_cents") +
          round(lapNoise(key, "sum", bSum)).cast(LongType))
      .withColumn("eps_total_micro", lit(epsCountMicro + epsSumMicro))
      .select("k", "name", "n_true", "n_released", "sum_true_cents",
        "sum_released_cents", "eps_total_micro")
  }

  /** Driver query: per-nation customer count + clipped account-balance
    * sum, released under ε = 0.5 total. */
  def qDpCounts(spark: SparkSession, dir: String): DataFrame =
    dpRelease(
      Tables(spark, dir, "customer").select(
        col("c_nationkey").cast(LongType).as("k"),
        round(col("c_acctbal") * 100).cast(LongType).as("cents")),
      Tables(spark, dir, "nation").select(
        col("n_nationkey").cast(LongType).as("k"),
        col("n_name").as("name")))

  val qDpCountsSql: String = {
    def noise(tag: String, scale: String): String =
      s"""-($scale) * sign(u_$tag - 0.5)
         |      * ln(1.0 - 2.0 * abs(u_$tag - 0.5))""".stripMargin
    s"""WITH agg AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS k,
      |    CAST(COUNT(*) AS BIGINT) AS n_true,
      |    CAST(SUM(LEAST(GREATEST(CAST(round(c_acctbal * 100) AS BIGINT),
      |      0), $clipCents)) AS BIGINT) AS sum_true_cents
      |  FROM customer GROUP BY 1),
      |coined AS (
      |  SELECT a.*, n.n_name AS name,
      |    (CAST(('0x' || substr(md5('$salt:count:'
      |        || CAST(k AS VARCHAR)), 1, 8)) AS UBIGINT) + 0.5)
      |      / 4294967296.0 AS u_count,
      |    (CAST(('0x' || substr(md5('$salt:sum:'
      |        || CAST(k AS VARCHAR)), 1, 8)) AS UBIGINT) + 0.5)
      |      / 4294967296.0 AS u_sum
      |  FROM agg a JOIN nation n ON a.k = n.n_nationkey)
      |SELECT k, name, n_true,
      |  n_true + CAST(round(${noise("count", bCount.toString)})
      |    AS BIGINT) AS n_released,
      |  sum_true_cents,
      |  sum_true_cents + CAST(round(${noise("sum", bSum.toString)})
      |    AS BIGINT) AS sum_released_cents,
      |  CAST(${epsCountMicro + epsSumMicro} AS BIGINT) AS eps_total_micro
      |FROM coined""".stripMargin
  }
}
