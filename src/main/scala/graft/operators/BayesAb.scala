package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** BAYESIAN A/B READOUT (Beta-Binomial conjugacy — Gelman et al.,
  * Bayesian Data Analysis ch. 2; the "probability treatment is
  * better" framing product teams actually consume): under uniform
  * Beta(1,1) priors, each arm's conversion rate has an EXACT
  * Beta(1+s, 1+n−s) posterior; the readout reports both posterior
  * means, the expected lift, and the posterior-difference z
  *
  *   z = (m_t − m_c) / sqrt(v_t + v_c)
  *
  * with m, v the closed-form Beta moments. P(p_t > p_c) itself is
  * deliberately NOT emitted as a percentage: the exact tail needs an
  * incomplete-beta (or erf under the normal approximation), whose
  * libm rounding is engine-dependent — the [[SrmMde]] posture — so
  * the decision surfaces as the z statistic plus a one-sided-95%
  * verdict against the micro-quantized z₀.₀₅ fence (z carries the
  * same information as the probability, monotonically).
  *
  * DETERMINISM. s/n are exact integer conversion counts off the
  * shared [[AbTest.perUserArm]] scan; the posterior moments are
  * single-expression doubles over those integers with the SQL text
  * shared verbatim between engines ([[TimeSeriesPair]] convention).
  *
  * SCALE. One scan → per-user agg → ONE 1-row integer aggregate (the
  * [[AbTest]] shape); serves live from
  * [[graft.streaming.ExperimentStore.bayesView]] — zero new state. */
object BayesAb {

  /** z₀.₀₅ one-sided (1.6448536…), micro-quantized. */
  val zOneSided95Micro = 1644854L

  def bayesAb(events: DataFrame): DataFrame =
    bayesFromPerUser(AbTest.perUserArm(events))

  private def meanTExpr: String =
    "cast(round(1000000.0 * (1.0 + cast(s_t as double))" +
      " / (2.0 + cast(n_t as double))) as bigint)"
  private def meanCExpr: String =
    "cast(round(1000000.0 * (1.0 + cast(s_c as double))" +
      " / (2.0 + cast(n_c as double))) as bigint)"
  private def liftExpr: String =
    """cast(round(1000000.0
      |  * ((1.0 + cast(s_t as double)) / (2.0 + cast(n_t as double))
      |     - (1.0 + cast(s_c as double)) / (2.0 + cast(n_c as double))))
      |  as bigint)""".stripMargin.replace("\n", " ")

  /** The shared moment/z expression text: both the Spark plan and the
    * DuckDB oracle compile exactly this string (dialect-neutral). */
  /** Every arithmetic leaf casts through DOUBLE explicitly: a bare
    * `1.0 + s_t` would run in DECIMAL space on Spark (decimal
    * literals) but double space in DuckDB — the one dialect split the
    * shared text must neutralize. */
  private def zExpr: String =
    """case when n_t = 0 and n_c = 0 then 0 else
      |cast(round(1000000.0
      |  * ((1.0 + cast(s_t as double)) / (2.0 + cast(n_t as double))
      |     - (1.0 + cast(s_c as double)) / (2.0 + cast(n_c as double)))
      |  / sqrt(
      |      (1.0 + cast(s_t as double))
      |        * (1.0 + cast(n_t as double) - s_t)
      |        / ((2.0 + cast(n_t as double)) * (2.0 + cast(n_t as double))
      |           * (3.0 + cast(n_t as double)))
      |    + (1.0 + cast(s_c as double))
      |        * (1.0 + cast(n_c as double) - s_c)
      |        / ((2.0 + cast(n_c as double)) * (2.0 + cast(n_c as double))
      |           * (3.0 + cast(n_c as double)))))
      |  as bigint) end""".stripMargin.replace("\n", " ")

  /** Readout from any (arm, purchases) per-user frame (streaming-store
    * entry, same contract as [[AbTest.abTestFromPerUser]]). */
  def bayesFromPerUser(pu: DataFrame): DataFrame =
    pu.agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 1 && col("purchases") >= AbTest.convMin,
          1L).otherwise(0L)).as("s_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 0 && col("purchases") >= AbTest.convMin,
          1L).otherwise(0L)).as("s_c"))
      .selectExpr("n_t", "s_t", "n_c", "s_c",
        s"$meanTExpr as mean_t_micro",
        s"$meanCExpr as mean_c_micro",
        s"$liftExpr as lift_micro",
        s"$zExpr as z_micro")
      .withColumn("t_better_95", col("z_micro") >= zOneSided95Micro)

  def qBayesAb(spark: SparkSession, dir: String): DataFrame =
    bayesAb(Tables(spark, dir, "events"))

  val qBayesAbSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS purchases,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |agg AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
       |    CAST(SUM(CASE WHEN arm = 1 AND purchases >= ${AbTest.convMin}
       |      THEN 1 ELSE 0 END) AS BIGINT) AS s_t,
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
       |    CAST(SUM(CASE WHEN arm = 0 AND purchases >= ${AbTest.convMin}
       |      THEN 1 ELSE 0 END) AS BIGINT) AS s_c
       |  FROM pu)
       |SELECT n_t, s_t, n_c, s_c,
       |  $meanTExpr AS mean_t_micro,
       |  $meanCExpr AS mean_c_micro,
       |  $liftExpr AS lift_micro,
       |  $zExpr AS z_micro,
       |  $zExpr >= $zOneSided95Micro AS t_better_95
       |FROM agg""".stripMargin
}
