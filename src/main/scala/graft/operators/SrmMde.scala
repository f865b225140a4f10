package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** EXPERIMENT-DESIGN GUARDS — the two readouts a platform runs before
  * and after reading any metric:
  *
  * SAMPLE RATIO MISMATCH (Fabijan et al. 2019, "Diagnosing Sample
  * Ratio Mismatch in Online Controlled Experiments"): if the arm
  * split deviates from its design (50/50 here — the md5 coin), every
  * downstream metric is suspect regardless of its p-value, because
  * the missingness is almost never random. The guard is a one-df
  * chi-square of the observed counts against the designed ratio:
  * for 50/50, χ² = (n_t − n_c)² / (n_t + n_c) — exact integers in
  * DECIMAL(38,0) (the difference-square is O(N²) mass) and ONE final
  * division. A platform BLOCKS the scorecard on SRM, so the verdict
  * column is the operator's whole point.
  *
  * MINIMUM DETECTABLE EFFECT (the power half of the A/B design loop,
  * standard two-sample formula, e.g. Kohavi, Tang & Xu 2020 §17):
  * with the achieved arm sizes and variances,
  *
  *   MDE = (z_{α/2} + z_β) · se,
  *   se  = sqrt(s²_t/n_t + s²_c/n_c)
  *
  * at α = 0.05 two-sided and 80% power (z_β = 0.841621). The readout
  * reports se, MDE, the observed effect, and whether the observed
  * effect clears the detectable bar — the "was this experiment even
  * big enough" answer that belongs next to every insignificant
  * result. Φ itself is deliberately NOT reported: a power percentage
  * needs erf, whose libm rounding is engine-dependent; MDE is
  * mul/div/sqrt over exact integer moments (the [[AbTest]] IEEE
  * contract) and carries the same information.
  *
  * SCALE: both are one scan → per-user agg → 1-row integer sufficient
  * statistics with map-side combine — the [[AbTest]] shape. Both also
  * serve live from [[graft.streaming.ExperimentStore]]'s per-user
  * monoid state via the `FromPerUser` entry points. */
object SrmMde {

  /** z₀.₀₂₅ + z₀.₂ (80% power), micro-quantized: 1.959964 + 0.841621. */
  val mdeZSumMicro = 2801585L

  def srmCheck(events: DataFrame): DataFrame =
    srmFromPerUser(AbTest.perUserArm(events))

  /** SRM from any (arm, …) per-user frame (streaming-store entry). */
  def srmFromPerUser(pu: DataFrame): DataFrame =
    pu.agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"))
      .selectExpr("n_t", "n_c",
        """case when n_t + n_c = 0 then 0L else
          | cast(round(1000000.0 * n_t / (n_t + n_c)) as bigint) end
          | as ratio_micro""".stripMargin.replace("\n", " "),
        """case when n_t + n_c = 0 then 0L else
          | cast(round(1000000.0
          |   * cast((n_t - n_c) * cast(n_t - n_c as decimal(38,0))
          |       as double)
          |   / (n_t + n_c)) as bigint) end as chi2_micro"""
          .stripMargin.replace("\n", " "))
      .withColumn("srm_detected", col("chi2_micro") >= AbTest.chi2CritMicro)

  def qSrmCheck(spark: SparkSession, dir: String): DataFrame =
    srmCheck(Tables(spark, dir, "events"))

  val qSrmCheckSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |agg AS (
       |  SELECT
       |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_t,
       |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_c
       |  FROM pu)
       |SELECT CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
       |  CASE WHEN n_t + n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * n_t / (n_t + n_c)) AS BIGINT) END
       |    AS ratio_micro,
       |  CASE WHEN n_t + n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0
       |      * CAST((n_t - n_c) * (n_t - n_c) AS DOUBLE)
       |      / (n_t + n_c)) AS BIGINT) END AS chi2_micro,
       |  CASE WHEN n_t + n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0
       |      * CAST((n_t - n_c) * (n_t - n_c) AS DOUBLE)
       |      / (n_t + n_c)) AS BIGINT) END
       |    >= ${AbTest.chi2CritMicro} AS srm_detected
       |FROM agg""".stripMargin

  def mdePower(events: DataFrame): DataFrame =
    mdeFromPerUser(AbTest.perUserArm(events))

  /** MDE from any (arm, cents) per-user frame (streaming-store
    * entry): the same exact integer moments as [[AbTest]]'s Welch
    * leg, one extra multiply. */
  def mdeFromPerUser(pu: DataFrame): DataFrame = {
    val suff = pu.agg(
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
      sum(when(col("arm") === 1, col("cents")).otherwise(0L)).as("s_t"),
      sum(when(col("arm") === 0, col("cents")).otherwise(0L)).as("s_c"),
      sum(when(col("arm") === 1,
        col("cents").cast(DecimalType(38, 0)) * col("cents"))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as("q_t"),
      sum(when(col("arm") === 0,
        col("cents").cast(DecimalType(38, 0)) * col("cents"))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as("q_c"))
    val derived = suff.selectExpr("*",
      "n_t * q_t - s_t * cast(s_t as decimal(38,0)) as vt_num",
      "n_c * q_c - s_c * cast(s_c as decimal(38,0)) as vc_num")
    val se =
      """sqrt(
        |   cast(vt_num as double)
        |     / (cast(n_t as double) * n_t * (n_t - 1))
        |   + cast(vc_num as double)
        |     / (cast(n_c as double) * n_c * (n_c - 1)))"""
        .stripMargin.replace("\n", " ")
    derived.selectExpr(
      "cast(n_t as bigint) as n_t", "cast(n_c as bigint) as n_c",
      s"""case when n_t < 2 or n_c < 2 then 0L else
         | cast(round(1000000.0 * $se) as bigint) end as se_micro"""
        .stripMargin.replace("\n", " "),
      s"""case when n_t < 2 or n_c < 2 then 0L else
         | cast(round(${mdeZSumMicro / 1e6} * 1000000.0 * $se) as bigint)
         | end as mde_micro""".stripMargin.replace("\n", " "),
      """case when n_t = 0 or n_c = 0 then 0L else
        | cast(round(1000000.0 * (s_t / cast(n_t as double)
        |   - s_c / cast(n_c as double))) as bigint) end
        | as effect_micro""".stripMargin.replace("\n", " "))
      .withColumn("detectable",
        abs(col("effect_micro")) >= col("mde_micro") &&
          col("mde_micro") > 0L)
  }

  def qMdePower(spark: SparkSession, dir: String): DataFrame =
    mdePower(Tables(spark, dir, "events"))

  val qMdePowerSql: String = {
    val se =
      """SQRT(
        |     CAST(vt_num AS DOUBLE)
        |       / (CAST(n_t AS DOUBLE) * n_t * (n_t - 1))
        |     + CAST(vc_num AS DOUBLE)
        |       / (CAST(n_c AS DOUBLE) * n_c * (n_c - 1)))"""
        .stripMargin.replace("\n", " ")
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
       |      AS cents,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |suff AS MATERIALIZED (
       |  SELECT
       |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_t,
       |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_c,
       |    SUM(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS s_t,
       |    SUM(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS s_c,
       |    SUM(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END) AS q_t,
       |    SUM(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END) AS q_c
       |  FROM pu),
       |derived AS MATERIALIZED (
       |  SELECT *,
       |    n_t * q_t - s_t * s_t AS vt_num,
       |    n_c * q_c - s_c * s_c AS vc_num
       |  FROM suff),
       |fin AS (
       |  SELECT CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
       |    CASE WHEN n_t < 2 OR n_c < 2 THEN 0 ELSE
       |      CAST(ROUND(1000000.0 * $se) AS BIGINT) END AS se_micro,
       |    CASE WHEN n_t < 2 OR n_c < 2 THEN 0 ELSE
       |      CAST(ROUND(${mdeZSumMicro / 1e6} * 1000000.0 * $se)
       |        AS BIGINT) END AS mde_micro,
       |    CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE
       |      CAST(ROUND(1000000.0 * (s_t / CAST(n_t AS DOUBLE)
       |        - s_c / CAST(n_c AS DOUBLE))) AS BIGINT) END
       |      AS effect_micro
       |  FROM derived)
       |SELECT *,
       |  ABS(effect_micro) >= mde_micro AND mde_micro > 0 AS detectable
       |FROM fin""".stripMargin
  }
}
