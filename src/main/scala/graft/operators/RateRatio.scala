package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** POISSON RATE-RATIO TEST (the epidemiologist's incidence-rate
  * ratio; Rothman & Greenland ch. 14) — the COUNT-process view of
  * the experiment the spend readouts skip: purchases per exposed
  * user,
  *
  *   IRR = (c_t/n_t) / (c_c/n_c),
  *   z = ln(IRR) / sqrt(1/c_t + 1/c_c),
  *
  * which fires when the treatment changes purchase FREQUENCY while
  * ticket sizes compensate (flat spend, moving rate — the readout
  * [[AbTest]]'s cents can't see). The Woolf-style log-variance
  * 1/c_t + 1/c_c is the Poisson exposure-adjusted form.
  *
  * DETERMINISM. Counts and exposures are exact integers off the
  * shared [[AbTest.perUserArm]] scan; IRR and z are fully-double-cast
  * shared-text expressions; zero-count arms surface as
  * irr_defined = false.
  *
  * SCALE. One scan → per-user agg → ONE 1-row aggregate. Serves live
  * from [[graft.streaming.ExperimentStore.rateRatioView]]. */
object RateRatio {

  private def irrExpr: String =
    """(cast(c_t as double) / cast(n_t as double)
      | / (cast(c_c as double) / cast(n_c as double)))"""
      .stripMargin.replace("\n", " ")

  private def zExpr: String =
    s"""case when c_t = 0 or c_c = 0 or n_t = 0 or n_c = 0 then 0 else
       |cast(round(1000000.0 * ln($irrExpr)
       |  / sqrt(1.0 / cast(c_t as double) + 1.0 / cast(c_c as double)))
       |  as bigint) end""".stripMargin.replace("\n", " ")

  def rateRatio(events: DataFrame): DataFrame =
    rateFromPerUser(AbTest.perUserArm(events))

  /** From any (arm, purchases) per-user frame (streaming-store
    * entry). */
  def rateFromPerUser(pu: DataFrame): DataFrame =
    pu.agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, col("purchases")).otherwise(0L))
          .as("c_t"),
        sum(when(col("arm") === 0, col("purchases")).otherwise(0L))
          .as("c_c"))
      .selectExpr("n_t", "n_c", "c_t", "c_c",
        "c_t > 0 and c_c > 0 and n_t > 0 and n_c > 0 as irr_defined",
        s"""case when c_t = 0 or c_c = 0 or n_t = 0 or n_c = 0 then 0
           |else cast(round(1000000.0 * $irrExpr) as bigint) end
           |as irr_micro""".stripMargin.replace("\n", " "),
        s"$zExpr as z_micro")
      .withColumn("significant",
        col("irr_defined") && abs(col("z_micro")) >= AbTest.zCritMicro)

  def qRateRatio(spark: SparkSession, dir: String): DataFrame =
    rateRatio(Tables(spark, dir, "events"))

  val qRateRatioSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS purchases,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |agg AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_t,
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_c,
       |    CAST(SUM(CASE WHEN arm = 1 THEN purchases ELSE 0 END)
       |      AS BIGINT) AS c_t,
       |    CAST(SUM(CASE WHEN arm = 0 THEN purchases ELSE 0 END)
       |      AS BIGINT) AS c_c
       |  FROM pu)
       |SELECT n_t, n_c, c_t, c_c,
       |  c_t > 0 AND c_c > 0 AND n_t > 0 AND n_c > 0 AS irr_defined,
       |  CASE WHEN c_t = 0 OR c_c = 0 OR n_t = 0 OR n_c = 0 THEN 0
       |    ELSE CAST(ROUND(1000000.0 * $irrExpr) AS BIGINT) END
       |    AS irr_micro,
       |  $zExpr AS z_micro,
       |  (c_t > 0 AND c_c > 0 AND n_t > 0 AND n_c > 0)
       |    AND ABS($zExpr) >= ${AbTest.zCritMicro} AS significant
       |FROM agg""".stripMargin
}
