package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CAPTURE-RECAPTURE POPULATION ESTIMATE (Petersen 1896; Chapman
  * 1951) — "how many users exist that we've never observed": treat
  * the VIEW-ers and the CLICK-ers as two independent capture
  * samples; the overlap rate estimates the catchability, and
  *
  *   N̂ = (n₁+1)·(n₂+1) / (m+1) − 1     (Chapman, bias-corrected)
  *
  * estimates the true population. N̂ minus the users actually seen
  * (under ANY event) is the blind-spot size — the denominator
  * correction a reach/penetration metric needs ([[graft.ext.Zipf]]'s
  * unseen-vocab question asked of the user dimension).
  *
  * DETERMINISM. n₁/n₂/m/seen are exact distinct counts off ONE
  * per-user scan (two one-bit flags per user); N̂ and its Chapman
  * variance are single rounded expressions over exact integers.
  *
  * SCALE. One scan → per-user two-flag agg → ONE 1-row aggregate. */
object CaptureRecapture {

  val sampleA = "view"
  val sampleB = "click"

  def captureRecapture(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(
        max((col("event_type") === sampleA).cast("long")).as("in_a"),
        max((col("event_type") === sampleB).cast("long")).as("in_b"))
      .agg(
        sum(col("in_a")).as("n1"),
        sum(col("in_b")).as("n2"),
        sum(col("in_a") * col("in_b")).as("m"),
        count(lit(1)).as("seen"))
      .selectExpr("n1", "n2", "m", "seen",
        """cast(round((cast(n1 as double) + 1.0)
          | * (cast(n2 as double) + 1.0)
          | / (cast(m as double) + 1.0) - 1.0) as bigint)
          | as n_hat""".stripMargin.replace("\n", " "),
        """cast(round((cast(n1 as double) + 1.0)
          | * (cast(n2 as double) + 1.0)
          | * (cast(n1 as double) - m) * (cast(n2 as double) - m)
          | / ((cast(m as double) + 1.0) * (cast(m as double) + 1.0)
          |    * (cast(m as double) + 2.0))) as bigint)
          | as var_hat""".stripMargin.replace("\n", " "))
      .withColumn("blind_spot",
        greatest(col("n_hat") - col("seen"), lit(0L)))

  def qCaptureRecapture(spark: SparkSession, dir: String): DataFrame =
    captureRecapture(Tables(spark, dir, "events"))

  val qCaptureRecaptureSql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN event_type = '$sampleA' THEN 1 ELSE 0 END)
       |      AS in_a,
       |    MAX(CASE WHEN event_type = '$sampleB' THEN 1 ELSE 0 END)
       |      AS in_b
       |  FROM events GROUP BY user_id),
       |agg AS (
       |  SELECT CAST(SUM(in_a) AS BIGINT) AS n1,
       |    CAST(SUM(in_b) AS BIGINT) AS n2,
       |    CAST(SUM(in_a * in_b) AS BIGINT) AS m,
       |    CAST(COUNT(*) AS BIGINT) AS seen
       |  FROM pu)
       |SELECT n1, n2, m, seen,
       |  CAST(ROUND((CAST(n1 AS DOUBLE) + 1.0)
       |    * (CAST(n2 AS DOUBLE) + 1.0)
       |    / (CAST(m AS DOUBLE) + 1.0) - 1.0) AS BIGINT) AS n_hat,
       |  CAST(ROUND((CAST(n1 AS DOUBLE) + 1.0)
       |    * (CAST(n2 AS DOUBLE) + 1.0)
       |    * (CAST(n1 AS DOUBLE) - m) * (CAST(n2 AS DOUBLE) - m)
       |    / ((CAST(m AS DOUBLE) + 1.0) * (CAST(m AS DOUBLE) + 1.0)
       |       * (CAST(m AS DOUBLE) + 2.0))) AS BIGINT) AS var_hat,
       |  GREATEST(CAST(ROUND((CAST(n1 AS DOUBLE) + 1.0)
       |    * (CAST(n2 AS DOUBLE) + 1.0)
       |    / (CAST(m AS DOUBLE) + 1.0) - 1.0) AS BIGINT) - seen, 0)
       |    AS blind_spot
       |FROM agg""".stripMargin
}
