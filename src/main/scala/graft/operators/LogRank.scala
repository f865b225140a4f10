package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** LOG-RANK TEST (Mantel 1966; Peto & Peto 1972 — THE two-sample
  * comparison of survival curves): does treatment change TIME TO the
  * event, not just whether it happens? Runs [[KaplanMeier]]'s
  * time-to-big-ticket-purchase clock against [[AbTest]]'s md5 arm
  * coin — the survival A/B readout, sensitive to timing shifts the
  * endpoint-only chi-square can't see and immune to the censoring
  * bias a naive "mean days to purchase among converters" carries.
  *
  * At each distinct event time j (pooled arms): observed treated
  * events O_j = d_1j, expected under H0 E_j = d_j·n_1j/n_j, variance
  * hypergeometric V_j = d_j·(n_1j/n_j)·(1−n_1j/n_j)·(n_j−d_j)/(n_j−1);
  * Z = Σ(O−E) / √ΣV, χ² = Z² against 3.841 at α = 0.05.
  *
  * DETERMINISM. All risk/death counts are exact integers off the
  * bounded life table; E_j and V_j are micro-quantized PER TIME (one
  * fixed-shape double expression each — mul/div only, no libm), so
  * ΣE, Σ(O−E), ΣV are integer sums in micro units and the final Z is
  * one mirrored div/sqrt. Times with n_j ≤ 1 or d_j = 0 contribute
  * exact zeros. Degenerate designs (ΣV = 0: no events, or an arm
  * never at risk) abstain with z = 0 via an integer guard.
  *
  * SCALE. The same shape as [[KaplanMeier]]: one events scan to the
  * per-user table, then everything lives on the calendar-bounded
  * (duration × arm) grid — the ordered prefix windows run over a
  * provably bounded table, never the corpus. */
object LogRank {

  /** Per-user (arm, event, t_days) on the big-ticket clock. */
  def perUser(events: DataFrame): DataFrame =
    KaplanMeier.timeToBigPurchase(events)
      .withColumn("arm",
        conv(substring(md5(col("user_id").cast(StringType)
          .cast(BinaryType)), 1, 15), 16, 10).cast(LongType) % 2)
      .select(col("arm"),
        when(col("p_us").isNotNull, 1L).otherwise(0L).as("event"),
        expr(s"(coalesce(p_us, l_us) - f_us) div ${86400000000L}")
          .as("t_days"))

  def logRank(events: DataFrame): DataFrame =
    logRankFromPerUser(perUser(events))

  /** The Mantel sums from any (arm, event, t_days) per-subject frame
    * (streaming-store entry — first/last/first-big timestamps are
    * min/max lattices, so the served clock equals the batch one). */
  def logRankFromPerUser(pu: DataFrame): DataFrame = {
    val grid = pu.groupBy("t_days").agg(
      sum(col("event")).as("d"),
      sum(when(col("arm") === 1, col("event")).otherwise(0L)).as("d1"),
      count(lit(1)).as("r"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("r1"))
    val tot = grid.agg(sum("r").as("n_all"), sum("r1").as("n1_all"))
    val cum = Window.orderBy("t_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = grid.crossJoin(broadcast(tot))
      .withColumn("n", col("n_all") - (sum(col("r")).over(cum) - col("r")))
      .withColumn("n1",
        col("n1_all") - (sum(col("r1")).over(cum) - col("r1")))
    // per-time micro-quantized E and V (zero when the time can't
    // discriminate: no deaths, or a single subject at risk)
    val terms = risk.selectExpr("t_days", "d", "d1", "n", "n1",
      """case when d = 0 or n < 1 then 0L else
        | cast(round(1000000.0 * d * n1 / cast(n as double)) as bigint)
        | end as e_micro""".stripMargin.replace("\n", " "),
      """case when d = 0 or n <= 1 then 0L else
        | cast(round(1000000.0 * ((d * (n1 / cast(n as double)))
        |   * (1.0 - n1 / cast(n as double)))
        |   * ((n - d) / cast(n - 1 as double))) as bigint)
        | end as v_micro""".stripMargin.replace("\n", " "))
    terms.agg(
        sum(col("d1")).as("o1"),
        sum(col("e_micro")).as("e1_micro"),
        sum(col("v_micro")).as("v_micro"),
        sum(col("d")).as("events"),
        max(col("n")).as("n_subjects"))
      .selectExpr(
        "cast(n_subjects as bigint) as n_subjects",
        "cast(events as bigint) as events",
        "cast(o1 as bigint) as o1",
        "e1_micro", "v_micro",
        """case when v_micro = 0 then 0L else
          | cast(round(1000000.0
          |   * (cast(o1 as double) - e1_micro / 1000000.0)
          |   / sqrt(v_micro / 1000000.0)) as bigint) end as z_micro"""
          .stripMargin.replace("\n", " "))
      .withColumn("significant", abs(col("z_micro")) >= AbTest.zCritMicro)
  }

  def qLogRank(spark: SparkSession, dir: String): DataFrame =
    logRank(Tables(spark, dir, "events"))

  val qLogRankSql: String =
    s"""WITH pu0 AS MATERIALIZED (
       |  SELECT user_id, MIN(epoch_us(ts)) AS f_us, MAX(epoch_us(ts)) AS l_us,
       |    MIN(CASE WHEN event_type = 'purchase'
       |        AND CAST(ROUND(value * 100.0) AS BIGINT)
       |          >= ${KaplanMeier.bigCents}
       |        THEN epoch_us(ts) END) AS p_us
       |  FROM events GROUP BY user_id),
       |pu AS MATERIALIZED (
       |  SELECT
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm,
       |    CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS event,
       |    (COALESCE(p_us, l_us) - f_us) // 86400000000 AS t_days
       |  FROM pu0),
       |grid AS (
       |  SELECT t_days, CAST(SUM(event) AS BIGINT) AS d,
       |    CAST(SUM(CASE WHEN arm = 1 THEN event ELSE 0 END) AS BIGINT)
       |      AS d1,
       |    CAST(COUNT(*) AS BIGINT) AS r,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1
       |  FROM pu GROUP BY 1),
       |tot AS (SELECT SUM(r) AS n_all, SUM(r1) AS n1_all FROM grid),
       |risk AS (
       |  SELECT t_days, d, d1,
       |    n_all - (SUM(r) OVER w - r) AS n,
       |    n1_all - (SUM(r1) OVER w - r1) AS n1
       |  FROM grid, tot
       |  WINDOW w AS (ORDER BY t_days ROWS UNBOUNDED PRECEDING)),
       |terms AS (
       |  SELECT *,
       |    CASE WHEN d = 0 OR n < 1 THEN 0 ELSE
       |      CAST(ROUND(1000000.0 * d * n1 / CAST(n AS DOUBLE)) AS BIGINT)
       |      END AS e_micro,
       |    CASE WHEN d = 0 OR n <= 1 THEN 0 ELSE
       |      CAST(ROUND(1000000.0 * ((d * (n1 / CAST(n AS DOUBLE)))
       |        * (1.0 - n1 / CAST(n AS DOUBLE)))
       |        * ((n - d) / CAST(n - 1 AS DOUBLE))) AS BIGINT)
       |      END AS v_micro
       |  FROM risk),
       |agg AS (
       |  SELECT SUM(d1) AS o1, SUM(e_micro) AS e1_micro,
       |    SUM(v_micro) AS v_micro, SUM(d) AS events,
       |    MAX(n) AS n_subjects
       |  FROM terms)
       |SELECT CAST(n_subjects AS BIGINT) AS n_subjects,
       |  CAST(events AS BIGINT) AS events,
       |  CAST(o1 AS BIGINT) AS o1,
       |  CAST(e1_micro AS BIGINT) AS e1_micro,
       |  CAST(v_micro AS BIGINT) AS v_micro,
       |  CASE WHEN v_micro = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0
       |      * (CAST(o1 AS DOUBLE) - e1_micro / 1000000.0)
       |      / sqrt(v_micro / 1000000.0)) AS BIGINT) END AS z_micro,
       |  ABS(CASE WHEN v_micro = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0
       |      * (CAST(o1 AS DOUBLE) - e1_micro / 1000000.0)
       |      / sqrt(v_micro / 1000000.0)) AS BIGINT) END)
       |    >= ${AbTest.zCritMicro} AS significant
       |FROM agg""".stripMargin
}
