package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** RESTRICTED MEAN SURVIVAL TIME by arm (Royston & Parmar 2013;
  * Uno et al. 2014 made it the recommended survival EFFECT SIZE) —
  * the number the log-rank p-value doesn't give: how many event-free
  * DAYS (up to the horizon τ) does each arm average, and what is the
  * difference? RMST(τ) = ∫₀^τ S(t)dt — the area under the per-arm
  * Kaplan-Meier step curve:
  *
  *   RMST = Σ_i S(t_i) · (min(t_{i+1}, τ) − t_i)  +  t_1 · 1
  *
  * (survival is 1 before the first observed duration). Clinically —
  * and for the product twin here, days-until-first-big-purchase —
  * "arm A buys 1.3 days sooner on average within the first month" is
  * the readout a decision maker uses; the log-rank z only says the
  * curves differ.
  *
  * DETERMINISM. The per-arm KM curve is [[KaplanMeier.lifeTable]]'s
  * integer micronat machinery partitioned by arm; each step's S is
  * then quantized ONCE (round(1e6·exp(log_s_micro/1e6)) — one exp of
  * an integer, bit-identical cross-engine) so the area is an exact
  * INTEGER sum of s_micro·Δdays — order-free, no float fold.
  *
  * SCALE. The same shape as [[LogRank]]: one events scan → per-user
  * table → everything on the calendar-bounded (arm × duration) grid. */
object Rmst {

  /** Horizon τ in days (the corpus spans 30). */
  val tauDays = 30L

  def rmst(events: DataFrame): DataFrame =
    rmstFromPerUser(LogRank.perUser(events))

  /** One row (tau_days, rmst_t_micro, rmst_c_micro, diff_micro) from
    * any (arm, event, t_days) per-subject frame ([[LogRank.perUser]]'s
    * shape; streaming-store entry). */
  def rmstFromPerUser(pu: DataFrame): DataFrame = {
    val groups = pu.groupBy("arm", "t_days").agg(
      sum(col("event")).as("d"),
      sum(lit(1L) - col("event")).as("c"))
    val tot = groups.groupBy("arm").agg(sum(col("d") + col("c")).as("n_all"))
    val cum = Window.partitionBy("arm").orderBy("t_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ord = Window.partitionBy("arm").orderBy("t_days")
    val curve = groups.join(broadcast(tot), "arm")
      .withColumn("n_risk",
        col("n_all") - (sum(col("d") + col("c")).over(cum)
          - col("d") - col("c")))
      .withColumn("term",
        when(col("d") === 0, 0L)
          .when(col("d") < col("n_risk"),
            expr("""cast(round(1000000.0 * ln(1.0
                   | - cast(d as double) / cast(n_risk as double)))
                   | as bigint)""".stripMargin.replace("\n", " ")))
          .otherwise(lit(null).cast(LongType)))
      .withColumn("zeroed", sum(when(col("term").isNull, 1L)
        .otherwise(0L)).over(cum))
      .withColumn("log_s_micro",
        when(col("zeroed") === 0, sum(coalesce(col("term"), lit(0L)))
          .over(cum)))
      // ONE quantization per step: the integer area summands
      .withColumn("s_micro",
        when(col("zeroed") > 0, 0L)
          .otherwise(expr(
            "cast(round(1000000.0 * exp(cast(log_s_micro as double)"
              + " / 1000000.0)) as bigint)")))
      .withColumn("t_next",
        coalesce(lead(col("t_days"), 1).over(ord), lit(tauDays)))
    // area: the pre-first-step strip at S = 1 plus each step's strip,
    // all integers — summation order can't matter. The strip is clamped
    // to τ: if an arm's earliest duration exceeds the horizon, RMST = τ
    // (the integral ∫₀^τ S dt can never exceed τ).
    val perArm = curve.groupBy("arm").agg(
      (least(min("t_days"), lit(tauDays)) * 1000000L
        + sum(when(col("t_days") < tauDays,
            col("s_micro")
              * (least(col("t_next"), lit(tauDays)) - col("t_days")))
          .otherwise(0L))).as("rmst"))
    perArm.agg(
        max(when(col("arm") === 1, col("rmst"))).as("rmst_t"),
        max(when(col("arm") === 0, col("rmst"))).as("rmst_c"))
      .selectExpr(s"${tauDays}L as tau_days",
        "coalesce(rmst_t, 0L) as rmst_t_micro",
        "coalesce(rmst_c, 0L) as rmst_c_micro",
        "coalesce(rmst_t, 0L) - coalesce(rmst_c, 0L) as diff_micro")
  }

  def qRmst(spark: SparkSession, dir: String): DataFrame =
    rmst(Tables(spark, dir, "events"))

  val qRmstSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
       |      1, 15) AS UBIGINT) AS BIGINT) % 2 AS arm,
       |    CASE WHEN MIN(CASE WHEN event_type = 'purchase'
       |        AND CAST(ROUND(value * 100.0) AS BIGINT)
       |          >= ${KaplanMeier.bigCents}
       |        THEN epoch_us(ts) END) IS NOT NULL THEN 1 ELSE 0 END
       |      AS event,
       |    (COALESCE(MIN(CASE WHEN event_type = 'purchase'
       |        AND CAST(ROUND(value * 100.0) AS BIGINT)
       |          >= ${KaplanMeier.bigCents}
       |        THEN epoch_us(ts) END), MAX(epoch_us(ts)))
       |      - MIN(epoch_us(ts))) // 86400000000 AS t_days
       |  FROM events GROUP BY user_id),
       |groups AS (
       |  SELECT arm, t_days, CAST(SUM(event) AS BIGINT) AS d,
       |    CAST(SUM(1 - event) AS BIGINT) AS c
       |  FROM pu GROUP BY 1, 2),
       |tot AS (SELECT arm, SUM(d + c) AS n_all FROM groups GROUP BY 1),
       |risk AS (
       |  SELECT g.arm, g.t_days, g.d, g.c,
       |    t.n_all - (SUM(g.d + g.c) OVER w - g.d - g.c) AS n_risk
       |  FROM groups g JOIN tot t USING (arm)
       |  WINDOW w AS (PARTITION BY g.arm ORDER BY g.t_days
       |    ROWS UNBOUNDED PRECEDING)),
       |terms AS (
       |  SELECT *,
       |    CASE WHEN d = 0 THEN 0
       |      WHEN d < n_risk THEN CAST(ROUND(1000000.0 * ln(1.0
       |        - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))) AS BIGINT)
       |      ELSE NULL END AS term
       |  FROM risk),
       |curve AS (
       |  SELECT *,
       |    SUM(CASE WHEN term IS NULL THEN 1 ELSE 0 END) OVER w AS zeroed,
       |    SUM(COALESCE(term, 0)) OVER w AS cum,
       |    COALESCE(lead(t_days) OVER (PARTITION BY arm ORDER BY t_days),
       |      $tauDays) AS t_next
       |  FROM terms
       |  WINDOW w AS (PARTITION BY arm ORDER BY t_days
       |    ROWS UNBOUNDED PRECEDING)),
       |stepped AS (
       |  SELECT arm, t_days, t_next,
       |    CASE WHEN zeroed > 0 THEN 0
       |      ELSE CAST(ROUND(1000000.0
       |        * exp(CAST(CAST(cum AS BIGINT) AS DOUBLE) / 1000000.0))
       |        AS BIGINT) END AS s_micro
       |  FROM curve),
       |per_arm AS (
       |  SELECT arm,
       |    LEAST(MIN(t_days), $tauDays) * 1000000 +
       |    SUM(CASE WHEN t_days < $tauDays
       |      THEN s_micro * (LEAST(t_next, $tauDays) - t_days)
       |      ELSE 0 END) AS rmst
       |  FROM stepped GROUP BY arm)
       |SELECT CAST($tauDays AS BIGINT) AS tau_days,
       |  CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN rmst END), 0)
       |    AS BIGINT) AS rmst_t_micro,
       |  CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN rmst END), 0)
       |    AS BIGINT) AS rmst_c_micro,
       |  CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN rmst END), 0)
       |    - COALESCE(MAX(CASE WHEN arm = 0 THEN rmst END), 0)
       |    AS BIGINT) AS diff_micro
       |FROM per_arm""".stripMargin
}
