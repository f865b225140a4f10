package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** NELSON-AALEN CUMULATIVE HAZARD (Nelson 1972; Aalen 1978) — the
  * counting-process complement to [[KaplanMeier]]'s product-limit
  * curve: instead of estimating survival S(t) directly, accumulate the
  * hazard increments
  *
  *   H(t) = Σ_{t_i ≤ t} d_i / n_i,    Var(H) = Σ_{t_i ≤ t} d_i / n_i²
  *
  * and read survival off the Fleming-Harrington estimator
  * S_FH = exp(−H). H is the quantity survival-regression diagnostics
  * plot (a straight H(t) means constant hazard; the KM curve can't
  * show that), and unlike KM it never hits an absorbing exact 0 when
  * a duration exhausts the risk set — the hazard just accumulates.
  *
  * DETERMINISM. d/c/n come exact off [[KaplanMeier.riskTable]]'s
  * integer life-table build; each hazard increment d/n is
  * micro-quantized and each variance increment d/n² pico-quantized
  * (round-per-term, the [[KaplanMeier]] micronat convention), so both
  * cumulative curves are INTEGER prefix sums — engine-portable
  * regardless of summation order. The surfaced s_fh double is one exp
  * of the integer, inside the driver's float tolerance.
  *
  * SCALE. Identical to KM: one events scan → per-user clock triple;
  * the table then lives on the bounded DURATION DOMAIN (days,
  * calendar-bounded — never user count), so the ordered cumulative
  * window is single-partition over a provably bounded table. Serves
  * live from [[graft.streaming.ExperimentStore]]'s clock columns via
  * `nelsonAalenView` — zero new state. */
object NelsonAalen {

  /** Hazard table over any (f_us, l_us, p_us) per-subject frame:
    * (t_days, n_risk, d_event, c_censored, h_micro, var_pico, s_fh). */
  def hazardTable(perUser: DataFrame): DataFrame = {
    val cum = Window.orderBy("t_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    KaplanMeier.riskTable(perUser)
      .withColumn("h_term",
        expr("""cast(round(1000000.0 * cast(d as double)
               | / cast(n_risk as double)) as bigint)"""
          .stripMargin.replace("\n", " ")))
      .withColumn("v_term",
        expr("""cast(round(1000000000000.0 * cast(d as double)
               | / cast(n_risk as double) / cast(n_risk as double))
               | as bigint)""".stripMargin.replace("\n", " ")))
      .withColumn("h_micro", sum(col("h_term")).over(cum))
      .withColumn("var_pico", sum(col("v_term")).over(cum))
      .select(col("t_days"), col("n_risk"), col("d").as("d_event"),
        col("c").as("c_censored"), col("h_micro"), col("var_pico"),
        exp(-col("h_micro").cast(DoubleType) / lit(1e6)).as("s_fh"))
      .orderBy("t_days")
  }

  def qNelsonAalen(spark: SparkSession, dir: String): DataFrame =
    hazardTable(KaplanMeier.timeToBigPurchase(Tables(spark, dir, "events")))

  val qNelsonAalenSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id, MIN(epoch_us(ts)) AS f_us, MAX(epoch_us(ts)) AS l_us,
       |    MIN(CASE WHEN event_type = 'purchase'
       |        AND CAST(ROUND(value * 100.0) AS BIGINT) >= ${KaplanMeier.bigCents}
       |        THEN epoch_us(ts) END) AS p_us
       |  FROM events GROUP BY user_id),
       |spans AS (
       |  SELECT CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS event,
       |    (COALESCE(p_us, l_us) - f_us) // 86400000000 AS t_days
       |  FROM pu),
       |groups AS (
       |  SELECT t_days, CAST(SUM(event) AS BIGINT) AS d,
       |    CAST(SUM(1 - event) AS BIGINT) AS c
       |  FROM spans GROUP BY 1),
       |tot AS (SELECT SUM(d + c) AS n_all FROM groups),
       |risk AS (
       |  SELECT t_days, d, c,
       |    n_all - (SUM(d + c) OVER w - d - c) AS n_risk
       |  FROM groups, tot
       |  WINDOW w AS (ORDER BY t_days ROWS UNBOUNDED PRECEDING)),
       |terms AS (
       |  SELECT *,
       |    CAST(ROUND(1000000.0 * CAST(d AS DOUBLE)
       |      / CAST(n_risk AS DOUBLE)) AS BIGINT) AS h_term,
       |    CAST(ROUND(1000000000000.0 * CAST(d AS DOUBLE)
       |      / CAST(n_risk AS DOUBLE) / CAST(n_risk AS DOUBLE))
       |      AS BIGINT) AS v_term
       |  FROM risk)
       |SELECT t_days, CAST(n_risk AS BIGINT) AS n_risk,
       |  d AS d_event, c AS c_censored,
       |  CAST(SUM(h_term) OVER w AS BIGINT) AS h_micro,
       |  CAST(SUM(v_term) OVER w AS BIGINT) AS var_pico,
       |  exp(-CAST(SUM(h_term) OVER w AS DOUBLE) / 1e6) AS s_fh
       |FROM terms
       |WINDOW w AS (ORDER BY t_days ROWS UNBOUNDED PRECEDING)
       |ORDER BY t_days""".stripMargin
}
