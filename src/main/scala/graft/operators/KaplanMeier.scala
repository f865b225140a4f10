package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** KAPLAN-MEIER SURVIVAL (Kaplan & Meier 1958 — the product-limit
  * estimator, survival analysis' workhorse) for the funnel question
  * every growth team asks as time-to-event: how long from a user's
  * FIRST event to their first BIG-TICKET purchase (cents ≥
  * [[bigCents]]), with users who never get there right-censored at
  * their last observed event — exactly the data the naive
  * "conversion rate by day" chart silently biases by dropping the
  * not-yet-converted:
  *
  *   S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)
  *
  * (d_i events at duration t_i, n_i at risk = everyone whose event OR
  * censoring time is ≥ t_i).
  *
  * DETERMINISM. d/c/n are exact integers; each factor's
  * ln(1 − d_i/n_i) is micronat-quantized per-term ([[graft.ext
  * .KneserNey]] convention) so the log-survival curve is an INTEGER
  * cumulative sum — engine-portable regardless of summation order —
  * and the surfaced `s` double is one exp of that integer, compared
  * at the driver's 12-significant-digit float tolerance. If a
  * duration exhausts the risk set (d_i = n_i, S hits exact 0) the
  * log is undefined: log_s_micro goes NULL and s 0.0 from that row
  * on, via an exact-integer cumulative flag — never a NaN/-inf.
  *
  * SCALE. One events scan → per-user (first, last, first-big) — the
  * [[AbTest.perUserArm]] shape; the KM life table then lives on the
  * DISTINCT DURATION DOMAIN (days — bounded by calendar span, NOT by
  * user count: the [[KsDrift]]/[[HistogramQuantiles]] boundedness
  * contract), so the ordered cumulative windows are single-partition
  * over a provably bounded table. At-risk counts come from the total
  * minus the running (d+c) prefix — no self-join, no resort. */
object KaplanMeier {

  /** Big-ticket threshold in exact cents (value ≥ 100.00). */
  val bigCents = 10000L

  private val usPerDay = 86400000000L

  /** The (t_days, d, c, n_risk) risk table over any (f_us, l_us,
    * p_us) per-subject frame — the shared substrate of the KM
    * product-limit curve and the Nelson-Aalen cumulative hazard.
    * Lives on the bounded duration domain (days, calendar-bounded);
    * at-risk = total − running (d+c) prefix, no self-join. */
  def riskTable(perUser: DataFrame): DataFrame = {
    val spans = perUser.select(
      when(col("p_us").isNotNull, 1L).otherwise(0L).as("event"),
      (when(col("p_us").isNotNull, col("p_us")).otherwise(col("l_us"))
        - col("f_us")).as("dur_us"))
      .select(col("event"), expr(s"dur_us div $usPerDay").as("t_days"))
    val groups = spans.groupBy("t_days").agg(
      sum(col("event")).as("d"),
      sum(lit(1L) - col("event")).as("c"))
    val tot = groups.agg(sum(col("d") + col("c")).as("n_all"))
    val cum = Window.orderBy("t_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    groups.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_all") - (sum(col("d") + col("c")).over(cum)
          - col("d") - col("c")))
  }

  /** Life table over any (f_us, l_us, p_us) per-subject frame:
    * p_us null ⇒ censored at l_us. */
  def lifeTable(perUser: DataFrame): DataFrame = {
    val cum = Window.orderBy("t_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    riskTable(perUser)
      // per-duration micronat log factor; d = n_risk ⇒ S hits exact 0
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
      .withColumn("s",
        when(col("zeroed") > 0, lit(0.0))
          .otherwise(exp(col("log_s_micro").cast(DoubleType) / lit(1e6))))
      .select(col("t_days"), col("n_risk"), col("d").as("d_event"),
        col("c").as("c_censored"), col("log_s_micro"), col("s"))
      .orderBy("t_days")
  }

  /** Time from first event to first big-ticket purchase. */
  def timeToBigPurchase(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(
      min(unix_micros(col("ts"))).as("f_us"),
      max(unix_micros(col("ts"))).as("l_us"),
      min(when(col("event_type") === "purchase" &&
        expr("cast(round(value * 100.0) as bigint)") >= bigCents,
        unix_micros(col("ts")))).as("p_us"))

  def qKaplanMeier(spark: SparkSession, dir: String): DataFrame =
    lifeTable(timeToBigPurchase(Tables(spark, dir, "events")))

  val qKaplanMeierSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id, MIN(epoch_us(ts)) AS f_us, MAX(epoch_us(ts)) AS l_us,
       |    MIN(CASE WHEN event_type = 'purchase'
       |        AND CAST(ROUND(value * 100.0) AS BIGINT) >= $bigCents
       |        THEN epoch_us(ts) END) AS p_us
       |  FROM events GROUP BY user_id),
       |spans AS (
       |  SELECT CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END AS event,
       |    (COALESCE(p_us, l_us) - f_us) // $usPerDay AS t_days
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
       |    CASE WHEN d = 0 THEN 0
       |      WHEN d < n_risk THEN CAST(ROUND(1000000.0 * ln(1.0
       |        - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))) AS BIGINT)
       |      ELSE NULL END AS term
       |  FROM risk),
       |curve AS (
       |  SELECT *,
       |    SUM(CASE WHEN term IS NULL THEN 1 ELSE 0 END) OVER w AS zeroed,
       |    SUM(COALESCE(term, 0)) OVER w AS cum
       |  FROM terms
       |  WINDOW w AS (ORDER BY t_days ROWS UNBOUNDED PRECEDING))
       |SELECT t_days, CAST(n_risk AS BIGINT) AS n_risk,
       |  d AS d_event, c AS c_censored,
       |  CASE WHEN zeroed = 0 THEN CAST(cum AS BIGINT) END AS log_s_micro,
       |  CASE WHEN zeroed > 0 THEN 0.0
       |    ELSE exp(CAST(CASE WHEN zeroed = 0 THEN CAST(cum AS BIGINT) END
       |      AS DOUBLE) / 1e6) END AS s
       |FROM curve
       |ORDER BY t_days""".stripMargin
}
