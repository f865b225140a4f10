package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** EXTREME-VALUE RETURN LEVELS (Gumbel 1958; method-of-moments fit) —
  * the capacity-planning readout the monitoring family's mean-level
  * trackers can't give: per event type, fit a Gumbel law to the DAILY
  * MAXIMA of the hourly counts and report the T-day return level
  *
  *   β = s·√6/π,   μ = m − γ·β,
  *   x_T = μ − β·ln(−ln(1 − 1/T))
  *
  * (γ the Euler–Mascheroni constant) — "the hourly burst you should
  * expect once per month" number that sizes queues and autoscaling
  * headroom, where [[TailRisk]] sizes spend risk.
  *
  * DETERMINISM. Daily maxima are exact integers (MAX over the hourly
  * rollup); their mean and variance come from exact integer Σx and
  * Σx² over the calendar-bounded day count; μ/β/x_T are single
  * fully-double-cast expressions over those integers with the
  * constants micro-pinned in the shared text.
  *
  * SCALE. One partial agg to the |types × hours| rollup, one fold to
  * |types × days|, then 1 row per type. Serves live from the hourly
  * count store via [[graft.streaming.EventStreams.extremeView]]. */
object ExtremeValue {

  /** Return period in days. */
  val returnDays = 30

  private def fitExpr: Seq[String] = {
    val mean = "(cast(sx as double) / n_days)"
    val varr = s"""(cast(sxx as double) / n_days - $mean * $mean)
                  | * n_days / (cast(n_days as double) - 1.0)"""
      .stripMargin.replace("\n", " ")
    val beta = s"(sqrt($varr) * 0.779696801)" // √6/π
    val mu = s"($mean - 0.577215665 * $beta)"
    val gq = math.log(-math.log(1.0 - 1.0 / returnDays)) // < 0
    Seq(
      s"cast(round(1000000.0 * $mean) as bigint) as max_mean_micro",
      s"""case when n_days <= 1 then 0 else
         |cast(round(1000000.0 * $beta) as bigint) end as beta_micro"""
        .stripMargin.replace("\n", " "),
      s"""case when n_days <= 1 then 0 else
         |cast(round(1000000.0 * $mu) as bigint) end as mu_micro"""
        .stripMargin.replace("\n", " "),
      s"""case when n_days <= 1 then 0 else
         |cast(round(1000000.0 * ($mu - $beta * ($gq))) as bigint) end
         |as rl${returnDays}_micro""".stripMargin.replace("\n", " "))
  }

  def extremeValue(events: DataFrame): DataFrame =
    extremeOverHourly(events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")))

  def extremeOverHourly(hourly: DataFrame): DataFrame =
    hourly
      .groupBy(col("event_type"), date_trunc("day", col("hour")).as("day"))
      .agg(max(col("n")).as("mx"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        max(col("mx")).as("max_seen"),
        sum(col("mx")).as("sx"),
        sum(col("mx") * col("mx")).as("sxx"))
      .selectExpr(Seq("event_type", "n_days", "max_seen", "sx", "sxx")
        ++ fitExpr: _*)
      .orderBy("event_type")

  def qExtremeValue(spark: SparkSession, dir: String): DataFrame =
    extremeValue(Tables(spark, dir, "events"))

  val qExtremeValueSql: String =
    s"""WITH hourly AS MATERIALIZED (
       |  SELECT event_type, date_trunc('hour', ts) AS hour,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |daily AS (
       |  SELECT event_type, date_trunc('day', hour) AS day,
       |    MAX(n) AS mx
       |  FROM hourly GROUP BY 1, 2),
       |agg AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       |    MAX(mx) AS max_seen, CAST(SUM(mx) AS BIGINT) AS sx,
       |    CAST(SUM(mx * mx) AS BIGINT) AS sxx
       |  FROM daily GROUP BY 1)
       |SELECT event_type, n_days, max_seen, sx, sxx,
       |  ${fitExpr.mkString(",\n       |  ")}
       |FROM agg
       |ORDER BY event_type""".stripMargin
}
