package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** WALD–WOLFOWITZ RUNS TEST (Wald & Wolfowitz 1940) per event type —
  * the randomness check the monitoring family was missing: CUSUM and
  * the changepoint find LEVEL shifts, ACF finds linear memory, but a
  * series can pass both while its fluctuations cluster (long runs on
  * one side of the mean — regime persistence) or alternate too
  * regularly (negative feedback). Dichotomize each hour as above/not
  * above the series mean, count sign RUNS R, and compare against the
  * exact null moments
  *
  *   E[R] = 1 + 2·n₁·n₂/n,
  *   Var  = 2·n₁·n₂·(2·n₁·n₂ − n) / (n²·(n−1)).
  *
  * DETERMINISM. The above-mean sign is the exact INTEGER comparison
  * n_t·cnt > sum (the mean never materializes as a float); R, n₁, n₂
  * are integer window counts; z is ONE double expression over exact
  * integers with every leaf cast through double (the [[BayesAb]]
  * decimal-literal lesson). Degenerate variance (constant series,
  * n ≤ 1) surfaces as z = 0 with the counts present.
  *
  * SCALE. One partial agg to the |types × hours| rollup
  * ([[Events.qCusum]] contract); the spine, the sign lag and the
  * 1-row-per-type moments are calendar-bounded. Serves live from the
  * hourly count store via [[graft.streaming.EventStreams
  * .runsTestView]]. */
object RunsTest {

  def runsTest(events: DataFrame): DataFrame =
    runsTestOverHourly(events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")))

  def runsTestOverHourly(hourly: DataFrame): DataFrame = {
    val span = hourly.groupBy("event_type")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val spine = span.select(col("event_type"),
      explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    // the dense spine feeds the mean totals AND the sign join —
    // materialize the calendar-bounded table once so the corpus
    // rollup is paid once (plan-asserted)
    val (dense, _) = graft.util.Checkpoints.checkpointTracked(
      spine.join(hourly, Seq("event_type", "hour"), "left")
        .na.fill(0L, Seq("n")))
    val tot = dense.groupBy(col("event_type").as("te"))
      .agg(sum(col("n")).as("tsum"), count(lit(1)).as("tcnt"))
    val w = Window.partitionBy("event_type").orderBy("hour")
    dense.join(broadcast(tot), col("event_type") === col("te"))
      .withColumn("sgn", (col("n") * col("tcnt") > col("tsum"))
        .cast("int"))
      .withColumn("flip",
        when(lag(col("sgn"), 1).over(w).isNull, 1)
          .when(lag(col("sgn"), 1).over(w) =!= col("sgn"), 1)
          .otherwise(0))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(col("sgn").cast("bigint")).as("n_above"),
        sum(col("flip").cast("bigint")).as("runs"))
      .selectExpr("event_type", "n_hours", "n_above", "runs",
        s"$zExprSql as z_micro")
      .withColumn("random_ok", abs(col("z_micro")) < AbTest.zCritMicro)
      .orderBy("event_type")
  }

  /** Shared z text (dialect-neutral; every leaf double-cast). With
    * n₁ = n_above, n₂ = n − n₁, m = 2·n₁·n₂:
    * z = (R − 1 − m/n) / sqrt(m·(m − n) / (n²·(n−1))). */
  private val zExprSql: String =
    """case when n_hours <= 1 or n_above = 0 or n_above = n_hours
      | or (2.0 * cast(n_above as double)
      |     * (cast(n_hours as double) - n_above))
      |    <= cast(n_hours as double) then 0 else
      |cast(round(1000000.0
      |  * (cast(runs as double) - 1.0
      |     - 2.0 * cast(n_above as double)
      |       * (cast(n_hours as double) - n_above)
      |       / cast(n_hours as double))
      |  / sqrt(2.0 * cast(n_above as double)
      |      * (cast(n_hours as double) - n_above)
      |      * (2.0 * cast(n_above as double)
      |         * (cast(n_hours as double) - n_above)
      |         - cast(n_hours as double))
      |      / (cast(n_hours as double) * cast(n_hours as double)
      |         * (cast(n_hours as double) - 1.0))))
      |  as bigint) end""".stripMargin.replace("\n", " ")

  def qRunsTest(spark: SparkSession, dir: String): DataFrame =
    runsTest(Tables(spark, dir, "events"))

  val qRunsTestSql: String =
    s"""WITH hourly AS MATERIALIZED (
       |  SELECT event_type, date_trunc('hour', ts) AS hour,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |span AS (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
       |  FROM hourly GROUP BY 1),
       |spine AS (
       |  SELECT event_type, UNNEST(generate_series(h0, h1,
       |    INTERVAL 1 HOUR)) AS hour FROM span),
       |dense AS (
       |  SELECT s.event_type, s.hour, COALESCE(h.n, 0) AS n
       |  FROM spine s LEFT JOIN hourly h
       |    ON h.event_type = s.event_type AND h.hour = s.hour),
       |tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tsum,
       |    CAST(COUNT(*) AS BIGINT) AS tcnt
       |  FROM dense GROUP BY 1),
       |signs AS (
       |  SELECT d.event_type, d.hour,
       |    CASE WHEN d.n * t.tcnt > t.tsum THEN 1 ELSE 0 END AS sgn
       |  FROM dense d JOIN tot t ON t.event_type = d.event_type),
       |flips AS (
       |  SELECT event_type, sgn,
       |    CASE WHEN lag(sgn, 1) OVER w IS NULL THEN 1
       |         WHEN lag(sgn, 1) OVER w <> sgn THEN 1 ELSE 0 END AS flip
       |  FROM signs
       |  WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
       |agg AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
       |    CAST(SUM(sgn) AS BIGINT) AS n_above,
       |    CAST(SUM(flip) AS BIGINT) AS runs
       |  FROM flips GROUP BY 1)
       |SELECT event_type, n_hours, n_above, runs,
       |  $zExprSql AS z_micro,
       |  ABS($zExprSql) < ${AbTest.zCritMicro} AS random_ok
       |FROM agg
       |ORDER BY event_type""".stripMargin
}
