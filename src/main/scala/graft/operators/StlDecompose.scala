package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** ADDITIVE SEASONAL DECOMPOSITION (the classical decomposition of
  * Macaulay 1931 / "STL-lite": trend by centered moving average,
  * seasonal by hour-of-day means of the detrended series, residual
  * by subtraction) — the diagnostic that splits the monitoring
  * family's one hourly series into the three signals on which its
  * other members each specialize (Trend's OLS slope, Seasonality's
  * η², the residual the anomaly flags should live on):
  *
  *   T_t = (Σ_{k=−12..12} x_{t+k}) / 25,
  *   S_h = mean over {t : hod(t) = h} of (x_t − T_t),
  *   R_t = x_t − T_t − S_h.
  *
  * DETERMINISM — all integer, no float sums anywhere: the 25-hour
  * window sum W_t is an exact integer, so the detrended value is
  * EXACTLY 10⁶·x_t − 40000·W_t micro-units (10⁶/25 = 40000 — the
  * window width is chosen so the division is exact); the per-(type,
  * hod) seasonal mean is one rounded division of integer sums; the
  * mean |residual| likewise. Output is the bounded |types|×24 table:
  * (event_type, hod, n_hours, seasonal_micro, mar_micro).
  *
  * SCALE. ONE partial agg collapses events to the |types × hours|
  * rollup ([[Events.qCusum]] contract); the centered window and the
  * hod aggregation live on the calendar-bounded spine. Serves live
  * from the hourly count store via [[graft.streaming.EventStreams
  * .stlView]]. */
object StlDecompose {

  val halfWindow = 12 // 25-hour centered MA

  def stl(events: DataFrame): DataFrame =
    stlOverHourly(events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")))

  /** The decomposition over a pre-aggregated (event_type, hour, n)
    * rollup — the streaming hourly count store's serving contract. */
  def stlOverHourly(hourly: DataFrame): DataFrame = {
    val span = hourly.groupBy("event_type")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val spine = span.select(col("event_type"),
      explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val dense = spine.join(hourly, Seq("event_type", "hour"), "left")
      .na.fill(0L, Seq("n"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(-halfWindow, halfWindow)
    val rn = Window.partitionBy("event_type").orderBy("hour")
    // keep only hours with the FULL 25-hour window (count == 25)
    val det = dense
      .withColumn("wsum", sum(col("n")).over(w))
      .withColumn("wcnt", count(lit(1)).over(w))
      .filter(col("wcnt") === 2 * halfWindow + 1)
      .select(col("event_type"),
        (hour(col("hour"))).as("hod"),
        (col("n") * 1000000L - col("wsum") * 40000L).as("det_micro"))
    det.groupBy("event_type", "hod")
      .agg(count(lit(1)).as("n_hours"),
        sum(col("det_micro")).as("det_sum"),
        sum(abs(col("det_micro"))).as("abs_sum"))
      .selectExpr("event_type", "hod", "n_hours",
        "cast(round(cast(det_sum as double) / n_hours) as bigint)"
          + " as seasonal_micro",
        "cast(round(cast(abs_sum as double) / n_hours) as bigint)"
          + " as mar_micro")
      .orderBy("event_type", "hod")
  }

  def qStlDecompose(spark: SparkSession, dir: String): DataFrame =
    stl(Tables(spark, dir, "events"))

  val qStlDecomposeSql: String =
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
       |win AS (
       |  SELECT event_type, hour, n,
       |    SUM(n) OVER w AS wsum, COUNT(*) OVER w AS wcnt
       |  FROM dense
       |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
       |    ROWS BETWEEN $halfWindow PRECEDING AND $halfWindow FOLLOWING)),
       |det AS (
       |  SELECT event_type, EXTRACT(hour FROM hour) AS hod,
       |    n * 1000000 - wsum * 40000 AS det_micro
       |  FROM win WHERE wcnt = ${2 * halfWindow + 1})
       |SELECT event_type, CAST(hod AS INTEGER) AS hod,
       |  CAST(COUNT(*) AS BIGINT) AS n_hours,
       |  CAST(ROUND(CAST(SUM(det_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
       |    AS seasonal_micro,
       |  CAST(ROUND(CAST(SUM(ABS(det_micro)) AS DOUBLE) / COUNT(*))
       |    AS BIGINT) AS mar_micro
       |FROM det GROUP BY event_type, hod
       |ORDER BY event_type, hod""".stripMargin
}
