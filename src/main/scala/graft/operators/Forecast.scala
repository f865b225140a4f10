package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** HOURLY FORECASTING PAIR — extends the monitoring family's LEVEL
  * tracker ([[Ewma]]) with a TREND-AWARE forecaster and the
  * evaluation readout that says whether any of it beats the naive
  * baselines:
  *
  * 1. BROWN'S DOUBLE EXPONENTIAL SMOOTHING (Brown 1963): smooth the
  *    smoothed series, then level a = 2S′ − S″ and trend
  *    b = (α/(1−α))(S′ − S″); with the engine's α = 1/2 finite-window
  *    kernel (integer weights 2⁸⁻ᵏ/255 over the 8 pre-hours — the
  *    [[Ewma]] float-determinism posture) the ratio α/(1−α) = 1, so
  *    the one-step forecast collapses to exact integers:
  *      f_t = a + b = 3S′ − 2S″,
  *      255²·f_t = 3·255·N′_t − 2·N″_t,
  *    where N′ is [[Ewma]]'s 8-tap numerator and N″ its self-
  *    convolution — a FIXED 15-tap integer kernel over lags 2..16
  *    (K_m = c_m·2¹⁶⁻ᵐ, Σ K_m = 255²), generated programmatically on
  *    both engines. No recursive float fold anywhere.
  *
  * 2. FORECAST EVALUATION (Hyndman & Koehler 2006): per event type,
  *    MASE (seasonal-naive x_{t−24} error over naive x_{t−1} error)
  *    and per-method sMAPE over the hours where both baselines
  *    exist. Error sums are EXACT INTEGERS (|count − lagged count|);
  *    sMAPE terms are micro-quantized per row ([[KaplanMeier]]
  *    convention) so the per-type sums are integer.
  *
  * SCALE. Both collapse event volume with ONE partial agg to the
  * |types × hours| rollup ([[Events.qCusum]] contract); the dense
  * spine, lag windows and kernels are calendar-bounded. Both serve
  * live from the streaming hourly count store
  * ([[graft.streaming.EventStreams.doubleEwmaView]] /
  * `forecastEvalView`) — the rollup IS the store's state. */
object Forecast {

  /** Brown kernel: N″_t = Σ_{m=2..16} K_m·x_{t−m} with
    * K_m = c_m·2^(16−m), c_m = #{(j,k) ∈ [1,8]² : j+k = m}. */
  private[graft] val brownKernel: Seq[(Int, Long)] =
    (2 to 16).map { m =>
      val c = math.min(8, m - 1) - math.max(1, m - 8) + 1
      m -> c.toLong * (1L << (16 - m))
    }

  /** Minimum volume for the trend flag (the [[Ewma.minVolume]]
    * posture: a trend over single-digit counts is noise). */
  val trendMinNum = 255L * 10L

  // ---------------------------------------------------------------
  // 1. Brown double-EWMA level/trend/forecast
  // ---------------------------------------------------------------

  def doubleEwma(events: DataFrame): DataFrame =
    doubleEwmaOver(events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")))

  /** Per (event_type, hour) once 16 pre-hours exist: the observed
    * count, Brown level/trend (doubles off integer numerators), the
    * one-step forecast, and an integer-decided trend_up flag. */
  def doubleEwmaOver(hourly: DataFrame): DataFrame = {
    val span = hourly.groupBy("event_type")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val spine = span.select(col("event_type"),
      explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val dense = spine.join(hourly, Seq("event_type", "hour"), "left")
      .na.fill(0L, Seq("n"))
    val w = Window.partitionBy("event_type").orderBy("hour")
    val lagged = (1 to 16).foldLeft(dense) { (df, k) =>
      df.withColumn(s"l_$k", lag(col("n"), k).over(w))
    }
    val n1 = (1 to 8).map(k => col(s"l_$k") * (1L << (8 - k))).reduce(_ + _)
    val n2 = brownKernel.map { case (m, km) => col(s"l_$m") * km }
      .reduce(_ + _)
    lagged
      .filter(col("l_16").isNotNull)
      .withColumn("n1", n1).withColumn("n2", n2)
      .select(col("event_type"), col("hour"), col("n"),
        (col("n1").cast(DoubleType) / 255.0).as("s1"),
        (col("n2").cast(DoubleType) / 65025.0).as("s2"),
        // f = 3S' − 2S'' ; exact integer numerator over 255²
        ((lit(3L) * 255L * col("n1") - lit(2L) * col("n2"))
          .cast(DoubleType) / 65025.0).as("forecast"),
        (col("n1") * 255L > col("n2") &&
          col("n1") >= trendMinNum).cast(IntegerType).as("trend_up"))
  }

  def qDoubleEwma(spark: SparkSession, dir: String): DataFrame =
    doubleEwma(Tables(spark, dir, "events"))

  val qDoubleEwmaSql: String = {
    val lags = (1 to 16)
      .map(k => s"lag(n, $k) OVER w AS l_$k").mkString(",\n      |    ")
    val n1 = (1 to 8).map(k => s"l_$k * ${1L << (8 - k)}").mkString(" + ")
    val n2 = brownKernel.map { case (m, km) => s"l_$m * $km" }
      .mkString(" + ")
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
       |lagged AS (
       |  SELECT event_type, hour, n,
       |    $lags
       |  FROM dense
       |  WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
       |nums AS (
       |  SELECT event_type, hour, n,
       |    $n1 AS n1,
       |    $n2 AS n2
       |  FROM lagged WHERE l_16 IS NOT NULL)
       |SELECT event_type, hour, n,
       |  CAST(n1 AS DOUBLE) / 255.0 AS s1,
       |  CAST(n2 AS DOUBLE) / 65025.0 AS s2,
       |  CAST(3 * 255 * n1 - 2 * n2 AS DOUBLE) / 65025.0 AS forecast,
       |  CAST(n1 * 255 > n2 AND n1 >= $trendMinNum AS INTEGER)
       |    AS trend_up
       |FROM nums""".stripMargin
  }

  // ---------------------------------------------------------------
  // 2. MASE / sMAPE forecast evaluation
  // ---------------------------------------------------------------

  def forecastEval(events: DataFrame): DataFrame =
    forecastEvalOver(events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")))

  /** Per event type over hours where BOTH baselines exist:
    * (event_type, n_eval, sae_naive, sae_seasonal, mase_micro,
    *  smape_naive_micro, smape_seasonal_micro). */
  def forecastEvalOver(hourly: DataFrame): DataFrame = {
    val span = hourly.groupBy("event_type")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val spine = span.select(col("event_type"),
      explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val dense = spine.join(hourly, Seq("event_type", "hour"), "left")
      .na.fill(0L, Seq("n"))
    val w = Window.partitionBy("event_type").orderBy("hour")
    dense
      .withColumn("f1", lag(col("n"), 1).over(w))
      .withColumn("f24", lag(col("n"), 24).over(w))
      .filter(col("f24").isNotNull)
      .select(col("event_type"), col("n"), col("f1"), col("f24"),
        abs(col("n") - col("f1")).as("e1"),
        abs(col("n") - col("f24")).as("e24"),
        expr("""case when n + f1 = 0 then 0L else
               |cast(round(1000000.0 * 2.0 * abs(n - f1) / (n + f1))
               | as bigint) end""".stripMargin.replace("\n", " "))
          .as("sm1"),
        expr("""case when n + f24 = 0 then 0L else
               |cast(round(1000000.0 * 2.0 * abs(n - f24) / (n + f24))
               | as bigint) end""".stripMargin.replace("\n", " "))
          .as("sm24"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_eval"),
        sum("e1").as("sae_naive"), sum("e24").as("sae_seasonal"),
        sum("sm1").as("sm1"), sum("sm24").as("sm24"))
      .selectExpr("event_type", "n_eval", "sae_naive", "sae_seasonal",
        """case when sae_naive = 0 then 0L else
          |cast(round(1000000.0 * sae_seasonal / sae_naive) as bigint)
          |end as mase_micro""".stripMargin.replace("\n", " "),
        "cast(round(cast(sm1 as double) / n_eval) as bigint)"
          + " as smape_naive_micro",
        "cast(round(cast(sm24 as double) / n_eval) as bigint)"
          + " as smape_seasonal_micro")
      .orderBy("event_type")
  }

  def qForecastEval(spark: SparkSession, dir: String): DataFrame =
    forecastEval(Tables(spark, dir, "events"))

  val qForecastEvalSql: String =
    """WITH hourly AS MATERIALIZED (
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
      |lagged AS (
      |  SELECT event_type, n,
      |    lag(n, 1) OVER w AS f1, lag(n, 24) OVER w AS f24
      |  FROM dense
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
      |terms AS (
      |  SELECT event_type, n, f1, f24,
      |    ABS(n - f1) AS e1, ABS(n - f24) AS e24,
      |    CASE WHEN n + f1 = 0 THEN 0 ELSE
      |      CAST(ROUND(1000000.0 * 2.0 * ABS(n - f1) / (n + f1))
      |        AS BIGINT) END AS sm1,
      |    CASE WHEN n + f24 = 0 THEN 0 ELSE
      |      CAST(ROUND(1000000.0 * 2.0 * ABS(n - f24) / (n + f24))
      |        AS BIGINT) END AS sm24
      |  FROM lagged WHERE f24 IS NOT NULL),
      |agg AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_eval,
      |    CAST(SUM(e1) AS BIGINT) AS sae_naive,
      |    CAST(SUM(e24) AS BIGINT) AS sae_seasonal,
      |    CAST(SUM(sm1) AS BIGINT) AS sm1,
      |    CAST(SUM(sm24) AS BIGINT) AS sm24
      |  FROM terms GROUP BY event_type)
      |SELECT event_type, n_eval, sae_naive, sae_seasonal,
      |  CASE WHEN sae_naive = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * sae_seasonal / sae_naive) AS BIGINT)
      |    END AS mase_micro,
      |  CAST(ROUND(CAST(sm1 AS DOUBLE) / n_eval) AS BIGINT)
      |    AS smape_naive_micro,
      |  CAST(ROUND(CAST(sm24 AS DOUBLE) / n_eval) AS BIGINT)
      |    AS smape_seasonal_micro
      |FROM agg
      |ORDER BY event_type""".stripMargin
}
