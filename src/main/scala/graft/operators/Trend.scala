package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** LINEAR TREND (per-group OLS over time) — the "fit a line" primitive
  * the monitoring family reads its direction from: per event type, the
  * least-squares slope/intercept/R² of hourly volume against the hour
  * index. CUSUM says a sustained shift HAPPENED; the trend says how
  * fast the level is moving and how linear the movement is — capacity
  * forecasting's first regression.
  *
  * Exactness ([[CorrMatrix]]'s posture): x is the 0-based hour index
  * on the dense per-type spine (gaps are real zeros), y the hourly
  * count — both exact longs; the five sufficient statistics (n, Σx,
  * Σy, Σxy, Σx²... Σy² for R²) accumulate in integer arithmetic off
  * ONE pass over the |types × hours| rollup, and slope/intercept/R²
  * assemble in doubles from exact longs. Spark's REGR_SLOPE is a
  * float fold — not oracle-portable; this is. A constant series (zero
  * y-variance) gets R² = 1 exactly via the integer identity — a flat
  * line fits flatness perfectly — and a single-point series degrades
  * to slope 0.
  *
  * Plan: corpus → hourly rollup (one shuffle) → spine → per-type
  * window for the hour index — all |types × hours|-sized; the OLS is
  * a |types|-row aggregate. */
object Trend {

  /** Per event type: (event_type, n_hours, slope, intercept, r2) —
    * slope in events/hour over the type's dense hourly spine. */
  def trend(events: DataFrame): DataFrame =
    trendOverHourly(events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("y")))

  /** The same OLS over an ALREADY-ROLLED-UP (event_type, hour, y)
    * table — the shared definition the streaming hourly count store
    * serves through ([[graft.streaming.EventStreams.trendView]]),
    * |types × hours| input rows, never events. */
  def trendOverHourly(hourly: DataFrame): DataFrame = {
    val span = hourly.groupBy("event_type")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val dense = span
      .select(col("event_type"), col("h0"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      .join(hourly, Seq("event_type", "hour"), "left")
      .na.fill(0L, Seq("y"))
      // exact 0-based index from the timestamps — no window needed
      .withColumn("x",
        expr("(unix_micros(hour) - unix_micros(h0)) div 3600000000"))
    // y-bearing product statistics in DECIMAL(38,0) (HUGEINT in the
    // oracle): at 100 TB per-hour counts ~1e8 make Σy² (and Σxy)
    // overflow Long — Spark wraps silently, DuckDB errors; x-only
    // terms stay Long (x is a bounded hour index). CorrMatrix pattern.
    val dec = DecimalType(38, 0)
    val s = dense.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(dec) * col("y")).cast(dec).as("sxy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y").cast(dec) * col("y")).cast(dec).as("sy2"))
    val nD = col("n").cast(DoubleType)
    val vxN = nD * col("sx2").cast(DoubleType) -
      col("sx").cast(DoubleType) * col("sx").cast(DoubleType)
    val vyN = nD * col("sy2").cast(DoubleType) -
      col("sy").cast(DoubleType) * col("sy").cast(DoubleType)
    val covN = nD * col("sxy").cast(DoubleType) -
      col("sx").cast(DoubleType) * col("sy").cast(DoubleType)
    s.select(col("event_type"), col("n").as("n_hours"),
      when(col("n") === 1L, 0.0).otherwise(covN / vxN).as("slope"),
      when(col("n") === 1L, col("sy").cast(DoubleType))
        .otherwise((col("sy").cast(DoubleType) -
          (covN / vxN) * col("sx").cast(DoubleType)) / nD).as("intercept"),
      // R² = cov²/(varX·varY); constant y ⇒ 1 (exact integer test)
      when(col("sy2") * col("n") === col("sy").cast(dec) * col("sy"), 1.0)
        .otherwise(covN * covN / (vxN * vyN)).as("r2"))
  }

  def qTrend(spark: SparkSession, dir: String): DataFrame =
    trend(Tables(spark, dir, "events"))

  val qTrendSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT event_type, min(hour) AS h0, max(hour) AS h1
      |  FROM hourly GROUP BY 1),
      |dense AS (
      |  SELECT s.event_type,
      |    CAST((epoch_us(g.hour) - epoch_us(s.h0)) // 3600000000
      |      AS BIGINT) AS x,
      |    CAST(coalesce(h.y, 0) AS BIGINT) AS y
      |  FROM span s
      |  CROSS JOIN UNNEST(generate_series(s.h0, s.h1, INTERVAL 1 HOUR))
      |    AS g(hour)
      |  LEFT JOIN hourly h
      |    ON h.event_type = s.event_type AND h.hour = g.hour),
      |s AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sx2,
      |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS sy2
      |  FROM dense GROUP BY 1)
      |SELECT event_type, n AS n_hours,
      |  CASE WHEN n = 1 THEN 0.0
      |    ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |         / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS slope,
      |  CASE WHEN n = 1 THEN CAST(sy AS DOUBLE)
      |    ELSE (CAST(sy AS DOUBLE)
      |          - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |             / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
      |                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END AS intercept,
      |  CASE WHEN sy2 * n = CAST(sy AS HUGEINT) * sy THEN 1.0
      |    ELSE ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |          * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
      |         / ((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |            * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
      |               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS r2
      |FROM s""".stripMargin
}
