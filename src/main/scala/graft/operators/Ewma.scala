package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** EWMA LEVEL MONITOR — exponentially-weighted moving-average baseline
  * per event type, the sixth member of the monitoring family (spike
  * ratio, CUSUM trend, robust-z point, G-test mix, ACF memory — this
  * one tracks LEVEL with geometric decay, the classic EWMA control
  * chart of Roberts 1959).
  *
  * Float-determinism posture: a textbook EWMA is a recursive float
  * fold (order-dependent, not oracle-portable), so the engine uses the
  * FINITE-WINDOW form with integer power-of-two weights: over the 8
  * hours before t, baseline numerator N_t = Σ_{k=1..8} 2^(8−k)·c_{t−k}
  * — an EXACT long (weights 128,64,…,1; denominator 255) that both
  * engines assemble identically; the served ewma = N/255 is one double
  * division, and the ALARM comparison stays entirely in integers
  * (255·3·c_t > 3·N spelled as c·255 > N·3): no float ever decides a
  * row. The window's tail weight (beyond 8 lags) is < 0.4% of the
  * mass — the truncation is the determinism price, stated rather than
  * hidden.
  *
  * Plan shape — the [[Events.qCusum]] contract: ONE partial agg
  * collapses event volume to the |types × hours| rollup; the dense
  * spine generates from the per-type span (sequence over a |types|-row
  * frame); the 8 lags ride one type-partitioned window over the
  * rollup. Nothing downstream of the first aggregation ever touches
  * event volume. */
object Ewma {

  val ewmaWindow = 8
  val spikeFactor = 3L
  val minVolume = 10L

  /** Per (event_type, hour): count, the pre-hour EWMA baseline, and a
    * spike flag (count > spikeFactor × baseline, min-volume floored).
    * Rows emit only once the full 8-hour window exists. */
  def ewma(events: DataFrame): DataFrame =
    ewmaOver(events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")))

  /** The statistic over a PRE-AGGREGATED hourly rollup
    * `hourly(event_type, hour, n)` — the form the streaming hourly
    * count store serves directly ([[Events.anomalyOver]] precedent). */
  def ewmaOver(hourly: DataFrame): DataFrame = {
    val span = hourly.groupBy("event_type")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val spine = span.select(col("event_type"),
      explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val dense = spine.join(hourly, Seq("event_type", "hour"), "left")
      .na.fill(0L, Seq("n"))
    val w = Window.partitionBy("event_type").orderBy("hour")
    val lagged = (1 to ewmaWindow).foldLeft(dense) { (df, k) =>
      df.withColumn(s"l_$k", lag(col("n"), k).over(w))
    }
    val num = (1 to ewmaWindow)
      .map(k => col(s"l_$k") * (1L << (ewmaWindow - k)))
      .reduce(_ + _)
    lagged
      .filter(col(s"l_$ewmaWindow").isNotNull)
      .withColumn("num", num)
      .select(col("event_type"), col("hour"), col("n"),
        (col("num").cast(DoubleType) / 255.0).as("ewma"),
        (col("n") * 255L > col("num") * spikeFactor &&
          col("n") >= minVolume).cast(IntegerType).as("spike"))
  }

  def qEwma(spark: SparkSession, dir: String): DataFrame =
    ewma(Tables(spark, dir, "events"))

  val qEwmaSql: String = {
    val lags = (1 to ewmaWindow)
      .map(k => s"lag(n, $k) OVER w AS l_$k").mkString(",\n      |    ")
    val num = (1 to ewmaWindow)
      .map(k => s"l_$k * ${1L << (ewmaWindow - k)}").mkString(" + ")
    s"""WITH hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS hour,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |span AS (
       |  SELECT event_type, min(hour) AS h0, max(hour) AS h1
       |  FROM hourly GROUP BY 1),
       |spine AS (
       |  SELECT event_type,
       |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
       |  FROM span),
       |dense AS (
       |  SELECT s.event_type, s.hour, CAST(coalesce(h.n, 0) AS BIGINT) AS n
       |  FROM spine s LEFT JOIN hourly h
       |    ON s.event_type = h.event_type AND s.hour = h.hour),
       |lagged AS (
       |  SELECT event_type, hour, n,
       |    $lags
       |  FROM dense
       |  WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
       |scored AS (
       |  SELECT event_type, hour, n, CAST($num AS BIGINT) AS num
       |  FROM lagged WHERE l_$ewmaWindow IS NOT NULL)
       |SELECT event_type, hour, n,
       |  CAST(num AS DOUBLE) / 255.0 AS ewma,
       |  CAST(n * 255 > num * $spikeFactor AND n >= $minVolume
       |    AS INTEGER) AS spike
       |FROM scored""".stripMargin
  }
}
