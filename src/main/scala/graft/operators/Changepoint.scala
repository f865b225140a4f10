package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** CHANGEPOINT LOCALIZATION (at-most-one-change least squares — the
  * binary-segmentation first split) — WHERE the level shifted. The
  * monitoring family's missing coordinate: [[Events.cusum]] says a
  * sustained drift HAPPENED, [[Trend]] says how fast the level moves,
  * this names the hour the mean changed, the before/after levels, and
  * how much of the series' variance the single split explains — the
  * first question an on-call engineer asks ("when did it start?") and
  * the recursion step every binary-segmentation changepoint algorithm
  * (Scott & Knott 1974; Killick et al. 2012 as the optimal-partition
  * successor) is built from.
  *
  * Least-squares AMOC has a closed form over prefix sums: splitting
  * the per-type hourly series y_1..y_n after position k reduces the
  * total sum of squares by
  *   gain(k) = S_k²/k + (S−S_k)²/(n−k) − S²/n = a_k² / (n·k·(n−k)),
  *   a_k = n·S_k − k·S
  * so the best split is argmax_k a_k²/(k·(n−k)) — every a_k an exact
  * long off ONE cumulative-sum window over the dense hourly spine
  * ([[Trend]]'s exactness posture: gaps are true zeros; S, Σy², n
  * exact longs). The argmax key assembles in doubles from exact longs
  * with an integer tiebreak (earliest k), so both engines pick the
  * same row ([[Seasonality]]'s struct-max posture); the reported
  * gain_share = a²/(k·(n−k)·(n·Σy² − S²)) is the split's η² — a
  * constant series is detected EXACTLY via the integer identity
  * ss·n = S² and scores 0 rather than NaN.
  *
  * Plan: corpus → |types × hours| rollup (one shuffle) → spine → one
  * type-partitioned cumsum window → a |types|-row struct-max agg;
  * nothing after the first aggregation touches event volume. Types
  * with a single spine hour have no valid split and are dropped. */
object Changepoint {

  /** Per event type: (event_type, n_hours, cp_hour, gain_share,
    * mean_before, mean_after) — cp_hour is the FIRST hour of the
    * after-segment; gain_share ∈ [0,1] is the variance share the
    * one-split step function explains. */
  def changepoint(events: DataFrame): DataFrame =
    changepointOverHourly(events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("y")))

  /** The same localization over an ALREADY-ROLLED-UP
    * (event_type, hour, y) table — the shared definition the
    * streaming hourly count store serves through
    * [[graft.streaming.EventStreams.changepointView]]. */
  def changepointOverHourly(hourly: DataFrame): DataFrame = {
    val span = hourly.groupBy("event_type")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val dense = span
      .select(col("event_type"), col("h0"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      .join(hourly, Seq("event_type", "hour"), "left")
      .na.fill(0L, Seq("y"))
      .withColumn("x",
        expr("(unix_micros(hour) - unix_micros(h0)) div 3600000000"))
    val w = Window.partitionBy("event_type").orderBy("x")
    val pre = dense.withColumn("sk", sum(col("y")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // squared/product sufficient statistics in DECIMAL(38,0) (HUGEINT
    // in the oracle): at the 100 TB posture per-type totals s ~ 1e12
    // make s·s and Σy² overflow Long, where Spark wraps silently but
    // DuckDB errors — the CorrMatrix exactness pattern
    val dec = DecimalType(38, 0)
    val tot = dense.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
        sum(col("y").cast(dec) * col("y")).cast(dec).as("ss"),
        min(col("h0")).as("h0"))
    // candidate splits k = x+1 ∈ [1, n−1]; a_k = n·S_k − k·S exact
    val k = col("x") + 1L
    val cand = pre.join(broadcast(tot.drop("h0")), "event_type")
      .filter(k < col("n"))
      .withColumn("a",
        (col("n").cast(dec) * col("sk") - k * col("s").cast(dec)).cast(dec))
      // a² would exceed 38 digits at extreme scale; g is consumed as a
      // double argmax key anyway, so square AFTER the double cast —
      // both engines run the identical IEEE expression
      .withColumn("g",
        col("a").cast(DoubleType) * col("a").cast(DoubleType) /
        (k * (col("n") - k)).cast(DoubleType))
    val pick = cand.groupBy("event_type")
      .agg(max(struct(col("g"), (-k).as("nk"), col("sk"))).as("pk"))
    val kk = -col("pk.nk")
    pick.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("n").as("n_hours"),
        timestamp_micros(unix_micros(col("h0")) + kk * 3600000000L)
          .as("cp_hour"),
        // gain(k) = g/n and SS_total = (n·Σy² − S²)/n, so the share's
        // two n factors cancel: share = g / (n·Σy² − S²)
        when(col("ss") * col("n") === col("s").cast(dec) * col("s"), 0.0)
          .otherwise(col("pk.g") /
            (col("n") * col("ss") - col("s").cast(dec) * col("s"))
              .cast(DoubleType))
          .as("gain_share"),
        (col("pk.sk").cast(DoubleType) / kk.cast(DoubleType))
          .as("mean_before"),
        ((col("s") - col("pk.sk")).cast(DoubleType) /
          (col("n") - kk).cast(DoubleType)).as("mean_after"))
  }

  def qChangepoint(spark: SparkSession, dir: String): DataFrame =
    changepoint(Tables(spark, dir, "events"))

  val qChangepointSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT event_type, min(hour) AS h0, max(hour) AS h1
      |  FROM hourly GROUP BY 1),
      |dense AS (
      |  SELECT s.event_type, s.h0,
      |    CAST((epoch_us(g.hour) - epoch_us(s.h0)) // 3600000000
      |      AS BIGINT) AS x,
      |    CAST(coalesce(h.y, 0) AS BIGINT) AS y
      |  FROM span s
      |  CROSS JOIN UNNEST(generate_series(s.h0, s.h1, INTERVAL 1 HOUR))
      |    AS g(hour)
      |  LEFT JOIN hourly h
      |    ON h.event_type = s.event_type AND h.hour = g.hour),
      |pre AS (
      |  SELECT event_type, x,
      |    CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS sk
      |  FROM dense),
      |tot AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS s,
      |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS ss,
      |    min(h0) AS h0
      |  FROM dense GROUP BY 1),
      |cand AS (
      |  SELECT p.event_type, p.x + 1 AS k, p.sk, t.n,
      |    CAST(t.n AS HUGEINT) * p.sk - (p.x + 1) * CAST(t.s AS HUGEINT) AS a
      |  FROM pre p JOIN tot t ON p.event_type = t.event_type
      |  WHERE p.x + 1 < t.n),
      |pick AS (
      |  SELECT event_type,
      |    MAX({'g': CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
      |           / CAST(k * (n - k) AS DOUBLE),
      |         'nk': -k, 'sk': sk}) AS pk
      |  FROM cand GROUP BY 1)
      |SELECT t.event_type, t.n AS n_hours,
      |  make_timestamp(epoch_us(t.h0) + (-(p.pk).nk) * 3600000000)
      |    AS cp_hour,
      |  CASE WHEN t.ss * t.n = CAST(t.s AS HUGEINT) * t.s THEN 0.0
      |    ELSE (p.pk).g
      |         / CAST(t.n * t.ss - CAST(t.s AS HUGEINT) * t.s AS DOUBLE)
      |    END AS gain_share,
      |  CAST((p.pk).sk AS DOUBLE) / CAST(-(p.pk).nk AS DOUBLE)
      |    AS mean_before,
      |  CAST(t.s - (p.pk).sk AS DOUBLE) / CAST(t.n - (-(p.pk).nk) AS DOUBLE)
      |    AS mean_after
      |FROM tot t JOIN pick p ON t.event_type = p.event_type""".stripMargin
}
