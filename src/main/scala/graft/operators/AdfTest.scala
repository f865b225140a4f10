package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** AUGMENTED DICKEY-FULLER UNIT-ROOT TEST (Dickey & Fuller 1979;
  * one augmentation lag) per event type — the stationarity gate the
  * trend/changepoint/forecast family implicitly assumes: regress
  *
  *   Δx_t = α + β·x_{t−1} + γ·Δx_{t−1}
  *
  * on the dense hourly series and test β = 0 (unit root) against the
  * DF fence τ = −2.86 (5%, constant-only). β significantly negative
  * = mean-reverting (model the level); β ≈ 0 = integrated (model the
  * DIFFERENCES, or the [[Trend]] OLS slope is spurious regression).
  *
  * DETERMINISM — the [[TimeSeriesPair.qGranger]] contract verbatim:
  * counts are exact integers, the ten sufficient statistics are
  * integer sums, and β / its t ride ONE shared expression text
  * (Cramer's rule on the 3×3 normal equations; SE(β) from the exact
  * cofactor (n·Σd1² − (Σd1)²)/D) — residuals never materialize.
  * Degenerate determinants pin to 0 with the counts visible.
  *
  * SCALE. One partial agg to the |types × hours| rollup; the spine,
  * lags and the 1-row-per-type statistics are calendar-bounded.
  * Serves live from the hourly count store via
  * [[graft.streaming.EventStreams.adfView]]. */
object AdfTest {

  /** DF 5% critical value (constant, n → ∞): −2.86. */
  val dfCritMicro = -2860000L

  def adfTest(events: DataFrame): DataFrame =
    adfOverHourly(events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")))

  def adfOverHourly(hourly: DataFrame): DataFrame = {
    val span = hourly.groupBy("event_type")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val spine = span.select(col("event_type"),
      explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val dense = spine.join(hourly, Seq("event_type", "hour"), "left")
      .na.fill(0L, Seq("n"))
    val w = Window.partitionBy("event_type").orderBy("hour")
    dense
      .withColumn("x1", lag(col("n"), 1).over(w))
      .withColumn("x2", lag(col("n"), 2).over(w))
      .filter(col("x2").isNotNull)
      .select(col("event_type"),
        (col("n") - col("x1")).as("d"),
        col("x1").as("z"),
        (col("x1") - col("x2")).as("d1"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("d").as("sd"), sum("z").as("sz"), sum("d1").as("sd1"),
        sum(col("d") * col("d")).as("sdd"),
        sum(col("d") * col("z")).as("sdz"),
        sum(col("d") * col("d1")).as("sdd1"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("z") * col("d1")).as("szd1"),
        sum(col("d1") * col("d1")).as("sd1d1"))
      .selectExpr(Seq("event_type", "n") ++ outExprs: _*)
      .withColumn("stationary", col("t_micro") <= dfCritMicro &&
        col("t_micro") =!= 0L)
      .orderBy("event_type")
  }

  /** Shared double-channel expressions (dialect-neutral). */
  private def outExprs: Seq[String] = {
    val n = "cast(n as double)"
    val sd = "cast(sd as double)"; val sz = "cast(sz as double)"
    val sd1 = "cast(sd1 as double)"; val sdd = "cast(sdd as double)"
    val sdz = "cast(sdz as double)"; val sdd1 = "cast(sdd1 as double)"
    val szz = "cast(szz as double)"; val szd1 = "cast(szd1 as double)"
    val sd1d1 = "cast(sd1d1 as double)"
    val det = s"""($n * ($szz * $sd1d1 - $szd1 * $szd1)
                 | - $sz * ($sz * $sd1d1 - $szd1 * $sd1)
                 | + $sd1 * ($sz * $szd1 - $szz * $sd1))"""
      .stripMargin.replace("\n", " ")
    val dA = s"""($sd * ($szz * $sd1d1 - $szd1 * $szd1)
                | - $sz * ($sdz * $sd1d1 - $szd1 * $sdd1)
                | + $sd1 * ($sdz * $szd1 - $szz * $sdd1))"""
      .stripMargin.replace("\n", " ")
    val dB = s"""($n * ($sdz * $sd1d1 - $szd1 * $sdd1)
                | - $sd * ($sz * $sd1d1 - $szd1 * $sd1)
                | + $sd1 * ($sz * $sdd1 - $sdz * $sd1))"""
      .stripMargin.replace("\n", " ")
    val dC = s"""($n * ($szz * $sdd1 - $sdz * $szd1)
                | - $sz * ($sz * $sdd1 - $sdz * $sd1)
                | + $sd * ($sz * $szd1 - $szz * $sd1))"""
      .stripMargin.replace("\n", " ")
    val beta = s"($dB / $det)"
    val alpha = s"($dA / $det)"
    val gamma = s"($dC / $det)"
    val rss =
      s"($sdd - $alpha * $sd - $beta * $sdz - $gamma * $sdd1)"
    val cof = s"($n * $sd1d1 - $sd1 * $sd1)"
    val guard = s"n <= 3 or abs($det) < 1e-9 or $cof <= 0.0" +
      s" or $rss <= 0.0"
    Seq(
      s"""case when $guard then 0
         | else cast(round(1000000.0 * $beta) as bigint) end
         | as beta_micro""".stripMargin.replace("\n", " "),
      s"""case when $guard then 0
         | else cast(round(1000000.0 * $beta
         |   / sqrt($rss / ($n - 3.0) * $cof / $det)) as bigint) end
         | as t_micro""".stripMargin.replace("\n", " "))
  }

  def qAdfTest(spark: SparkSession, dir: String): DataFrame =
    adfTest(Tables(spark, dir, "events"))

  val qAdfTestSql: String =
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
       |  SELECT event_type,
       |    n - lag(n, 1) OVER w AS d,
       |    lag(n, 1) OVER w AS z,
       |    lag(n, 1) OVER w - lag(n, 2) OVER w AS d1
       |  FROM dense
       |  WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
       |agg AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(z) AS BIGINT) AS sz,
       |    CAST(SUM(d1) AS BIGINT) AS sd1,
       |    CAST(SUM(d * d) AS BIGINT) AS sdd,
       |    CAST(SUM(d * z) AS BIGINT) AS sdz,
       |    CAST(SUM(d * d1) AS BIGINT) AS sdd1,
       |    CAST(SUM(z * z) AS BIGINT) AS szz,
       |    CAST(SUM(z * d1) AS BIGINT) AS szd1,
       |    CAST(SUM(d1 * d1) AS BIGINT) AS sd1d1
       |  FROM lagged WHERE d1 IS NOT NULL GROUP BY event_type)
       |SELECT event_type, n,
       |  ${outExprs.mkString(",\n       |  ")},
       |  (${outExprs(1).replaceFirst(" as t_micro$", "")})
       |    <= $dfCritMicro
       |  AND (${outExprs(1).replaceFirst(" as t_micro$", "")}) <> 0
       |    AS stationary
       |FROM agg
       |ORDER BY event_type""".stripMargin
}
