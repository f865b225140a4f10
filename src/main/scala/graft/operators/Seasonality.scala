package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** SEASONALITY STRENGTH (one-way ANOVA η²) — how much of each event
  * type's hourly-count variance the hour-of-day profile explains. The
  * decomposition diagnostic that closes the time-series loop: ACF says
  * WHETHER there is memory, seasonal-naive says how forecastable the
  * cycle is, this says HOW MUCH of the variance IS the cycle (and by
  * complement, how much is left for anomaly monitors to watch).
  *
  * η² = SS_between/SS_total over hour-of-day groups, computed from the
  * classic sufficient-statistics identities so nothing order-dependent
  * exists: SS_total = Σx² − S²/N and SS_between = Σ_g S_g²/n_g − S²/N,
  * where every S_g, n_g, Σx² is an exact long off ONE partial-agg pass
  * over the dense hourly spine (gaps are true zero observations —
  * omitting them would overstate seasonality on sparse types). The
  * divisions assemble in doubles from exact longs, both engines build
  * the same tree ([[MixDrift]] posture).
  *
  * Plan: corpus → |types × hours| rollup (one shuffle), spine from the
  * per-type span, then a |types × 24| group agg and a |types| agg —
  * nothing after the first aggregation touches event volume. */
object Seasonality {

  /** Per event type: observation count, hour-of-day variance share
    * η² ∈ [0,1], and the peak profile hour: (event_type, n_hours,
    * eta2, peak_hod). */
  def seasonality(events: DataFrame): DataFrame =
    seasonalityOverHourly(events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")))

  /** The same ANOVA over an ALREADY-ROLLED-UP (event_type, hour, n)
    * table — the shared definition the streaming hourly count store
    * serves through
    * [[graft.streaming.EventStreams.seasonalityView]]. */
  def seasonalityOverHourly(hourly: DataFrame): DataFrame = {
    val span = hourly.groupBy("event_type")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val dense = span
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      .join(hourly, Seq("event_type", "hour"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("hod", hour(col("hour")).cast(LongType))
    // squared statistics in DECIMAL(38,0) (HUGEINT in the oracle): at
    // 100 TB per-type totals s ~ 1e12 make s², sg², Σn² overflow Long
    // — Spark wraps silently, DuckDB errors (CorrMatrix pattern)
    val dec = DecimalType(38, 0)
    val byHod = dense.groupBy("event_type", "hod")
      .agg(count(lit(1)).as("ng"), sum(col("n")).as("sg"))
    val tot = dense.groupBy("event_type")
      .agg(count(lit(1)).as("nh"), sum(col("n")).as("s"),
        sum(col("n").cast(dec) * col("n")).cast(dec).as("ss"))
    val between = byHod
      .withColumn("term",
        (col("sg").cast(dec) * col("sg")).cast(DoubleType) /
          col("ng").cast(DoubleType))
      .groupBy("event_type")
      .agg(sum(col("term")).as("sb"),
        max(struct((col("sg").cast(DoubleType) / col("ng").cast(DoubleType))
          .as("mean"), (-col("hod")).as("nh0"))).as("pk"))
    tot.join(between, "event_type")
      .select(col("event_type"), col("nh").as("n_hours"),
        // eta2 = SS_between/SS_total, both in (x − S²/N) form; a
        // constant series (SS_total = 0, detected EXACTLY via the
        // integer identity ss·nh = s²) scores 0, not NaN
        when(col("ss") * col("nh") === col("s").cast(dec) * col("s"), 0.0)
          .otherwise(
            (col("sb") - (col("s").cast(dec) * col("s")).cast(DoubleType) /
              col("nh").cast(DoubleType)) /
              (col("ss").cast(DoubleType) - (col("s").cast(dec) * col("s"))
                .cast(DoubleType) / col("nh").cast(DoubleType)))
          .as("eta2"),
        (-col("pk.nh0")).as("peak_hod"))
  }

  def qSeasonality(spark: SparkSession, dir: String): DataFrame =
    seasonality(Tables(spark, dir, "events"))

  val qSeasonalitySql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT event_type, min(hour) AS h0, max(hour) AS h1
      |  FROM hourly GROUP BY 1),
      |dense AS (
      |  SELECT s.event_type, g.hour, CAST(coalesce(h.n, 0) AS BIGINT) AS n,
      |    CAST(EXTRACT(hour FROM g.hour) AS BIGINT) AS hod
      |  FROM span s
      |  CROSS JOIN UNNEST(generate_series(s.h0, s.h1, INTERVAL 1 HOUR))
      |    AS g(hour)
      |  LEFT JOIN hourly h
      |    ON h.event_type = s.event_type AND h.hour = g.hour),
      |byhod AS (
      |  SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS ng,
      |    CAST(SUM(n) AS BIGINT) AS sg
      |  FROM dense GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nh,
      |    CAST(SUM(n) AS BIGINT) AS s,
      |    CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS ss
      |  FROM dense GROUP BY 1),
      |btw AS (
      |  SELECT event_type,
      |    SUM(CAST(CAST(sg AS HUGEINT) * sg AS DOUBLE)
      |        / CAST(ng AS DOUBLE)) AS sb,
      |    MAX({'mean': CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE),
      |         'nh0': -hod}) AS pk
      |  FROM byhod GROUP BY 1)
      |SELECT t.event_type, t.nh AS n_hours,
      |  CASE WHEN t.ss * t.nh = CAST(t.s AS HUGEINT) * t.s THEN 0.0
      |    ELSE (b.sb - CAST(CAST(t.s AS HUGEINT) * t.s AS DOUBLE)
      |            / CAST(t.nh AS DOUBLE))
      |      / (CAST(t.ss AS DOUBLE)
      |         - CAST(CAST(t.s AS HUGEINT) * t.s AS DOUBLE)
      |           / CAST(t.nh AS DOUBLE))
      |  END AS eta2,
      |  CAST(-(b.pk).nh0 AS BIGINT) AS peak_hod
      |FROM tot t JOIN btw b ON t.event_type = b.event_type""".stripMargin
}
