package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** AUTOCORRELATION FUNCTION (ACF) of the hourly event-count series —
  * the diagnostic that tells a monitoring stack WHICH seasonality its
  * models should difference away (a daily cycle shows as a peak at lag
  * 24, weekly at 168) and whether residual series are white noise. The
  * fifth member of the statistics family (spike ratio, CUSUM, robust-z,
  * G-test mix drift — rate / trend / point / mix) — this one measures
  * MEMORY.
  *
  * Scale shape, same contract as [[Events.qRobustZ]] and the
  * seasonal-naive MASE: ONE partial-agg scan collapses the corpus to
  * the |hours| count rollup; a dense spine (missing hours are true
  * zeros, not absent rows) is generated from the rollup's min/max;
  * the 24 lag columns ride ONE window pass over that bounded rollup
  * (single-partition by construction — |hours| is calendar-bounded:
  * a century is <10⁶ rows — so the "window over unpartitioned data"
  * smell is a non-issue and documented); per-lag Pearson terms are
  * then a 24-group partial agg over |hours|×24 stacked rows.
  *
  * Float determinism: x and y are exact longs; the six per-lag sums
  * (n, Σx, Σy, Σxy, Σx², Σy²) stay in integer arithmetic and only the
  * final r = (nΣxy−ΣxΣy)/√((nΣx²−Σx²ₜ)(nΣy²−Σy²ₜ)) evaluates in
  * doubles — both engines build the same tree from the same exact
  * longs (the [[MixDrift]] posture). The oracle formulates lag via a
  * spine SELF-JOIN on h−ℓ (no window at all) — a genuinely independent
  * derivation of the same pairs. */
object Autocorr {

  val maxLag = 24

  /** ACF at lags 1..maxLag over a dense hourly series derived from
    * `events.ts`: (lag, n, r). n = pair count at that lag; r = Pearson
    * correlation between the series and its lag-ℓ shift. */
  def qAcf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val counts = ev
      .select(expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
    acf(counts)
  }

  /** ACF over an explicit integer series rollup `counts(h, c)` —
    * densified to a spine over [min h, max h] with zeros filled. */
  def acf(counts: DataFrame, maxL: Int = maxLag): DataFrame = {
    val bounds = counts.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
    val spine = bounds
      .select(explode(sequence(col("mn"), col("mx"))).as("h"))
      .join(counts, Seq("h"), "left")
      .na.fill(0L, Seq("c"))
    val w = Window.orderBy(col("h"))
    val lagged = (1 to maxL).foldLeft(spine) { (df, l) =>
      df.withColumn(s"y_$l", lag(col("c"), l).over(w))
    }
    val stackArms = (1 to maxL)
      .map(l => s"${l}L, c, y_$l").mkString(", ")
    lagged
      .selectExpr(s"stack($maxL, $stackArms)")
      .toDF("lag", "x", "y")
      .filter(col("y").isNotNull)
      .groupBy("lag")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y") * col("y")).as("sy2"))
      .withColumn("r",
        (col("n").cast(DoubleType) * col("sxy").cast(DoubleType)
          - col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
          sqrt((col("n").cast(DoubleType) * col("sx2").cast(DoubleType)
            - col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) *
            (col("n").cast(DoubleType) * col("sy2").cast(DoubleType)
              - col("sy").cast(DoubleType) * col("sy").cast(DoubleType))))
      .select("lag", "n", "r")
  }

  /** Spine self-join formulation — pairs (t, t−ℓ) come from an
    * equi-join on shifted hour index, not a window. */
  val qAcfSql: String =
    s"""WITH counts AS (
       |  SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM counts),
       |spine AS (
       |  SELECT g.h, COALESCE(counts.c, 0) AS c
       |  FROM (SELECT UNNEST(generate_series((SELECT mn FROM b),
       |                                      (SELECT mx FROM b))) AS h) g
       |  LEFT JOIN counts ON counts.h = g.h),
       |lags AS (SELECT UNNEST(generate_series(1, $maxLag)) AS lag),
       |pairs AS (
       |  SELECT lags.lag, a.c AS x, p.c AS y
       |  FROM spine a CROSS JOIN lags
       |  JOIN spine p ON p.h = a.h - lags.lag),
       |s AS (
       |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy,
       |    CAST(SUM(x * x) AS BIGINT) AS sx2,
       |    CAST(SUM(y * y) AS BIGINT) AS sy2
       |  FROM pairs GROUP BY 1)
       |SELECT CAST(lag AS BIGINT) AS lag, n,
       |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |  / sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
       |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |         * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
       |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
       |FROM s""".stripMargin
}
