package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** PAIRED-SERIES DIAGNOSTICS over the dense hourly spine — the
  * two-series companions to [[Autocorr]]'s single-series memory
  * readout:
  *
  *  - CROSS-CORRELATION FUNCTION (q_xcorr): Pearson r between the
  *    click series x_t and the purchase series y_{t+ℓ} at lags
  *    ℓ ∈ [−12, 12] — the "does engagement LEAD revenue, and by how
  *    many hours?" readout (peak at positive ℓ = x leads y).
  *  - GRANGER-STYLE PREDICTIVE TEST (q_granger; Granger 1969): does
  *    lagged x improve the AR(1) forecast of y? F = (RSS_r − RSS_f)·
  *    (n−3)/RSS_f comparing y_t ~ 1 + y_{t−1} against
  *    y_t ~ 1 + y_{t−1} + x_{t−1}, with the F(1,·) large-sample
  *    critical value shared with [[AbTest.chi2CritMicro]] (F(1,ν) →
  *    χ²₁ as ν grows; ν = n−3 is calendar-sized here). Predictive
  *    causality in Granger's sense, not counterfactual causality —
  *    named and documented as such.
  *
  * Float determinism: both statistics evaluate doubles ONLY at the
  * last step, from exact integer sufficient statistics (the
  * [[Autocorr]]/[[MixDrift]] posture). The Granger OLS never
  * materializes residuals: both RSS values come from the closed-form
  * identity RSS = Σy² − β·(XᵀY) with β solved by Cramer's rule on the
  * 2×2/3×3 normal equations — every determinant a polynomial in the
  * same exact longs, mirrored token for token by the oracle.
  *
  * Scale shape: the dense-spine pattern's two corpus passes (the
  * bounds probe + the (hour, type) partial agg the spine joins back
  * to — the [[Autocorr]] shape, plan-asserted ≤ 2 in
  * PlanAuditR14Spec); the spine is calendar-bounded (a century < 10⁶
  * rows — the documented single-partition-window exemption), so lag
  * windows, stacks and the 1-row sufficient statistics are all
  * bounded work. */
object TimeSeriesPair {

  val xcorrMaxLag = 12

  /** F saturation sentinel (micro) for a perfect full-model fit. */
  val fSatMicro = 999999999999L

  /** Dense (h, x, y) spine from an (event_type, h, n) hourly rollup —
    * the shared definition the batch queries AND the hourly-count-
    * store views ([[graft.streaming.EventStreams.xcorrView]]/
    * [[graft.streaming.EventStreams.grangerView]]) both consume. */
  def pairSpineOverHourly(hourly: DataFrame): DataFrame = {
    val counts = hourly
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("h")
      .agg(sum(when(col("event_type") === "click", col("n"))
          .otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", col("n"))
          .otherwise(0L)).as("y"))
    counts.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("h"))
      .join(counts, Seq("h"), "left")
      .na.fill(0L, Seq("x", "y"))
  }

  /** Dense (h, x, y) spine: x = hourly clicks, y = hourly purchases,
    * zeros filled. */
  def pairSpine(events: DataFrame): DataFrame =
    pairSpineOverHourly(events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n")))

  /** CCF at lags −maxL..maxL: r(ℓ) = Pearson(x_t, y_{t+ℓ}). */
  def xcorr(spine: DataFrame, maxL: Int = xcorrMaxLag): DataFrame = {
    val w = Window.orderBy(col("h"))
    val lags = (-maxL to maxL)
    val lagged = lags.foldLeft(spine) { (df, l) =>
      // y_{t+ℓ}: lead for positive ℓ, lag for negative
      df.withColumn(s"yl_${l + maxL}",
        if (l >= 0) lead(col("y"), l).over(w)
        else lag(col("y"), -l).over(w))
    }
    val stackArms = lags
      .map(l => s"${l}L, x, yl_${l + maxL}").mkString(", ")
    lagged
      .selectExpr(s"stack(${lags.size}, $stackArms)")
      .toDF("lag", "x", "y")
      .filter(col("y").isNotNull)
      .groupBy("lag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y") * col("y")).as("sy2"))
      .selectExpr("lag", "n",
        // zero variance on either channel (constant series — the
        // round-16 edge corpus's single-click hour) makes r undefined:
        // NULL on BOTH engines, where ANSI Spark would throw and
        // DuckDB would quietly emit NULL anyway
        """case when (cast(n as double) * cast(sx2 as double)
          |    - cast(sx as double) * cast(sx as double))
          |  * (cast(n as double) * cast(sy2 as double)
          |    - cast(sy as double) * cast(sy as double)) <= 0.0
          |then cast(null as double) else
          |(cast(n as double) * cast(sxy as double)
          |  - cast(sx as double) * cast(sy as double))
          |/ sqrt((cast(n as double) * cast(sx2 as double)
          |    - cast(sx as double) * cast(sx as double))
          |  * (cast(n as double) * cast(sy2 as double)
          |    - cast(sy as double) * cast(sy as double))) end as r"""
          .stripMargin.replace("\n", " "))
      .orderBy("lag")
  }

  def qXcorr(spark: SparkSession, dir: String): DataFrame =
    xcorr(pairSpine(Tables(spark, dir, "events")))

  /** The ten exact sufficient statistics of the Granger pair
    * (y_t, y_{t−1}, x_{t−1}) — one bounded-window pass. */
  def grangerStats(spine: DataFrame): DataFrame = {
    val w = Window.orderBy(col("h"))
    spine
      .withColumn("y1", lag(col("y"), 1).over(w))
      .withColumn("x1", lag(col("x"), 1).over(w))
      .filter(col("y1").isNotNull)
      .agg(count(lit(1)).as("n"), sum("y").as("sy"), sum("y1").as("sy1"),
        sum("x1").as("sx1"), sum(col("y") * col("y")).as("syy"),
        sum(col("y") * col("y1")).as("syy1"),
        sum(col("y") * col("x1")).as("syx1"),
        sum(col("y1") * col("y1")).as("sy1y1"),
        sum(col("y1") * col("x1")).as("sy1x1"),
        sum(col("x1") * col("x1")).as("sx1x1"))
  }

  /** Shared double-channel expression text: Scala `expr` and the
    * DuckDB oracle consume the SAME tokens, so the float trees match
    * operation for operation. `D` is the 3×3 normal-equation
    * determinant; rssR/rssF the closed-form residual sums. */
  private val grangerExprs: Seq[(String, String)] = {
    val n = "cast(n as double)"
    val sy = "cast(sy as double)"; val sy1 = "cast(sy1 as double)"
    val sx1 = "cast(sx1 as double)"; val syy = "cast(syy as double)"
    val syy1 = "cast(syy1 as double)"; val syx1 = "cast(syx1 as double)"
    val sy1y1 = "cast(sy1y1 as double)"; val sy1x1 = "cast(sy1x1 as double)"
    val sx1x1 = "cast(sx1x1 as double)"
    // restricted: y ~ 1 + y1
    val bR = s"(($n * $syy1 - $sy * $sy1) / ($n * $sy1y1 - $sy1 * $sy1))"
    val aR = s"(($sy - $bR * $sy1) / $n)"
    val rssR = s"($syy - $aR * $sy - $bR * $syy1)"
    // full: y ~ 1 + y1 + x1, Cramer on the 3x3 normal equations
    val d = s"""($n * ($sy1y1 * $sx1x1 - $sy1x1 * $sy1x1)
               | - $sy1 * ($sy1 * $sx1x1 - $sy1x1 * $sx1)
               | + $sx1 * ($sy1 * $sy1x1 - $sy1y1 * $sx1))"""
      .stripMargin.replace("\n", " ")
    val dA = s"""($sy * ($sy1y1 * $sx1x1 - $sy1x1 * $sy1x1)
                | - $sy1 * ($syy1 * $sx1x1 - $sy1x1 * $syx1)
                | + $sx1 * ($syy1 * $sy1x1 - $sy1y1 * $syx1))"""
      .stripMargin.replace("\n", " ")
    val dB = s"""($n * ($syy1 * $sx1x1 - $sy1x1 * $syx1)
                | - $sy * ($sy1 * $sx1x1 - $sy1x1 * $sx1)
                | + $sx1 * ($sy1 * $syx1 - $syy1 * $sx1))"""
      .stripMargin.replace("\n", " ")
    val dC = s"""($n * ($sy1y1 * $syx1 - $syy1 * $sy1x1)
                | - $sy1 * ($sy1 * $syx1 - $syy1 * $sx1)
                | + $sy * ($sy1 * $sy1x1 - $sy1y1 * $sx1))"""
      .stripMargin.replace("\n", " ")
    val aF = s"($dA / $d)"; val bF = s"($dB / $d)"; val cF = s"($dC / $d)"
    val rssF = s"($syy - $aF * $sy - $bF * $syy1 - $cF * $syx1)"
    val f = s"(($rssR - $rssF) * ($n - 3.0) / $rssF)"
    // a PERFECT full-model fit (rssF ≤ 0 up to rounding) saturates F
    // rather than dividing by ~0 — documented sentinel, both engines
    // NOTE: plain integer literal (no Spark 'L' suffix) — this text
    // is shared verbatim with the DuckDB oracle; both dialects read a
    // >2³¹ literal as BIGINT
    val fM = s"""case when $rssF <= 0.0 then $fSatMicro
                | else cast(round(1000000.0 * $f) as bigint) end"""
      .stripMargin.replace("\n", " ")
    Seq(
      "n_obs" -> "n",
      "c_coef_micro" -> s"cast(round(1000000.0 * $cF) as bigint)",
      "f_micro" -> fM,
      "granger" -> s"($fM) > ${AbTest.chi2CritMicro}")
  }

  def granger(spine: DataFrame): DataFrame =
    grangerStats(spine).selectExpr(
      grangerExprs.map { case (name, e) => s"$e as $name" }: _*)

  def qGranger(spark: SparkSession, dir: String): DataFrame =
    granger(pairSpine(Tables(spark, dir, "events")))

  private val spineSql: String =
    """counts AS (
      |  SELECT epoch_us(ts) // 3600000000 AS h,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1),
      |b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM counts),
      |spine AS MATERIALIZED (
      |  SELECT g.h, COALESCE(c.x, 0) AS x, COALESCE(c.y, 0) AS y
      |  FROM (SELECT unnest(generate_series(b.mn, b.mx)) AS h FROM b) g
      |  LEFT JOIN counts c ON c.h = g.h)""".stripMargin

  /** Oracle pairs lags by spine SELF-JOIN (h+ℓ), the Autocorr
    * convention — an independent derivation of the same pairs. */
  val qXcorrSql: String =
    s"""WITH $spineSql,
       |lags AS (SELECT unnest(generate_series(-$xcorrMaxLag,
       |  $xcorrMaxLag)) AS lag),
       |pairs AS (
       |  SELECT l.lag, s.x, t.y
       |  FROM lags l
       |  CROSS JOIN spine s
       |  JOIN spine t ON t.h = s.h + l.lag),
       |m AS (
       |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy,
       |    CAST(SUM(x * x) AS BIGINT) AS sx2,
       |    CAST(SUM(y * y) AS BIGINT) AS sy2
       |  FROM pairs GROUP BY 1)
       |SELECT lag, n,
       |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |    * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
       |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0.0
       |  THEN CAST(NULL AS DOUBLE) ELSE
       |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |  / sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |    * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
       |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS r
       |FROM m ORDER BY lag""".stripMargin

  val qGrangerSql: String = {
    val outCols = grangerExprs.map { case (name, e) =>
      // the Spark expression text IS the oracle text: dialect-shared
      // cast/round/arithmetic tokens only
      s"  $e AS $name"
    }.mkString(",\n")
    s"""WITH $spineSql,
       |pairs AS (
       |  SELECT s.y, p.y AS y1, p.x AS x1
       |  FROM spine s JOIN spine p ON p.h = s.h - 1),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(y1) AS BIGINT) AS sy1,
       |    CAST(SUM(x1) AS BIGINT) AS sx1,
       |    CAST(SUM(y * y) AS BIGINT) AS syy,
       |    CAST(SUM(y * y1) AS BIGINT) AS syy1,
       |    CAST(SUM(y * x1) AS BIGINT) AS syx1,
       |    CAST(SUM(y1 * y1) AS BIGINT) AS sy1y1,
       |    CAST(SUM(y1 * x1) AS BIGINT) AS sy1x1,
       |    CAST(SUM(x1 * x1) AS BIGINT) AS sx1x1
       |  FROM pairs)
       |SELECT
       |$outCols
       |FROM m""".stripMargin
  }
}
