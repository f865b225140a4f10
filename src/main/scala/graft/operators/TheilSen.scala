package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.CorpusOps

/** THEIL–SEN ROBUST TREND (Theil 1950; Sen 1968) — the median of all
  * pairwise slopes, the trend line [[Trend]]'s OLS cannot give when
  * up to ~29% of points are corrupted (OLS has breakdown point 0: one
  * bad hour drags the fit arbitrarily): the robust-monitoring twin on
  * the same hourly purchase spine the OLS row rides.
  *
  *   slope = median{ (y_j − y_i) / (t_j − t_i) : t_i < t_j },
  *   intercept = median{ y_i − slope·(t_i − t₀) }
  *
  * (median = the ⌈P/2⌉-th LARGEST — the tie-insensitive definition
  * the two-phase selection and the oracle's row_number agree on).
  *
  * DETERMINISM. Each pairwise slope is ONE mirrored double division,
  * micro-quantized; the median is then an exact integer k-th order
  * statistic over the quantized values ([[CorpusOps
  * .scoreThresholdWeighted]] — the q_score_threshold machinery, here
  * at keep-rate 1/2); residuals are pure integer arithmetic on the
  * integer slope, so the intercept median is exact too.
  *
  * SCALE. The pair set is CALENDAR-bounded, never corpus-bounded: the
  * rollup collapses the corpus to |hours| rows first (the cusum/EWMA
  * rollup-first contract), so P = C(|hours|, 2) grows with the
  * monitoring window, not event volume — at 100 TB the cost is the
  * one rollup scan; the pair self-join runs over spine rows. The
  * selection's driver state is bounded by slope buckets (≤ range/4096
  * populated buckets), not pairs. */
object TheilSen {

  /** Hourly purchase-count spine: (t = epoch hour index, y). */
  def hourlySpine(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .groupBy(expr("unix_seconds(date_trunc('hour', ts)) div 3600")
        .as("t"))
      .agg(count(lit(1)).as("y"))

  /** One row: (n_points, n_pairs, slope_micro, intercept_micro). */
  def theilSen(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val (spine, release) = graft.util.Checkpoints.checkpointTracked(
      hourlySpine(events))
    try {
      import spark.implicits._
      // degenerate spine (round-16 edge-corpus find): fewer than two
      // points ⇒ zero pairwise slopes ⇒ no median exists. The oracle's
      // final join over the empty slope set yields ZERO rows — match
      // it instead of tripping the selection's non-empty requirement.
      if (spine.limit(2).count() < 2)
        return Seq.empty[(Long, Long, Long, Long)]
          .toDF("n_points", "n_pairs", "slope_micro", "intercept_micro")
      // rename-before-join: a self-join of the same checkpointed plan
      // can resolve both alias sides to one attribute, making Δt read
      // 0 (observed as an ANSI divide-by-zero); distinct names can't
      val l = spine.select(col("t").as("t1"), col("y").as("y1"))
      val r = spine.select(col("t").as("t2"), col("y").as("y2"))
      // the t2 = t1 guard never fires in the OUTPUT (the join keeps
      // only t1 < t2) but is required under ANSI: codegen can evaluate
      // the fused projection on a candidate pair before the condition
      // rejects it, and ANSI division throws instead of yielding the
      // Infinity the filter would have discarded
      val pairs = l.join(r, col("t1") < col("t2"))
        .selectExpr(
          """case when t2 = t1 then null else
            | cast(round(1000000.0 * (y2 - y1) / (t2 - t1)) as bigint)
            | end as slope""".stripMargin.replace("\n", " "))
      val slopeMed = CorpusOps.scoreThresholdWeighted(
        pairs.groupBy("slope").agg(count(lit(1)).as("c")),
        "slope", col("c"), 1L, 2L)
        .selectExpr("n_docs as n_pairs", "threshold as slope_micro")
        .head()
      val (nPairs, slope) = (slopeMed.getLong(0), slopeMed.getLong(1))
      val resid = spine.crossJoin(
          broadcast(spine.agg(min("t").as("t0"))))
        .selectExpr(s"y * 1000000L - $slope * (t - t0) as r")
      val interceptMed = CorpusOps.scoreThresholdWeighted(
        resid.groupBy("r").agg(count(lit(1)).as("c")),
        "r", col("c"), 1L, 2L)
        .selectExpr("n_docs as n_points", "threshold as intercept_micro")
        .head()
      import spark.implicits._
      Seq((interceptMed.getLong(0), nPairs, slope, interceptMed.getLong(1)))
        .toDF("n_points", "n_pairs", "slope_micro", "intercept_micro")
    } finally release()
  }

  def qTheilSen(spark: SparkSession, dir: String): DataFrame =
    theilSen(Tables(spark, dir, "events"))

  /** Oracle replay: the same spine, every pairwise slope, and the
    * k-th-largest definition of both medians via row_number. */
  val qTheilSenSql: String =
    """WITH spine AS MATERIALIZED (
      |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS t,
      |    CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |slopes AS (
      |  SELECT CAST(ROUND(1000000.0 * (b.y - a.y) / (b.t - a.t))
      |    AS BIGINT) AS slope
      |  FROM spine a JOIN spine b ON a.t < b.t),
      |sk AS (SELECT COUNT(*) AS np, (COUNT(*) + 1) // 2 AS k FROM slopes),
      |smed AS (
      |  SELECT slope AS slope_micro
      |  FROM (SELECT slope, row_number() OVER (ORDER BY slope DESC) AS rn
      |        FROM slopes), sk
      |  WHERE rn = k),
      |resid AS (
      |  SELECT y * 1000000 - smed.slope_micro
      |    * (t - (SELECT MIN(t) FROM spine)) AS r
      |  FROM spine, smed),
      |rk AS (SELECT COUNT(*) AS npt, (COUNT(*) + 1) // 2 AS k FROM resid),
      |rmed AS (
      |  SELECT r AS intercept_micro
      |  FROM (SELECT r, row_number() OVER (ORDER BY r DESC) AS rn
      |        FROM resid), rk
      |  WHERE rn = k)
      |SELECT CAST(rk.npt AS BIGINT) AS n_points,
      |  CAST(sk.np AS BIGINT) AS n_pairs,
      |  CAST(smed.slope_micro AS BIGINT) AS slope_micro,
      |  CAST(rmed.intercept_micro AS BIGINT) AS intercept_micro
      |FROM sk, smed, rk, rmed""".stripMargin
}
