package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** QINI UPLIFT CURVE (Radcliffe 2007, "Using control groups to target
  * on predicted lift"; Radcliffe & Surry 2011) — the evaluation every
  * targeting model answers to: rank the population by a predicted
  * uplift score, then measure the INCREMENTAL conversions (treated
  * minus rate-matched control) captured in each ranked decile. A
  * model that ranks persuadables first bows the curve above the
  * random-targeting diagonal; the Qini coefficient is that area.
  *
  * Instantiation on the events table: arm is the repo-wide md5 coin
  * ([[AbTest.armOf]] — the same split every experiment readout uses),
  * conversion is any purchase, and the uplift score is the
  * engagement proxy #(non-purchase events) — deterministic, integer,
  * and computed in the same single scan as the outcome.
  *
  * DETERMINISM. The curve value at decile k is
  *   qini(k) = cumConvT(k) − cumConvC(k)·cumNT(k)/cumNC(k)
  * held EXACT as the integer numerator cumConvT·cumNC − cumConvC·cumNT
  * over denominator cumNC, micro-quantized by one integer division;
  * the coefficient is the Riemann sum minus the diagonal,
  *   Q_micro = (Σₖ qini_micro(k)) div 10 − qini_micro(10) div 2,
  * pure long arithmetic replayed verbatim by the oracle. Ties in the
  * score rank break on user_id — the statistic is rank-exact, not
  * merely distribution-exact.
  *
  * SCALE SHAPE. One corpus scan → per-user (arm, conv, score); one
  * two-level global row number ([[RowNumbering]] — no SinglePartition
  * exchange); the decile table is 10 rows, so the cumulative sweep
  * and the coefficient are driver-bounded. The same per-user triple
  * is a sum-monoid: [[graft.streaming.ExperimentStore.qiniView]]
  * serves this readout live from absorbed events. */
object Uplift {

  /** Per-user (arm, conv, score) — one scan. The score is the
    * NON-PURCHASE activity count: deterministic, computed in the same
    * scan as the outcome, and exactly the `nonpurchases` sum-monoid
    * [[graft.streaming.ExperimentStore]] already stores — so the live
    * [[graft.streaming.ExperimentStore.qiniView]] needs zero new
    * state. */
  def perUserUplift(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"),
        sum(when(col("event_type") =!= "purchase", 1L)
          .otherwise(0L)).as("score"))
      .select(col("user_id"), AbTest.armOf(col("user_id")).as("arm"),
        col("conv"), col("score"))

  /** The 10-decile Qini table from any per-user (user_id, arm, conv,
    * score) frame. */
  def qiniFromPerUser(pu: DataFrame): DataFrame = {
    val n = pu.count()
    val ranked = RowNumbering.withGlobalRowNumber(pu,
      Seq(col("score").desc, col("user_id").asc), "rn")
    val dec = ranked
      .selectExpr("arm", "conv", s"(rn - 1) * 10 div $n + 1 as decile")
      .groupBy("decile").agg(
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1L, col("conv")).otherwise(0L))
          .as("conv_t"),
        sum(when(col("arm") === 0L, col("conv")).otherwise(0L))
          .as("conv_c"))
    val cum = PrefixSum.withRunningTotals(dec, Seq(col("decile").asc),
      Seq("n_t", "n_c", "conv_t", "conv_c"),
      Seq("cum_nt", "cum_nc", "cum_ct", "cum_cc"))
    // cumConvT·cumNC is Θ(n²) mass → DECIMAL(38,0) (the Lorenz /
    // Mann-Whitney convention); the div collapses it back to a long
    val curve = cum.withColumn("qini_micro",
      expr("""case when cum_nc = 0 then 0L else cast(
              | (1000000L * (cast(cum_ct as decimal(38,0)) * cum_nc
              |              - cast(cum_cc as decimal(38,0)) * cum_nt))
              |   div cum_nc as bigint) end""".stripMargin.replace("\n", " ")))
    // the curve's endpoint is the LAST non-empty decile (max_by):
    // decile 10 itself can be empty when n < 10
    curve.crossJoin(broadcast(curve.agg(
        expr("sum(qini_micro) div 10").as("rie"),
        expr("max_by(qini_micro, decile)").as("last"))
      .selectExpr("rie - (last div 2) as qini_coef_micro")))
      .select(col("decile"), col("n_t"), col("n_c"), col("conv_t"),
        col("conv_c"), col("qini_micro"), col("qini_coef_micro"))
      .orderBy("decile")
  }

  def qQini(spark: SparkSession, dir: String): DataFrame =
    qiniFromPerUser(perUserUplift(Tables(spark, dir, "events")))

  /** Arm coin replay matches AbTest's SQL convention. */
  val qQiniSql: String =
    """WITH pu AS MATERIALIZED (
      |  SELECT user_id,
      |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) % 2 AS BIGINT) AS arm,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
      |    SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
      |      AS score
      |  FROM events GROUP BY user_id),
      |nn AS (SELECT COUNT(*) AS n FROM pu),
      |ranked AS MATERIALIZED (
      |  SELECT arm, conv,
      |    row_number() OVER (ORDER BY score DESC, user_id ASC) AS rn
      |  FROM pu),
      |dec AS (
      |  SELECT (rn - 1) * 10 // nn.n + 1 AS decile,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
      |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
      |      AS conv_t,
      |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
      |      AS conv_c
      |  FROM ranked, nn GROUP BY 1, nn.n),
      |cum AS (
      |  SELECT decile, n_t, n_c, conv_t, conv_c,
      |    SUM(n_t) OVER w AS cum_nt, SUM(n_c) OVER w AS cum_nc,
      |    SUM(conv_t) OVER w AS cum_ct, SUM(conv_c) OVER w AS cum_cc
      |  FROM dec
      |  WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)),
      |curve AS (
      |  SELECT decile, n_t, n_c, conv_t, conv_c,
      |    CASE WHEN cum_nc = 0 THEN 0 ELSE CAST(
      |      (1000000 * (CAST(cum_ct AS HUGEINT) * cum_nc
      |                  - CAST(cum_cc AS HUGEINT) * cum_nt)) // cum_nc
      |      AS BIGINT) END AS qini_micro
      |  FROM cum),
      |coef AS (
      |  SELECT CAST((CAST(SUM(qini_micro) AS BIGINT) // 10)
      |      - (max_by(qini_micro, decile) // 2)
      |      AS BIGINT) AS qini_coef_micro
      |  FROM curve)
      |SELECT decile, n_t, n_c, conv_t, conv_c, qini_micro,
      |  qini_coef_micro
      |FROM curve, coef ORDER BY decile""".stripMargin
}
