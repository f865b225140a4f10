package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** COVARIATE BALANCE / STANDARDIZED MEAN DIFFERENCE (the Table-1 SMD
  * of Austin 2009; Imbens & Rubin ch. 14) — the check that belongs
  * BEFORE every effect readout in the experiment family: are the two
  * md5-coin arms actually exchangeable on pre-treatment covariates?
  * Per covariate,
  *
  *   SMD = (m_t − m_c) / sqrt((v_t + v_c) / 2),
  *
  * with |SMD| < 0.1 the standard balance fence. An SRM check
  * ([[SrmMde]]) catches the COUNTS drifting; this catches the
  * COMPOSITION drifting with counts intact.
  *
  * Covariates: per-user non-purchase activity, spend cents, and
  * total event count — the store's own sum monoids, so the live view
  * ([[graft.streaming.ExperimentStore.balanceView]]) costs zero new
  * state.
  *
  * DETERMINISM. Per-arm Σx and Σx² are exact integers in
  * DECIMAL(38,0); means/variances/SMD form one fully-double-cast
  * expression ([[BayesAb]] posture); the fence compares the
  * identically-rounded micro value.
  *
  * SCALE. One scan → per-user agg → a 3-covariate stack over the
  * per-user table → |covariates| rows. */
object CovariateBalance {

  val smdFenceMicro = 100000L

  def covariateBalance(events: DataFrame): DataFrame =
    balanceFromPerUser(events.groupBy("user_id").agg(
        sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
          .as("nonpurchases"),
        sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100.0) as bigint)")).otherwise(0L))
          .as("cents"),
        count(lit(1)).as("n_events"))
      .withColumn("arm", AbTest.armOf(col("user_id"))))

  /** Balance table from any per-user frame carrying (arm,
    * nonpurchases, cents, n_events). */
  def balanceFromPerUser(pu: DataFrame): DataFrame = {
    val stacked = pu.selectExpr("arm",
      """stack(3, 'nonpurchases', nonpurchases, 'cents', cents,
        |'n_events', n_events) as (covariate, x)"""
        .stripMargin.replace("\n", " "))
    stacked.groupBy("covariate")
      .agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, col("x")).otherwise(0L))
          .cast(DecimalType(38, 0)).as("s_t"),
        sum(when(col("arm") === 0, col("x")).otherwise(0L))
          .cast(DecimalType(38, 0)).as("s_c"),
        sum(when(col("arm") === 1,
          col("x").cast(DecimalType(38, 0)) * col("x")).otherwise(
          lit(0).cast(DecimalType(38, 0)))).as("ss_t"),
        sum(when(col("arm") === 0,
          col("x").cast(DecimalType(38, 0)) * col("x")).otherwise(
          lit(0).cast(DecimalType(38, 0)))).as("ss_c"))
      .selectExpr("covariate", "n_t", "n_c",
        s"${meanExpr("t")} as mean_t_micro",
        s"${meanExpr("c")} as mean_c_micro",
        s"$smdExpr as smd_micro")
      .withColumn("balanced", abs(col("smd_micro")) < smdFenceMicro)
      .orderBy("covariate")
  }

  private def meanExpr(a: String): String =
    s"""case when n_$a = 0 then 0 else
       |cast(round(1000000.0 * cast(s_$a as double)
       |  / cast(n_$a as double)) as bigint) end"""
      .stripMargin.replace("\n", " ")

  private def smdExpr: String = {
    def m(a: String) = s"(cast(s_$a as double) / cast(n_$a as double))"
    def v(a: String) =
      s"""((cast(ss_$a as double) / cast(n_$a as double)
         | - ${m(a)} * ${m(a)}) * cast(n_$a as double)
         | / (cast(n_$a as double) - 1.0))"""
        .stripMargin.replace("\n", " ")
    s"""case when n_t <= 1 or n_c <= 1 or
       | (${v("t")} + ${v("c")}) <= 0.0 then 0 else
       |cast(round(1000000.0 * (${m("t")} - ${m("c")})
       |  / sqrt((${v("t")} + ${v("c")}) / 2.0)) as bigint) end"""
      .stripMargin.replace("\n", " ")
  }

  def qCovariateBalance(spark: SparkSession, dir: String): DataFrame =
    covariateBalance(Tables(spark, dir, "events"))

  val qCovariateBalanceSql: String = {
    def m(a: String) = s"(CAST(s_$a AS DOUBLE) / CAST(n_$a AS DOUBLE))"
    def v(a: String) =
      s"""((CAST(ss_$a AS DOUBLE) / CAST(n_$a AS DOUBLE)
         | - ${m(a)} * ${m(a)}) * CAST(n_$a AS DOUBLE)
         | / (CAST(n_$a AS DOUBLE) - 1.0))"""
        .stripMargin.replace("\n", " ")
    def mean(a: String) =
      s"""CASE WHEN n_$a = 0 THEN 0 ELSE
         | CAST(ROUND(1000000.0 * CAST(s_$a AS DOUBLE)
         |   / CAST(n_$a AS DOUBLE)) AS BIGINT) END"""
        .stripMargin.replace("\n", " ")
    val smd =
      s"""CASE WHEN n_t <= 1 OR n_c <= 1 OR
         | (${v("t")} + ${v("c")}) <= 0.0 THEN 0 ELSE
         |CAST(ROUND(1000000.0 * (${m("t")} - ${m("c")})
         |  / SQRT((${v("t")} + ${v("c")}) / 2.0)) AS BIGINT) END"""
        .stripMargin.replace("\n", " ")
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
       |      AS nonpurchases,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
       |      AS cents,
       |    CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |stacked AS (
       |  SELECT arm, 'nonpurchases' AS covariate, nonpurchases AS x
       |    FROM pu
       |  UNION ALL
       |  SELECT arm, 'cents', cents FROM pu
       |  UNION ALL
       |  SELECT arm, 'n_events', n_events FROM pu),
       |agg AS (
       |  SELECT covariate,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_t,
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_c,
       |    SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) ELSE 0 END)
       |      AS s_t,
       |    SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) ELSE 0 END)
       |      AS s_c,
       |    SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * x ELSE 0 END)
       |      AS ss_t,
       |    SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * x ELSE 0 END)
       |      AS ss_c
       |  FROM stacked GROUP BY covariate)
       |SELECT covariate, n_t, n_c,
       |  ${mean("t")} AS mean_t_micro,
       |  ${mean("c")} AS mean_c_micro,
       |  $smd AS smd_micro,
       |  ABS($smd) < $smdFenceMicro AS balanced
       |FROM agg
       |ORDER BY covariate""".stripMargin
  }
}
