package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** CUPED — Controlled-experiment Using Pre-Experiment Data (Deng, Xu,
  * Kohavi & Walker 2013, WSDM; the variance-reduction technique every
  * large experimentation platform runs by default): regress the
  * outcome on a covariate known to be unaffected by treatment,
  *
  *   Y_adj = Y − θ·(X − X̄),   θ = cov(X,Y) / var(X)  (pooled),
  *
  * and test the ADJUSTED metric. E[Y_adj diff] equals the true effect
  * (X's arm means are equal in expectation under randomized
  * assignment), while var(Y_adj) = var(Y)·(1 − ρ²) — at ρ = 0.7 the
  * experiment needs half the users for the same power. Here the
  * outcome is per-user purchase cents ([[AbTest]]'s spend metric —
  * same md5 arm coin, same scan shape) and the covariate is the
  * user's non-purchase event count, standing in for the pre-period
  * engagement metric a production platform would join from history.
  *
  * The readout reports BOTH the raw and the adjusted Welch t plus the
  * pooled ρ² — (1 − ρ²) IS the variance-reduction certificate, and
  * t_adj/t ≈ 1/√(1−ρ²) is the sensitivity gain realized.
  *
  * DETERMINISM: everything up to the final statistics is exact
  * integer/DECIMAL(38,0) sufficient statistics (n, Σx, Σy, Σx², Σy²,
  * Σxy per arm — one scan, 1-row output); θ and the t's are
  * mul/div/sqrt over those (IEEE correctly-rounded, mirrored
  * expression shape → bit-identical cross-engine, the [[AbTest]]
  * contract). Degenerate designs (var(X) = 0, an arm < 2, zero
  * adjusted variance) are guarded by EXACT-INTEGER predicates so ANSI
  * never sees a NaN; θ falls back to 0 (CUPED degrades to the raw
  * test, which is its correct limiting behavior).
  *
  * SCALE: one corpus scan → map-side partial agg to ONE row of
  * sufficient statistics; all cross-products ride DECIMAL(38,0)
  * (HUGEINT on the oracle side) so no count/moment can overflow at
  * 100 TB user populations. Nothing sorts, nothing is quadratic. */
object Cuped {

  /** Per-user (arm, x = non-purchase events, y = purchase cents). */
  def perUser(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(
        sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
          .as("x"),
        sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100.0) as bigint)")).otherwise(0L))
          .as("y"))
      .withColumn("arm", AbTest.armOf(col("user_id")))

  def cuped(events: DataFrame): DataFrame =
    cupedFromPerUser(perUser(events))

  /** The readout from any (arm, x, y) per-user frame (streaming-store
    * entry — per-user covariate/outcome totals are a sum monoid, so
    * [[graft.streaming.ExperimentStore]]'s live view equals this). */
  def cupedFromPerUser(pu: DataFrame): DataFrame = {
    def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    def armAgg(a: Int, n: String) = Seq(
      sum(when(col("arm") === a, 1L).otherwise(0L)).as(s"n_$n"),
      sum(when(col("arm") === a, col("x")).otherwise(0L)).as(s"sx_$n"),
      sum(when(col("arm") === a, col("y")).otherwise(0L)).as(s"sy_$n"),
      sum(when(col("arm") === a, d38(col("x")) * col("x"))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as(s"sxx_$n"),
      sum(when(col("arm") === a, d38(col("y")) * col("y"))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as(s"syy_$n"),
      sum(when(col("arm") === a, d38(col("x")) * col("y"))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as(s"sxy_$n"))
    val aggs = armAgg(1, "t") ++ armAgg(0, "c")
    val suff = pu.agg(aggs.head, aggs.tail: _*)
    // pooled second moments; vx/vy/cxy are N·(N−1)·cov-style numerators
    // (exact integers in DECIMAL(38,0) — the sign tests and the zero
    // guards run on THESE, never on a float)
    val derived = suff.selectExpr("*",
      "n_t + n_c as nn",
      "sx_t + sx_c as sx", "sy_t + sy_c as sy",
      "sxx_t + sxx_c as sxx", "syy_t + syy_c as syy",
      "sxy_t + sxy_c as sxy")
      .selectExpr("*",
        "nn * sxx - cast(sx as decimal(38,0)) * sx as vx",
        "nn * syy - cast(sy as decimal(38,0)) * sy as vy",
        "nn * sxy - cast(sx as decimal(38,0)) * sy as cxy",
        // per-arm adjusted-variance numerators need the same three
        // per-arm (these are n_a·Σ−S² forms, exact)
        "n_t * sxx_t - cast(sx_t as decimal(38,0)) * sx_t as vxt",
        "n_t * syy_t - cast(sy_t as decimal(38,0)) * sy_t as vyt",
        "n_t * sxy_t - cast(sx_t as decimal(38,0)) * sy_t as cxyt",
        "n_c * sxx_c - cast(sx_c as decimal(38,0)) * sx_c as vxc",
        "n_c * syy_c - cast(sy_c as decimal(38,0)) * sy_c as vyc",
        "n_c * sxy_c - cast(sx_c as decimal(38,0)) * sy_c as cxyc")
    // θ = cov/var as ONE double division of the exact numerators
    // (the N normalizations cancel); 0 when var(X) = 0 exactly
    val withTheta = derived.selectExpr("*",
      """case when vx = 0 then cast(0.0 as double)
        | else cast(cxy as double) / cast(vx as double) end as theta"""
        .stripMargin.replace("\n", " "))
    // per-arm adjusted sample variance s² = (vy − 2θ·cxy + θ²·vx)
    //   / (n(n−1)) with the arm's own numerators; Welch on top.
    def s2(n: String): String =
      s"""((cast(vy$n as double) - 2.0 * theta * cast(cxy$n as double)
         | + theta * theta * cast(vx$n as double))
         | / (cast(n_$n as double) * n_$n * (n_$n - 1)))"""
        .stripMargin.replace("\n", " ")
    def rawS2(n: String): String =
      s"(cast(vy$n as double) / (cast(n_$n as double) * n_$n * (n_$n - 1)))"
    val eff = "(sy_t / cast(n_t as double) - sy_c / cast(n_c as double))"
    val effAdj = s"($eff - theta * (sx_t / cast(n_t as double)" +
      " - sx_c / cast(n_c as double)))"
    withTheta.selectExpr(
      "cast(n_t as bigint) as n_t",
      "cast(n_c as bigint) as n_c",
      "cast(round(1000000.0 * theta) as bigint) as theta_micro",
      """case when vx = 0 or vy = 0 then 0L else
        |cast(round(1000000.0 * cast(cxy as double) * cast(cxy as double)
        |  / (cast(vx as double) * cast(vy as double))) as bigint) end
        |  as rho2_micro""".stripMargin.replace("\n", " "),
      // effect micros carry the same exact-integer empty-arm guard as
      // the t's: 0/0 is NaN, and NaN→BIGINT throws under ANSI on Spark
      // but errors outright in DuckDB (the AbTest abstain convention)
      s"""case when n_t = 0 or n_c = 0 then 0L else
         | cast(round(1000000.0 * $eff) as bigint) end as effect_micro"""
        .stripMargin.replace("\n", " "),
      s"""case when n_t = 0 or n_c = 0 then 0L else
         | cast(round(1000000.0 * $effAdj) as bigint) end
         | as effect_adj_micro""".stripMargin.replace("\n", " "),
      s"""case when n_t < 2 or n_c < 2 or (vyt = 0 and vyc = 0) then 0L
         | else cast(round(1000000.0 * $eff
         |   / sqrt(${rawS2("t")} + ${rawS2("c")})) as bigint) end
         | as t_micro""".stripMargin.replace("\n", " "),
      s"""case when n_t < 2 or n_c < 2 then 0L
         | when ${s2("t")} + ${s2("c")} <= 0.0 then 0L
         | else cast(round(1000000.0 * $effAdj
         |   / sqrt(${s2("t")} + ${s2("c")})) as bigint) end
         | as t_adj_micro""".stripMargin.replace("\n", " "))
      .withColumn("significant_adj",
        abs(col("t_adj_micro")) >= AbTest.zCritMicro)
  }

  def qCuped(spark: SparkSession, dir: String): DataFrame =
    cuped(Tables(spark, dir, "events"))

  val qCupedSql: String = {
    def s2(n: String): String =
      s"""((CAST(vy$n AS DOUBLE) - 2.0 * theta * CAST(cxy$n AS DOUBLE)
         | + theta * theta * CAST(vx$n AS DOUBLE))
         | / (CAST(n_$n AS DOUBLE) * n_$n * (n_$n - 1)))"""
        .stripMargin.replace("\n", " ")
    def rawS2(n: String): String =
      s"(CAST(vy$n AS DOUBLE) / (CAST(n_$n AS DOUBLE) * n_$n * (n_$n - 1)))"
    val eff = "(sy_t / CAST(n_t AS DOUBLE) - sy_c / CAST(n_c AS DOUBLE))"
    val effAdj = s"($eff - theta * (sx_t / CAST(n_t AS DOUBLE)" +
      " - sx_c / CAST(n_c AS DOUBLE)))"
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS x,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END) AS y,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |suff AS MATERIALIZED (
       |  SELECT
       |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_t,
       |    SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS sx_t,
       |    SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS sy_t,
       |    SUM(CASE WHEN arm = 1 THEN x * x ELSE 0 END) AS sxx_t,
       |    SUM(CASE WHEN arm = 1 THEN y * y ELSE 0 END) AS syy_t,
       |    SUM(CASE WHEN arm = 1 THEN x * y ELSE 0 END) AS sxy_t,
       |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_c,
       |    SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS sx_c,
       |    SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS sy_c,
       |    SUM(CASE WHEN arm = 0 THEN x * x ELSE 0 END) AS sxx_c,
       |    SUM(CASE WHEN arm = 0 THEN y * y ELSE 0 END) AS syy_c,
       |    SUM(CASE WHEN arm = 0 THEN x * y ELSE 0 END) AS sxy_c
       |  FROM pu),
       |derived AS MATERIALIZED (
       |  SELECT *,
       |    (n_t + n_c) * (sxx_t + sxx_c)
       |      - (sx_t + sx_c) * (sx_t + sx_c) AS vx,
       |    (n_t + n_c) * (syy_t + syy_c)
       |      - (sy_t + sy_c) * (sy_t + sy_c) AS vy,
       |    (n_t + n_c) * (sxy_t + sxy_c)
       |      - (sx_t + sx_c) * (sy_t + sy_c) AS cxy,
       |    n_t * sxx_t - sx_t * sx_t AS vxt,
       |    n_t * syy_t - sy_t * sy_t AS vyt,
       |    n_t * sxy_t - sx_t * sy_t AS cxyt,
       |    n_c * sxx_c - sx_c * sx_c AS vxc,
       |    n_c * syy_c - sy_c * sy_c AS vyc,
       |    n_c * sxy_c - sx_c * sy_c AS cxyc
       |  FROM suff),
       |thetad AS MATERIALIZED (
       |  SELECT *, CASE WHEN vx = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE CAST(cxy AS DOUBLE) / CAST(vx AS DOUBLE) END AS theta
       |  FROM derived)
       |SELECT CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
       |  CAST(ROUND(1000000.0 * theta) AS BIGINT) AS theta_micro,
       |  CASE WHEN vx = 0 OR vy = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE)
       |      / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE))) AS BIGINT) END
       |    AS rho2_micro,
       |  CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * $eff) AS BIGINT) END AS effect_micro,
       |  CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * $effAdj) AS BIGINT) END
       |    AS effect_adj_micro,
       |  CASE WHEN n_t < 2 OR n_c < 2 OR (vyt = 0 AND vyc = 0) THEN 0
       |    ELSE CAST(ROUND(1000000.0 * $eff
       |      / SQRT(${rawS2("t")} + ${rawS2("c")})) AS BIGINT) END
       |    AS t_micro,
       |  CASE WHEN n_t < 2 OR n_c < 2 THEN 0
       |    WHEN ${s2("t")} + ${s2("c")} <= 0.0 THEN 0
       |    ELSE CAST(ROUND(1000000.0 * $effAdj
       |      / SQRT(${s2("t")} + ${s2("c")})) AS BIGINT) END
       |    AS t_adj_micro,
       |  ABS(CASE WHEN n_t < 2 OR n_c < 2 THEN 0
       |    WHEN ${s2("t")} + ${s2("c")} <= 0.0 THEN 0
       |    ELSE CAST(ROUND(1000000.0 * $effAdj
       |      / SQRT(${s2("t")} + ${s2("c")})) AS BIGINT) END)
       |    >= ${AbTest.zCritMicro} AS significant_adj
       |FROM thetad""".stripMargin
  }
}
