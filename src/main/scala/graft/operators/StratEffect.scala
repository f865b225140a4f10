package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** POST-STRATIFIED EFFECT ESTIMATE (direct standardization; Imbens &
  * Rubin 2015 ch. 9's subclassification estimator) — the observational
  * sibling of [[Cuped]]: bucket users into strata of the SAME
  * engagement covariate CUPED regresses on (non-purchase event count,
  * standing in for pre-period activity), difference the arms INSIDE
  * each stratum, and combine with stratum-size weights:
  *
  *   ATE = Σ_s w_s · (ȳ_t,s − ȳ_c,s) / Σ_s w_s,   w_s = n_s
  *
  * Under randomized assignment this agrees with the naive difference
  * in expectation (both are surfaced — their gap is the covariate-
  * balance read); under a CONFOUNDED assignment the stratified
  * estimate removes the bias the within-stratum comparison can see.
  * Strata whose treatment or control cell is EMPTY are excluded from
  * the pool (the positivity violation is reported, not averaged
  * over) — n_strata_used says how much support the estimate has.
  *
  * DETERMINISM. Strata are integer buckets (x·10 div (max_x + 1) —
  * the 1-row max broadcast makes the grid corpus-calibrated yet
  * exactly replayable); per-stratum sums/counts are exact integers;
  * each stratum effect is micro-quantized FIRST and the pool is then
  * integer arithmetic (Σ w·effect_micro div W) — quantize-then-
  * combine, the micronat convention that keeps a ≤10-term double sum
  * from depending on Spark's aggregation order.
  *
  * SCALE. One scan → per-user agg → ≤10-row stratum table (map-side
  * combine); the max is a 1-row broadcast. Nothing sorts. */
object StratEffect {

  val nStrata = 10L

  def stratEffect(events: DataFrame): DataFrame =
    stratFromPerUser(Cuped.perUser(events))

  /** The ≤[[nStrata]]-row per-stratum effect table — shared by the
    * pooled readout and [[qSimpsonCheck]]. */
  def perStratumTable(pu: DataFrame): DataFrame = {
    val mx = pu.agg(max(col("x")).as("max_x"))
    val strata = pu.crossJoin(broadcast(mx))
      .selectExpr("arm", "y", s"(x * $nStrata) div (max_x + 1) as stratum")
      .groupBy("stratum").agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("s_t"),
        sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("s_c"))
    strata.selectExpr("stratum", "n_t", "n_c",
      "s_t", "s_c", "n_t + n_c as w",
      """case when n_t = 0 or n_c = 0 then null else
        | cast(round(1000000.0 * (s_t / cast(n_t as double)
        |   - s_c / cast(n_c as double))) as bigint) end
        | as effect_micro""".stripMargin.replace("\n", " "))
  }

  /** The readout from any (arm, x, y) per-user frame
    * ([[Cuped.perUser]]'s shape; streaming-store entry). */
  def stratFromPerUser(pu: DataFrame): DataFrame = {
    val perStratum = perStratumTable(pu)
    perStratum.agg(
        count(lit(1)).as("n_strata"),
        sum(when(col("effect_micro").isNotNull, 1L).otherwise(0L))
          .as("n_strata_used"),
        sum(col("n_t")).as("n_t"),
        sum(col("n_c")).as("n_c"),
        sum(col("s_t")).as("s_t"),
        sum(col("s_c")).as("s_c"),
        // w·effect is O(users · 1e6·cents) — DECIMAL(38,0) on this
        // side, HUGEINT on the oracle's (the Auc/Mann-Whitney rule)
        sum(when(col("effect_micro").isNotNull,
          col("w").cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * col("effect_micro"))
          .otherwise(lit(0).cast(
            org.apache.spark.sql.types.DecimalType(38, 0)))).as("wsum"),
        sum(when(col("effect_micro").isNotNull, col("w")).otherwise(0L))
          .as("wtot"))
      .selectExpr("cast(n_strata as bigint) as n_strata",
        "cast(n_strata_used as bigint) as n_strata_used",
        """case when n_t = 0 or n_c = 0 then 0L else
          | cast(round(1000000.0 * (s_t / cast(n_t as double)
          |   - s_c / cast(n_c as double))) as bigint) end
          | as naive_micro""".stripMargin.replace("\n", " "),
        // subtract-the-remainder-then-divide: the quotient of an exact
        // multiple is floor ≡ trunc, so Spark's `div` (trunc) and the
        // oracle's `//` (floor) provably agree even on negative sums
        """case when wtot = 0 then 0L else
          | cast((wsum - (wsum % wtot)) div wtot as bigint) end
          | as strat_micro""".stripMargin.replace("\n", " "))
  }

  def qStratEffect(spark: SparkSession, dir: String): DataFrame =
    stratEffect(Tables(spark, dir, "events"))

  /** SIMPSON'S-PARADOX CHECK — the per-stratum table the pooled
    * readout averages over, published row by row with the pooled
    * (naive) effect beside each stratum and an explicit
    * `sign_reversed` flag: a stratum whose within-stratum effect
    * points the OTHER way from the pooled difference is exactly the
    * aggregation-reversal Simpson 1951 warned about, and the single
    * most common way a dashboard's topline misleads. Any flagged row
    * means "the pooled number is not the story — read the strata"
    * (and [[stratEffect]]'s strat_micro is the corrected combine).
    * Same scan, same ≤10-row table, zero new corpus-sized work. */
  def qSimpsonCheck(spark: SparkSession, dir: String): DataFrame = {
    val pu = Cuped.perUser(Tables(spark, dir, "events"))
    val naive = pu.agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("s_t"),
        sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("s_c"))
      .selectExpr(
        """case when n_t = 0 or n_c = 0 then 0L else
          | cast(round(1000000.0 * (s_t / cast(n_t as double)
          |   - s_c / cast(n_c as double))) as bigint) end
          | as naive_micro""".stripMargin.replace("\n", " "))
    perStratumTable(pu)
      .crossJoin(broadcast(naive))
      .selectExpr("stratum", "n_t", "n_c", "w", "effect_micro",
        "naive_micro",
        """effect_micro is not null and
          | ((effect_micro > 0 and naive_micro < 0) or
          |  (effect_micro < 0 and naive_micro > 0))
          | as sign_reversed""".stripMargin.replace("\n", " "))
  }

  val qSimpsonCheckSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS x,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END) AS y,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |mx AS (SELECT MAX(x) AS max_x FROM pu),
       |strata AS (
       |  SELECT (x * $nStrata) // (max_x + 1) AS stratum,
       |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_t,
       |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_c,
       |    SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS s_t,
       |    SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS s_c
       |  FROM pu, mx GROUP BY 1),
       |per AS (
       |  SELECT stratum, n_t, n_c, n_t + n_c AS w,
       |    CASE WHEN n_t = 0 OR n_c = 0 THEN NULL ELSE
       |      CAST(ROUND(1000000.0 * (s_t / CAST(n_t AS DOUBLE)
       |        - s_c / CAST(n_c AS DOUBLE))) AS BIGINT) END
       |      AS effect_micro
       |  FROM strata),
       |naive AS (
       |  SELECT CASE WHEN SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) = 0
       |      OR SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) = 0 THEN 0
       |    ELSE CAST(ROUND(1000000.0
       |      * (SUM(CASE WHEN arm = 1 THEN y ELSE 0 END)
       |         / CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
       |             AS DOUBLE)
       |         - SUM(CASE WHEN arm = 0 THEN y ELSE 0 END)
       |         / CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
       |             AS DOUBLE))) AS BIGINT) END AS naive_micro
       |  FROM pu)
       |SELECT CAST(p.stratum AS BIGINT) AS stratum,
       |  CAST(p.n_t AS BIGINT) AS n_t, CAST(p.n_c AS BIGINT) AS n_c,
       |  CAST(p.w AS BIGINT) AS w, p.effect_micro,
       |  n.naive_micro,
       |  p.effect_micro IS NOT NULL AND
       |    ((p.effect_micro > 0 AND n.naive_micro < 0) OR
       |     (p.effect_micro < 0 AND n.naive_micro > 0)) AS sign_reversed
       |FROM per p CROSS JOIN naive n""".stripMargin

  val qStratEffectSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS x,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END) AS y,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |mx AS (SELECT MAX(x) AS max_x FROM pu),
       |strata AS (
       |  SELECT (x * $nStrata) // (max_x + 1) AS stratum,
       |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_t,
       |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_c,
       |    SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS s_t,
       |    SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS s_c
       |  FROM pu, mx GROUP BY 1),
       |per AS (
       |  SELECT stratum, n_t, n_c, s_t, s_c, n_t + n_c AS w,
       |    CASE WHEN n_t = 0 OR n_c = 0 THEN NULL ELSE
       |      CAST(ROUND(1000000.0 * (s_t / CAST(n_t AS DOUBLE)
       |        - s_c / CAST(n_c AS DOUBLE))) AS BIGINT) END
       |      AS effect_micro
       |  FROM strata)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
       |  CAST(SUM(CASE WHEN effect_micro IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_strata_used,
       |  CASE WHEN SUM(n_t) = 0 OR SUM(n_c) = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * (SUM(s_t) / CAST(SUM(n_t) AS DOUBLE)
       |      - SUM(s_c) / CAST(SUM(n_c) AS DOUBLE))) AS BIGINT) END
       |    AS naive_micro,
       |  CASE WHEN SUM(CASE WHEN effect_micro IS NOT NULL THEN w
       |      ELSE 0 END) = 0 THEN 0 ELSE
       |    CAST((SUM(CASE WHEN effect_micro IS NOT NULL
       |          THEN w * effect_micro ELSE 0 END)
       |        - (SUM(CASE WHEN effect_micro IS NOT NULL
       |            THEN w * effect_micro ELSE 0 END)
       |          % SUM(CASE WHEN effect_micro IS NOT NULL THEN w
       |              ELSE 0 END)))
       |      // SUM(CASE WHEN effect_micro IS NOT NULL THEN w ELSE 0 END)
       |      AS BIGINT) END AS strat_micro
       |FROM per""".stripMargin
}
