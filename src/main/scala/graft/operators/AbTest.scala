package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** A/B EXPERIMENT ANALYSIS over the event stream — the readout every
  * product experiment (and every data-recipe experiment: tokenizer A
  * vs B, filter threshold A vs B) ends in. Users are split into two
  * arms by a deterministic md5 coin on user_id (the repo-wide seeded
  * assignment convention — replayable, engine-portable, and exactly
  * what production bucketing systems do), and two primary metrics are
  * tested:
  *
  *  - CONVERSION (binary per user: ≥ [[convMin]] purchases) —
  *    Pearson chi-square on the 2×2 table, the two-proportion z-test
  *    squared.
  *  - SPEND (per-user purchase cents) — Welch's unequal-variance t
  *    statistic against the large-sample normal critical value.
  *
  * DETERMINISM. Both statistics are pure functions of exact INTEGER
  * sufficient statistics (n, converted, Σcents, Σcents² per arm —
  * one corpus scan, map-side partial aggregation, a 2-row shuffle).
  * The float math on top is mul/div/sqrt only — every one of those is
  * IEEE-754 correctly-rounded, so identical expression shape gives
  * bit-identical doubles in any engine (unlike ln/exp, the libm
  * functions the LM-score family has to pre-quantize). Squares and
  * square-sums ride DECIMAL(38,0)/HUGEINT so no intermediate can
  * overflow at 100 TB user counts; each reported number is one
  * ROUND(1e6·x) of one shared-shape double expression.
  *
  * Output (one row per metric, uniform schema):
  *   (metric, n_t, n_c, mean_t_micro, mean_c_micro, effect_micro,
  *    stat_micro, significant)
  * conversion: means are rates, stat is chi², significant at
  * χ²₀.₀₅,₁ = 3.841459; spend: means are cents, stat is Welch t,
  * significant at |t| ≥ 1.959964. */
object AbTest {

  /** Conversion threshold: ≥ this many purchase events (the per-user
    * median at the test scales is ~13, so the split is informative). */
  val convMin = 14

  /** χ²₀.₀₅ with 1 df, micro-quantized. */
  val chi2CritMicro = 3841459L

  /** Two-sided normal z₀.₀₂₅, micro-quantized. */
  val zCritMicro = 1959964L

  /** The experiment-family arm coin: deterministic md5 bucketing on
    * the user key — replayable, engine-portable, and exactly what
    * production assignment services do. ONE definition point so every
    * test (chi²/Welch, CUPED, DiD, permutation, SPRT, Mann-Whitney)
    * and the streaming [[graft.streaming.ExperimentStore]] split users
    * identically. */
  def armOf(user: Column): Column =
    conv(substring(md5(user.cast(StringType).cast(BinaryType)), 1, 15),
      16, 10).cast(LongType) % 2

  /** Per-user (arm, purchases, cents) — the one corpus scan both
    * tests (and [[qMannWhitney]]) share. Cents are exact integers
    * (round(value·100): the double product is IEEE-identical in any
    * engine, so the integer cents are too). */
  def perUserArm(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchases"),
        sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100.0) as bigint)")).otherwise(0L))
          .as("cents"))
      .withColumn("arm", armOf(col("user_id")))

  def abTest(events: DataFrame): DataFrame =
    abTestFromPerUser(perUserArm(events))

  /** The readout from any (arm, purchases, cents) per-user frame —
    * the entry the streaming [[graft.streaming.ExperimentStore]]
    * serves its live view through (per-user totals are a per-key sum
    * monoid, so the served statistics are EQUAL to this batch path
    * over the absorbed corpus). */
  def abTestFromPerUser(pu: DataFrame): DataFrame = {
    // exact integer sufficient statistics, one 2-row-output agg;
    // Σcents² in DECIMAL(38,0) (HUGEINT on the oracle side) so the
    // square-sum can't overflow at any user count
    val suff = pu.agg(
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
      sum(when(col("arm") === 1 && col("purchases") >= convMin, 1L)
        .otherwise(0L)).as("x_t"),
      sum(when(col("arm") === 0 && col("purchases") >= convMin, 1L)
        .otherwise(0L)).as("x_c"),
      sum(when(col("arm") === 1, col("cents")).otherwise(0L)).as("s_t"),
      sum(when(col("arm") === 0, col("cents")).otherwise(0L)).as("s_c"),
      sum(when(col("arm") === 1,
        col("cents").cast(DecimalType(38, 0)) * col("cents"))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as("q_t"),
      sum(when(col("arm") === 0,
        col("cents").cast(DecimalType(38, 0)) * col("cents"))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as("q_c"))
    // chi² on the 2×2 — (ad−bc) exact in long, squared in double;
    // Welch t from (n, S, Q) per arm. Expression shape mirrors the
    // oracle text token for token (IEEE mul/div/sqrt only). Degenerate
    // designs (no conversions anywhere, zero variance in both arms,
    // an arm smaller than 2) make the statistic 0/0 — under ANSI both
    // engines would THROW on casting the NaN, so each stat carries an
    // explicit exact-integer guard and reports 0 (test abstains).
    val derived = suff.selectExpr("*",
      "x_t * (n_c - x_c) - (n_t - x_t) * x_c as dd",
      "x_t + x_c as r1",
      "(n_t - x_t) + (n_c - x_c) as r0",
      "n_t * q_t - s_t * cast(s_t as decimal(38,0)) as vt_num",
      "n_c * q_c - s_c * cast(s_c as decimal(38,0)) as vc_num")
    // mean/effect micros carry the SAME exact-integer empty-arm guard
    // as the statistics: 0/0 is NaN, and casting NaN to BIGINT throws
    // under ANSI on Spark but errors outright in DuckDB — the guard
    // keeps the degenerate design an abstention (0) in both engines
    derived.selectExpr(
      s"""stack(2,
         |'conversion', n_t, n_c,
         |  case when n_t = 0 then 0L else
         |    cast(round(1000000.0 * x_t / n_t) as bigint) end,
         |  case when n_c = 0 then 0L else
         |    cast(round(1000000.0 * x_c / n_c) as bigint) end,
         |  case when n_t = 0 or n_c = 0 then 0L else
         |  cast(round(1000000.0 * (x_t / cast(n_t as double)
         |    - x_c / cast(n_c as double))) as bigint) end,
         |  case when r1 = 0 or r0 = 0 then 0L else
         |  cast(round(1000000.0 * (n_t + n_c)
         |    * cast(dd as double) * cast(dd as double)
         |    / (cast(n_t as double) * n_c * r1 * r0)) as bigint) end,
         |'spend', n_t, n_c,
         |  case when n_t = 0 then 0L else
         |    cast(round(1000000.0 * s_t / n_t) as bigint) end,
         |  case when n_c = 0 then 0L else
         |    cast(round(1000000.0 * s_c / n_c) as bigint) end,
         |  case when n_t = 0 or n_c = 0 then 0L else
         |  cast(round(1000000.0 * (s_t / cast(n_t as double)
         |    - s_c / cast(n_c as double))) as bigint) end,
         |  case when n_t < 2 or n_c < 2
         |    or (vt_num = 0 and vc_num = 0) then 0L else
         |  cast(round(1000000.0
         |    * (s_t / cast(n_t as double) - s_c / cast(n_c as double))
         |    / sqrt(
         |      cast(vt_num as double)
         |        / (cast(n_t as double) * n_t * (n_t - 1))
         |      + cast(vc_num as double)
         |        / (cast(n_c as double) * n_c * (n_c - 1)))) as bigint)
         |  end
         |) as (metric, n_t, n_c, mean_t_micro, mean_c_micro,
         |      effect_micro, stat_micro)""".stripMargin.replace("\n", " "))
      .withColumn("significant",
        when(col("metric") === "conversion",
          col("stat_micro") >= chi2CritMicro)
          .otherwise(abs(col("stat_micro")) >= zCritMicro))
  }

  def qAbTest(spark: SparkSession, dir: String): DataFrame =
    abTest(Tables(spark, dir, "events"))

  val qAbTestSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS purchases,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
       |      AS cents,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |suff AS MATERIALIZED (
       |  SELECT
       |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_t,
       |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_c,
       |    SUM(CASE WHEN arm = 1 AND purchases >= $convMin
       |        THEN 1 ELSE 0 END) AS x_t,
       |    SUM(CASE WHEN arm = 0 AND purchases >= $convMin
       |        THEN 1 ELSE 0 END) AS x_c,
       |    SUM(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS s_t,
       |    SUM(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS s_c,
       |    SUM(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END) AS q_t,
       |    SUM(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END) AS q_c
       |  FROM pu),
       |derived AS MATERIALIZED (
       |  SELECT *,
       |    x_t * (n_c - x_c) - (n_t - x_t) * x_c AS dd,
       |    x_t + x_c AS r1,
       |    (n_t - x_t) + (n_c - x_c) AS r0,
       |    n_t * q_t - s_t * s_t AS vt_num,
       |    n_c * q_c - s_c * s_c AS vc_num
       |  FROM suff),
       |conv_stat AS (
       |  SELECT *,
       |    CASE WHEN r1 = 0 OR r0 = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * (n_t + n_c)
       |      * CAST(dd AS DOUBLE) * CAST(dd AS DOUBLE)
       |      / (CAST(n_t AS DOUBLE) * n_c * r1 * r0)) AS BIGINT) END
       |      AS chi2_micro,
       |    CASE WHEN n_t < 2 OR n_c < 2
       |      OR (vt_num = 0 AND vc_num = 0) THEN 0 ELSE
       |    CAST(ROUND(1000000.0
       |      * (s_t / CAST(n_t AS DOUBLE) - s_c / CAST(n_c AS DOUBLE))
       |      / SQRT(
       |        CAST(vt_num AS DOUBLE)
       |          / (CAST(n_t AS DOUBLE) * n_t * (n_t - 1))
       |        + CAST(vc_num AS DOUBLE)
       |          / (CAST(n_c AS DOUBLE) * n_c * (n_c - 1)))) AS BIGINT)
       |    END AS t_micro
       |  FROM derived)
       |SELECT 'conversion' AS metric, CAST(n_t AS BIGINT) AS n_t,
       |  CAST(n_c AS BIGINT) AS n_c,
       |  CASE WHEN n_t = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * x_t / n_t) AS BIGINT) END AS mean_t_micro,
       |  CASE WHEN n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * x_c / n_c) AS BIGINT) END AS mean_c_micro,
       |  CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE
       |  CAST(ROUND(1000000.0 * (x_t / CAST(n_t AS DOUBLE)
       |    - x_c / CAST(n_c AS DOUBLE))) AS BIGINT) END AS effect_micro,
       |  chi2_micro AS stat_micro,
       |  chi2_micro >= $chi2CritMicro AS significant
       |FROM conv_stat
       |UNION ALL
       |SELECT 'spend' AS metric, CAST(n_t AS BIGINT),
       |  CAST(n_c AS BIGINT),
       |  CASE WHEN n_t = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * s_t / n_t) AS BIGINT) END,
       |  CASE WHEN n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * s_c / n_c) AS BIGINT) END,
       |  CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE
       |  CAST(ROUND(1000000.0 * (s_t / CAST(n_t AS DOUBLE)
       |    - s_c / CAST(n_c AS DOUBLE))) AS BIGINT) END,
       |  t_micro,
       |  ABS(t_micro) >= $zCritMicro AS significant
       |FROM conv_stat""".stripMargin

  // ---------------------------------------------------------------
  // MANN-WHITNEY U — the nonparametric twin: rank-based, exact
  // integers end to end (the spend distribution is skewed enough
  // that the rank test is what a careful analyst actually reports).
  // ---------------------------------------------------------------

  /** Mann-Whitney U (Wilcoxon rank-sum) on per-user spend between the
    * two arms, with the normal approximation and tie correction
    * (Lehmann 1975). EVERYTHING up to the final z is exact integers:
    * tied observations take average ranks, so all rank bookkeeping is
    * DOUBLED (2·rank is an integer even for .5 averages) — for a
    * value group of size m with c observations strictly below, every
    * member's doubled rank is 2c + m + 1, and an arm's doubled rank
    * sum is Σ m_arm·(2c + m + 1) over value groups. The cumulative c
    * comes from [[PrefixSum]]'s range-partitioned running total over
    * the distinct-value table — NO single-partition window. The tie
    * correction Σ(m³−m) rides DECIMAL(38,0)/HUGEINT.
    *
    * Output (1 row): (n_t, n_c, u2_t = 2·U_t, z_micro, significant) —
    * z = (2U − n_t·n_c) / 2σ_U with the tie-corrected
    * σ²_U = n_t·n_c/12·((N+1) − Σ(m³−m)/(N(N−1))). */
  def mannWhitney(events: DataFrame): DataFrame =
    mannWhitneyFromPerUser(perUserArm(events))

  /** Rank-sum from any (arm, cents) per-user frame (streaming-store
    * entry, same contract as [[abTestFromPerUser]]). */
  def mannWhitneyFromPerUser(pu: DataFrame): DataFrame = {
    val groups = pu.groupBy("cents").agg(
      count(lit(1)).as("m"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("m_t"))
    val (run, release) = {
      val t = PrefixSum.withRunningTotalTracked(
        groups, Seq(col("cents").asc), "m", "run")
      (t.df, () => t.checkpoint.unpersist(blocking = false))
    }
    try {
      val agg = run
        .select(col("m"), col("m_t"),
          (col("run") - col("m")).as("c"),
          (col("m").cast(DecimalType(38, 0)) * col("m") * col("m")
            - col("m")).as("ties"))
        .agg(
          sum(col("m_t")).as("n_t"),
          sum(col("m") - col("m_t")).as("n_c"),
          // r2_t is Σ m_t·(2c+m+1) ~ N² — the same O(N²)-mass quantity
          // Auc rides on DECIMAL(38,0): Long would wrap (or throw under
          // ANSI) at 100 TB user counts while the oracle's SUM promotes
          // to HUGEINT, so the accumulation is decimal on both engines
          sum(col("m_t").cast(DecimalType(38, 0))
            * (lit(2L) * col("c") + col("m") + 1L)).as("r2_t"),
          sum(col("ties")).cast(DecimalType(38, 0)).as("tie_sum"))
      // σ_U = 0 exactly when every observation is tied (one value
      // group of size N: tie_sum = N(N−1)(N+1)) or an arm is empty —
      // the exact-integer guard keeps ANSI from throwing on NaN
      agg.selectExpr(
        "cast(n_t as bigint) as n_t",
        "cast(n_c as bigint) as n_c",
        "cast(r2_t - n_t * (n_t + 1) as bigint) as u2_t",
        """case when n_t = 0 or n_c = 0 or tie_sum =
          |  cast(n_t + n_c as decimal(38,0)) * (n_t + n_c - 1)
          |    * (n_t + n_c + 1) then 0L else
          |cast(round(1000000.0
          |  * (cast(r2_t - n_t * (n_t + 1) as double) - cast(n_t as double) * n_c)
          |  / (2.0 * sqrt(cast(n_t as double) * n_c / 12.0
          |    * ((n_t + n_c + 1)
          |       - cast(tie_sum as double)
          |         / (cast(n_t + n_c as double) * (n_t + n_c - 1))))))
          |  as bigint) end as z_micro""".stripMargin.replace("\n", " "))
        .withColumn("significant", abs(col("z_micro")) >= zCritMicro)
        // the one-row result must outlive the released checkpoint
        .localCheckpoint()
    } finally release()
  }

  def qMannWhitney(spark: SparkSession, dir: String): DataFrame =
    mannWhitney(Tables(spark, dir, "events"))

  // ---------------------------------------------------------------
  // CLIFF'S DELTA — the ORDINAL EFFECT SIZE the rank test's z can't
  // give you (z grows with n; delta doesn't): the probability a
  // treatment observation exceeds a control one, minus the reverse
  // (Cliff 1993). Identity with the rank machinery above:
  //   delta = (#(t>c) − #(t<c)) / (n_t·n_c) = (2U_t − n_t·n_c) / (n_t·n_c)
  // so u2_t = 2U_t from [[mannWhitneyFromPerUser]] IS the exact
  // integer numerator — zero additional corpus passes.
  // ---------------------------------------------------------------

  /** Romano et al. 2006 magnitude fences, micro-quantized |delta|:
    * < .147 negligible, < .33 small, < .474 medium, else large. */
  val cliffSmallMicro = 147000L
  val cliffMediumMicro = 330000L
  val cliffLargeMicro = 474000L

  /** Cliff's delta on per-user spend between the arms, 1 row:
    * (n_t, n_c, delta_micro, magnitude). Everything up to the one
    * float division is the exact doubled-rank bookkeeping of
    * [[mannWhitneyFromPerUser]]; the magnitude label compares the
    * identically-rounded delta_micro on both engines. */
  def cliffsDelta(events: DataFrame): DataFrame =
    cliffsDeltaFromPerUser(perUserArm(events))

  /** Effect size from any (arm, cents) per-user frame
    * (streaming-store entry, same contract as [[abTestFromPerUser]]). */
  def cliffsDeltaFromPerUser(pu: DataFrame): DataFrame =
    mannWhitneyFromPerUser(pu).selectExpr(
        "n_t", "n_c",
        """case when n_t = 0 or n_c = 0 then 0L else
          |cast(round(1000000.0
          |  * (cast(u2_t as double) - cast(n_t as double) * n_c)
          |  / (cast(n_t as double) * n_c)) as bigint) end
          |as delta_micro""".stripMargin.replace("\n", " "))
      .selectExpr("n_t", "n_c", "delta_micro",
        s"""case when abs(delta_micro) < $cliffSmallMicro
           |  then 'negligible'
           |when abs(delta_micro) < $cliffMediumMicro then 'small'
           |when abs(delta_micro) < $cliffLargeMicro then 'medium'
           |else 'large' end as magnitude"""
          .stripMargin.replace("\n", " "))

  def qCliffsDelta(spark: SparkSession, dir: String): DataFrame =
    cliffsDelta(Tables(spark, dir, "events"))

  /** Declared after [[qMannWhitneySql]] (object-init order: the
    * embedded CTE text must already be populated). */
  lazy val qCliffsDeltaSql: String =
    s"""WITH mw AS MATERIALIZED ($qMannWhitneySql),
       |d AS (
       |  SELECT n_t, n_c,
       |    CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE
       |      CAST(ROUND(1000000.0
       |        * (CAST(u2_t AS DOUBLE) - CAST(n_t AS DOUBLE) * n_c)
       |        / (CAST(n_t AS DOUBLE) * n_c)) AS BIGINT) END
       |      AS delta_micro
       |  FROM mw)
       |SELECT n_t, n_c, delta_micro,
       |  CASE WHEN ABS(delta_micro) < $cliffSmallMicro THEN 'negligible'
       |    WHEN ABS(delta_micro) < $cliffMediumMicro THEN 'small'
       |    WHEN ABS(delta_micro) < $cliffLargeMicro THEN 'medium'
       |    ELSE 'large' END AS magnitude
       |FROM d""".stripMargin

  val qMannWhitneySql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
       |      AS cents,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |groups AS (
       |  SELECT cents, CAST(COUNT(*) AS BIGINT) AS m,
       |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS m_t
       |  FROM pu GROUP BY cents),
       |run AS (
       |  SELECT m, m_t,
       |    SUM(m) OVER (ORDER BY cents
       |      ROWS UNBOUNDED PRECEDING) - m AS c,
       |    m * m * m - m AS ties
       |  FROM groups),
       |agg AS (
       |  SELECT SUM(m_t) AS n_t, SUM(m - m_t) AS n_c,
       |    SUM(m_t * (2 * c + m + 1)) AS r2_t,
       |    SUM(ties) AS tie_sum
       |  FROM run),
       |zed AS (
       |  SELECT *,
       |    CASE WHEN n_t = 0 OR n_c = 0 OR tie_sum =
       |      (n_t + n_c) * (n_t + n_c - 1) * (n_t + n_c + 1) THEN 0 ELSE
       |    CAST(ROUND(1000000.0
       |      * (CAST(r2_t - n_t * (n_t + 1) AS DOUBLE) - CAST(n_t AS DOUBLE) * n_c)
       |      / (2.0 * SQRT(CAST(n_t AS DOUBLE) * n_c / 12.0
       |        * ((n_t + n_c + 1)
       |           - CAST(tie_sum AS DOUBLE)
       |             / (CAST(n_t + n_c AS DOUBLE) * (n_t + n_c - 1))))))
       |      AS BIGINT) END AS z_micro
       |  FROM agg)
       |SELECT CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
       |  CAST(r2_t - n_t * (n_t + 1) AS BIGINT) AS u2_t,
       |  z_micro,
       |  ABS(z_micro) >= $zCritMicro AS significant
       |FROM zed""".stripMargin
}
