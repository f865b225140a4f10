package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** PERMUTATION TEST (Fisher 1935; the exact-inference gold standard
  * behind every "shuffle the labels" significance check): is the
  * observed arm difference in per-user spend larger than what random
  * re-assignment of the SAME users produces? Unlike the Welch t
  * ([[AbTest]]) it assumes nothing about the spend distribution —
  * with B re-assignments the p-value is (1 + #{|Δ_b| ≥ |Δ_obs|}) /
  * (B + 1), the add-one form that is exact-level even at finite B
  * (Phipson & Smyth 2010).
  *
  * Re-assignments are SEEDED md5 coins on (salt, b, user_id) — the
  * repo's replayable-sampler convention ([[graft.ext.BootstrapCi]]):
  * every permutation is reproducible and oracle-replayable, and a
  * deployment rotates the salt per analysis. (A hash coin re-draws
  * arms i.i.d. rather than permuting the fixed arm-size vector — the
  * "random re-randomization" variant of the test, which is the
  * standard design-based form when the original assignment was
  * itself a hash coin, as it is here.)
  *
  * DETERMINISM. Per-(b, arm) sums/counts are exact integers; each
  * Δ_b is ONE micro-quantized mirrored double expression; the
  * extreme-count comparison runs on quantized integers. No libm.
  *
  * SCALE. One events scan → per-user table (|users| rows), then a
  * broadcast fan-out over the B-row draw table with MAP-SIDE COMBINE
  * to 2B cells per partition — the shuffle carries O(B·partitions)
  * rows regardless of corpus size, and nothing sorts. */
object PermTest {

  /** Permutations; p-value resolution 1/(B+1). */
  val permB = 199

  val salt = "permv1"

  /** Per-user (arm, cents) — [[AbTest.perUserArm]]'s spend columns. */
  def permTest(events: DataFrame): DataFrame =
    permTestFromPerUser(
      AbTest.perUserArm(events).select("user_id", "arm", "cents"))

  /** The test from any (user_id, arm, cents) per-user frame
    * (streaming-store entry, the [[AbTest.abTestFromPerUser]]
    * contract). */
  def permTestFromPerUser(pu: DataFrame): DataFrame = {
    val spark = pu.sparkSession
    def eff(s1: String, n1: String, s0: String, n0: String): String =
      s"""cast(round(1000000.0 * ($s1 / cast($n1 as double)
         | - $s0 / cast($n0 as double))) as bigint)"""
        .stripMargin.replace("\n", " ")
    // same exact-integer empty-arm guard as the permutation leg: an
    // observed design with an empty arm makes 0/0 NaN (ANSI-throwing
    // on Spark, an outright error in DuckDB); obs_micro = 0 makes
    // every draw extreme → p ≈ 1, the conservative abstention
    val obs = pu.agg(
        sum(when(col("arm") === 1, col("cents")).otherwise(0L)).as("s1"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0, col("cents")).otherwise(0L)).as("s0"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"))
      .selectExpr(
        s"""case when n1 = 0 or n0 = 0 then 0L else
           | ${eff("s1", "n1", "s0", "n0")} end as obs_micro"""
          .stripMargin.replace("\n", " "))
    val draws = spark.range(1, permB + 1).select(col("id").as("b"))
    val perms = pu.crossJoin(broadcast(draws))
      .withColumn("parm",
        conv(substring(md5(concat(lit(salt + ":"), col("b"), lit(":"),
          col("user_id")).cast(BinaryType)), 1, 15), 16, 10)
          .cast(LongType) % 2)
      .groupBy("b").agg(
        sum(when(col("parm") === 1, col("cents")).otherwise(0L)).as("s1"),
        sum(when(col("parm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("parm") === 0, col("cents")).otherwise(0L)).as("s0"),
        sum(when(col("parm") === 0, 1L).otherwise(0L)).as("n0"))
      // a permutation that empties an arm can't produce a Δ: count it
      // extreme (conservative, and engine-portable as an integer rule)
      .selectExpr("b", "n1", "n0",
        s"""case when n1 = 0 or n0 = 0 then null else
           | ${eff("s1", "n1", "s0", "n0")} end as d_micro"""
          .stripMargin.replace("\n", " "))
    perms.crossJoin(broadcast(obs)).agg(
        count(lit(1)).as("b_total"),
        sum(when(col("d_micro").isNull ||
          abs(col("d_micro")) >= abs(col("obs_micro")), 1L).otherwise(0L))
          .as("n_extreme"),
        max(col("obs_micro")).as("obs_micro"))
      .selectExpr("cast(b_total as bigint) as b_total", "obs_micro",
        "cast(n_extreme as bigint) as n_extreme",
        """cast(round(1000000.0 * (1 + n_extreme)
          | / cast(1 + b_total as double)) as bigint) as p_micro"""
          .stripMargin.replace("\n", " "))
      .withColumn("significant", col("p_micro") < 50000L)
  }

  def qPermTest(spark: SparkSession, dir: String): DataFrame =
    permTest(Tables(spark, dir, "events"))

  val qPermTestSql: String = {
    def eff(s1: String, n1: String, s0: String, n0: String): String =
      s"""CAST(ROUND(1000000.0 * ($s1 / CAST($n1 AS DOUBLE)
         | - $s0 / CAST($n0 AS DOUBLE))) AS BIGINT)"""
        .stripMargin.replace("\n", " ")
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
       |      AS cents,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |obs0 AS MATERIALIZED (
       |  SELECT
       |    SUM(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS s1,
       |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
       |    SUM(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS s0,
       |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0
       |  FROM pu),
       |obs AS MATERIALIZED (
       |  SELECT CASE WHEN n1 = 0 OR n0 = 0 THEN 0 ELSE
       |    ${eff("s1", "n1", "s0", "n0")} END AS obs_micro
       |  FROM obs0),
       |perms AS MATERIALIZED (
       |  SELECT tb.b,
       |    SUM(CASE WHEN CAST(CAST('0x' || substr(md5(
       |        '$salt:' || CAST(tb.b AS VARCHAR) || ':'
       |          || CAST(pu.user_id AS VARCHAR)), 1, 15)
       |        AS UBIGINT) AS BIGINT) % 2 = 1 THEN cents ELSE 0 END) AS s1,
       |    SUM(CASE WHEN CAST(CAST('0x' || substr(md5(
       |        '$salt:' || CAST(tb.b AS VARCHAR) || ':'
       |          || CAST(pu.user_id AS VARCHAR)), 1, 15)
       |        AS UBIGINT) AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END) AS n1,
       |    SUM(CASE WHEN CAST(CAST('0x' || substr(md5(
       |        '$salt:' || CAST(tb.b AS VARCHAR) || ':'
       |          || CAST(pu.user_id AS VARCHAR)), 1, 15)
       |        AS UBIGINT) AS BIGINT) % 2 = 0 THEN cents ELSE 0 END) AS s0,
       |    SUM(CASE WHEN CAST(CAST('0x' || substr(md5(
       |        '$salt:' || CAST(tb.b AS VARCHAR) || ':'
       |          || CAST(pu.user_id AS VARCHAR)), 1, 15)
       |        AS UBIGINT) AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END) AS n0
       |  FROM pu, UNNEST(generate_series(1, $permB)) AS tb(b)
       |  GROUP BY tb.b),
       |deltas AS (
       |  SELECT b, n1, n0,
       |    CASE WHEN n1 = 0 OR n0 = 0 THEN NULL
       |      ELSE ${eff("s1", "n1", "s0", "n0")} END AS d_micro
       |  FROM perms),
       |agg AS (
       |  SELECT COUNT(*) AS b_total,
       |    SUM(CASE WHEN d_micro IS NULL
       |        OR ABS(d_micro) >= ABS(obs_micro) THEN 1 ELSE 0 END)
       |      AS n_extreme,
       |    MAX(obs_micro) AS obs_micro
       |  FROM deltas, obs)
       |SELECT CAST(b_total AS BIGINT) AS b_total, obs_micro,
       |  CAST(n_extreme AS BIGINT) AS n_extreme,
       |  CAST(ROUND(1000000.0 * (1 + n_extreme)
       |    / CAST(1 + b_total AS DOUBLE)) AS BIGINT) AS p_micro,
       |  CAST(ROUND(1000000.0 * (1 + n_extreme)
       |    / CAST(1 + b_total AS DOUBLE)) AS BIGINT) < 50000 AS significant
       |FROM agg""".stripMargin
  }
}
