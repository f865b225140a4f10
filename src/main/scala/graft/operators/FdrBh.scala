package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** MULTIPLE-TESTING GOVERNANCE — the missing piece over a suite that
  * now ships a dozen significance readouts: run the SAME experiment
  * comparison across every event type (a metric BATTERY — "did the
  * treatment move views? carts? purchases? …") and control the false
  * discovery rate across the battery with Benjamini-Hochberg 1995,
  * instead of letting m marginal α = 0.05 tests ship ~m·0.05 false
  * positives. The per-metric test is [[PermTest]]'s exact design-based
  * permutation test (same seeded-coin convention, same add-one
  * Phipson-Smyth p), so the p-values BH consumes are exact integers —
  * which makes the BH step itself EXACT: p_(k) ≤ k·α/m compares as
  * p_micro·m ≤ k·α_micro in integers, no float boundary cases.
  *
  * ONE permutation schedule is shared by the whole battery (the
  * md5(salt, b, user) coin ignores the metric) — the textbook posture:
  * re-randomize the DESIGN once per draw, read every metric off it.
  *
  * Output, one row per event type: the observed per-user rate
  * difference, its exact p, the BH rank, and the BH verdict at
  * [[alphaMicro]].
  *
  * DETERMINISM. Everything [[PermTest]] guarantees, per type; the BH
  * rank is a window over the ≤ |event types| battery table with a
  * type-name tiebreak; the cutoff rule is pure integer arithmetic.
  *
  * SCALE. One events scan → per-(user, type) counts + one per-user
  * arm table; the B-draw broadcast fan-out aggregates with MAP-SIDE
  * COMBINE to ≤ m·2B cells per partition (B = [[PermTest.permB]],
  * m bounded) — the shuffle carries O(m·B·partitions) rows regardless
  * of corpus size; BH runs on the m-row battery table. */
object FdrBh {

  val alphaMicro = 50000L // α = 0.05, micro units

  val salt = "fdrv1"

  /** Per-type permutation p-values + BH from (user_id, arm) and
    * (user_id, event_type, c) frames. */
  def fdrBattery(users: DataFrame, utc: DataFrame): DataFrame = {
    val spark = users.sparkSession
    val b = PermTest.permB
    def eff(s1: String, n1: String, s0: String, n0: String): String =
      s"""cast(round(1000000.0 * ($s1 / cast($n1 as double)
         | - $s0 / cast($n0 as double))) as bigint)"""
        .stripMargin.replace("\n", " ")
    // observed per-arm user counts (shared by every metric)
    val armN = users.agg(
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"))
    val obs = utc.join(users, "user_id")
      .groupBy("event_type").agg(
        sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("s1"),
        sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("s0"))
      .crossJoin(broadcast(armN))
      .selectExpr("event_type",
        s"""case when n1 = 0 or n0 = 0 then 0L else
           | ${eff("s1", "n1", "s0", "n0")} end as obs_micro"""
          .stripMargin.replace("\n", " "))
    val draws = spark.range(1, b + 1).select(col("id").as("b"))
    def coin(user: Column, bCol: Column): Column =
      conv(substring(md5(concat(lit(salt + ":"), bCol, lit(":"), user)
        .cast(BinaryType)), 1, 15), 16, 10).cast(LongType) % 2
    // permuted arm sizes, per draw (users table × B — map-side combine
    // to 2 cells per (partition, b))
    val permN = users.crossJoin(broadcast(draws))
      .withColumn("parm", coin(col("user_id"), col("b")))
      .groupBy("b").agg(
        sum(when(col("parm") === 1, 1L).otherwise(0L)).as("pn1"),
        sum(when(col("parm") === 0, 1L).otherwise(0L)).as("pn0"))
    // permuted per-type sums (the SAME coin — one design per draw)
    val permS = utc.crossJoin(broadcast(draws))
      .withColumn("parm", coin(col("user_id"), col("b")))
      .groupBy("event_type", "b").agg(
        sum(when(col("parm") === 1, col("c")).otherwise(0L)).as("ps1"),
        sum(when(col("parm") === 0, col("c")).otherwise(0L)).as("ps0"))
    val perms = permS.join(permN, "b")
      .selectExpr("event_type",
        s"""case when pn1 = 0 or pn0 = 0 then null else
           | ${eff("ps1", "pn1", "ps0", "pn0")} end as d_micro"""
          .stripMargin.replace("\n", " "))
    val pvals = perms.join(obs, "event_type")
      .groupBy("event_type").agg(
        count(lit(1)).as("b_total"),
        sum(when(col("d_micro").isNull ||
          abs(col("d_micro")) >= abs(col("obs_micro")), 1L)
          .otherwise(0L)).as("n_extreme"),
        max(col("obs_micro")).as("obs_micro"))
      .selectExpr("event_type", "obs_micro",
        """cast(round(1000000.0 * (1 + n_extreme)
          | / cast(1 + b_total as double)) as bigint) as p_micro"""
          .stripMargin.replace("\n", " "))
    // BH over the ≤ m-row battery: bounded-domain window; the cutoff
    // k* = max{k : p_(k)·m ≤ k·α} and every rank ≤ k* rejects
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("p_micro").asc, col("event_type").asc)
    val mCount = pvals.agg(count(lit(1)).as("m"))
    val ranked = pvals
      .withColumn("p_rank", row_number().over(w).cast("bigint"))
      .crossJoin(broadcast(mCount))
      .withColumn("bh_ok",
        col("p_micro") * col("m") <= col("p_rank") * lit(alphaMicro))
    val cutoff = ranked.agg(
      coalesce(max(when(col("bh_ok"), col("p_rank"))), lit(0L)).as("kstar"))
    ranked.crossJoin(broadcast(cutoff))
      .selectExpr("event_type", "obs_micro", "p_micro", "p_rank",
        "cast(m as bigint) as m_tests",
        "p_rank <= kstar as bh_reject")
  }

  /** The battery from the (user_id, event_type, c) count table alone —
    * arms recomputed from [[AbTest.armOf]]'s coin, never stored (the
    * [[graft.streaming.ExperimentStore]] convention); this is also the
    * streaming store's read path. */
  def fdrFromCounts(utc: DataFrame): DataFrame = {
    val users = utc.select("user_id").distinct()
      .withColumn("arm", AbTest.armOf(col("user_id")))
    fdrBattery(users, utc)
  }

  def qFdrBh(spark: SparkSession, dir: String): DataFrame =
    fdrFromCounts(Tables(spark, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c")))

  val qFdrBhSql: String = {
    val b = PermTest.permB
    def eff(s1: String, n1: String, s0: String, n0: String): String =
      s"""CAST(ROUND(1000000.0 * ($s1 / CAST($n1 AS DOUBLE)
         | - $s0 / CAST($n0 AS DOUBLE))) AS BIGINT)"""
        .stripMargin.replace("\n", " ")
    s"""WITH users AS MATERIALIZED (
      |  SELECT user_id,
      |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
      |      AS UBIGINT) AS BIGINT) % 2 AS arm
      |  FROM (SELECT DISTINCT user_id FROM events)),
      |utc AS MATERIALIZED (
      |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |arm_n AS MATERIALIZED (
      |  SELECT SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
      |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0
      |  FROM users),
      |obs AS MATERIALIZED (
      |  SELECT event_type,
      |    CASE WHEN a.n1 = 0 OR a.n0 = 0 THEN 0 ELSE
      |      ${eff("SUM(CASE WHEN u.arm = 1 THEN t.c ELSE 0 END)", "a.n1",
                   "SUM(CASE WHEN u.arm = 0 THEN t.c ELSE 0 END)", "a.n0")}
      |    END AS obs_micro
      |  FROM utc t JOIN users u USING (user_id) CROSS JOIN arm_n a
      |  GROUP BY event_type, a.n1, a.n0),
      |draws AS (SELECT unnest(generate_series(1, $b)) AS b),
      |perm_n AS MATERIALIZED (
      |  SELECT d.b,
      |    SUM(CASE WHEN CAST(CAST('0x' || substr(md5(
      |        '$salt:' || CAST(d.b AS VARCHAR) || ':'
      |          || CAST(u.user_id AS VARCHAR)), 1, 15)
      |        AS UBIGINT) AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END) AS pn1,
      |    SUM(CASE WHEN CAST(CAST('0x' || substr(md5(
      |        '$salt:' || CAST(d.b AS VARCHAR) || ':'
      |          || CAST(u.user_id AS VARCHAR)), 1, 15)
      |        AS UBIGINT) AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END) AS pn0
      |  FROM users u CROSS JOIN draws d GROUP BY d.b),
      |perm_s AS MATERIALIZED (
      |  SELECT t.event_type, d.b,
      |    SUM(CASE WHEN CAST(CAST('0x' || substr(md5(
      |        '$salt:' || CAST(d.b AS VARCHAR) || ':'
      |          || CAST(t.user_id AS VARCHAR)), 1, 15)
      |        AS UBIGINT) AS BIGINT) % 2 = 1 THEN t.c ELSE 0 END) AS ps1,
      |    SUM(CASE WHEN CAST(CAST('0x' || substr(md5(
      |        '$salt:' || CAST(d.b AS VARCHAR) || ':'
      |          || CAST(t.user_id AS VARCHAR)), 1, 15)
      |        AS UBIGINT) AS BIGINT) % 2 = 0 THEN t.c ELSE 0 END) AS ps0
      |  FROM utc t CROSS JOIN draws d GROUP BY 1, 2),
      |perms AS MATERIALIZED (
      |  SELECT s.event_type,
      |    CASE WHEN n.pn1 = 0 OR n.pn0 = 0 THEN NULL ELSE
      |      ${eff("s.ps1", "n.pn1", "s.ps0", "n.pn0")} END AS d_micro
      |  FROM perm_s s JOIN perm_n n USING (b)),
      |pvals AS MATERIALIZED (
      |  SELECT p.event_type, o.obs_micro,
      |    CAST(ROUND(1000000.0 * (1 + SUM(CASE WHEN p.d_micro IS NULL
      |        OR ABS(p.d_micro) >= ABS(o.obs_micro) THEN 1 ELSE 0 END))
      |      / CAST(1 + COUNT(*) AS DOUBLE)) AS BIGINT) AS p_micro
      |  FROM perms p JOIN obs o USING (event_type)
      |  GROUP BY p.event_type, o.obs_micro),
      |ranked AS MATERIALIZED (
      |  SELECT event_type, obs_micro, p_micro,
      |    CAST(row_number() OVER (ORDER BY p_micro ASC, event_type ASC)
      |      AS BIGINT) AS p_rank,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM pvals) AS m_tests
      |  FROM pvals),
      |cut AS MATERIALIZED (
      |  SELECT COALESCE(MAX(CASE WHEN p_micro * m_tests
      |      <= p_rank * $alphaMicro THEN p_rank END), 0) AS kstar
      |  FROM ranked)
      |SELECT event_type, obs_micro, p_micro, p_rank, m_tests,
      |  p_rank <= kstar AS bh_reject
      |FROM ranked CROSS JOIN cut""".stripMargin
  }
}
