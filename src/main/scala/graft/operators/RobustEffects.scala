package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** ROBUST EFFECT READOUTS — what a careful analyst reports when the
  * metric is as heavy-tailed as spend:
  *
  * TRIMMED-MEAN EFFECT (Yuen 1974; the standard outlier-robust mean
  * comparison): drop the bottom and top [[trimPct]]% of each arm BY
  * RANK and difference the remaining means — one whale user can no
  * longer buy a significant scorecard. Ranks come from exact integer
  * order statistics, never a sample.
  *
  * QUANTILE TREATMENT EFFECTS (Doksum 1974; the distributional
  * readout): QTE(p) = q_t(p) − q_c(p) at the nine deciles — WHERE in
  * the distribution the effect lives (a treatment that moves the
  * median but not the p90 is a different product story than the
  * reverse). Each quantile is the exact k-th order statistic of its
  * arm (k = ⌈p·n/10⌉, the tie-insensitive definition both engines
  * agree on).
  *
  * DETERMINISM. Everything is integer: per-(arm, cents) counts, the
  * per-arm running totals (strictly-below count c per value group),
  * rank cutoffs by integer division, per-group kept counts by
  * min/max, and quantiles are VALUES from the cents domain. The only
  * float op is the trimmed mean's final division, mirrored.
  *
  * SCALE. One scan → per-user agg → per-(arm, cents) groups (bounded
  * by users, typically by the cents value domain). The running total
  * is [[PrefixSum]]'s range-partitioned shape over ONE global sort on
  * (arm, cents) with the 2-row arms-before offset table ([[Sprt]]'s
  * recipe) — never a single-partition window; the decile probe is a
  * 9-row broadcast fan-out. Both serve live from
  * [[graft.streaming.ExperimentStore]] via the per-user entries. */
object RobustEffects {

  /** Trim fraction per tail, in percent. */
  val trimPct = 5L

  /** Per-(arm, cents) groups with in-arm strictly-below counts and arm
    * totals: (arm, cents, m, c, n_a) — the shared rank substrate. */
  private def rankedGroups(pu: DataFrame): (DataFrame, () => Unit) = {
    val groups = pu.groupBy("arm", "cents").agg(count(lit(1)).as("m"))
    val t = PrefixSum.withRunningTotalTracked(
      groups, Seq(col("arm").asc, col("cents").asc), "m", "run_g")
    val armTot = groups.groupBy("arm").agg(sum("m").as("n_a"))
    val off = armTot.alias("a")
      .join(armTot.alias("b"), col("b.arm") < col("a.arm"), "left_outer")
      .groupBy(col("a.arm").as("arm"))
      .agg(sum(coalesce(col("b.n_a"), lit(0L))).as("off_m"),
        max(col("a.n_a")).as("n_a"))
    val ranked = t.df.join(broadcast(off), Seq("arm"))
      .select(col("arm"), col("cents"), col("m"),
        (col("run_g") - col("off_m") - col("m")).as("c"), col("n_a"))
    (ranked, () => t.checkpoint.unpersist(blocking = false))
  }

  def trimmedAb(events: DataFrame): DataFrame =
    trimmedFromPerUser(
      AbTest.perUserArm(events).select("user_id", "arm", "cents"))

  /** Trimmed-mean readout from any (arm, cents) per-user frame. */
  def trimmedFromPerUser(pu: DataFrame): DataFrame = {
    val (ranked, release) = rankedGroups(pu)
    try {
      val agg = ranked
        .select(col("arm"), col("n_a"),
          // integer div — `/` on longs is double division in Spark,
          // which both truncates wrong past 2^53 and isn't the
          // oracle's `//`
          expr(s"(n_a * $trimPct) div 100").as("k1"),
          col("cents"), col("m"), col("c"))
        .withColumn("k2", col("n_a") - col("k1"))
        .withColumn("kept",
          greatest(lit(0L),
            least(col("c") + col("m"), col("k2"))
              - greatest(col("c"), col("k1"))))
        .groupBy("arm").agg(
          max(col("n_a")).as("n_a"),
          max(col("k2") - col("k1")).as("n_kept"),
          sum(col("cents").cast(DecimalType(38, 0)) * col("kept"))
            .as("tsum"))
      val wide = agg.groupBy().agg(
        max(when(col("arm") === 1, col("n_a"))).as("n_t"),
        max(when(col("arm") === 0, col("n_a"))).as("n_c"),
        max(when(col("arm") === 1, col("n_kept"))).as("kept_t"),
        max(when(col("arm") === 0, col("n_kept"))).as("kept_c"),
        max(when(col("arm") === 1, col("tsum"))).as("tsum_t"),
        max(when(col("arm") === 0, col("tsum"))).as("tsum_c"))
      wide.selectExpr(
        "coalesce(n_t, 0L) as n_t", "coalesce(n_c, 0L) as n_c",
        "coalesce(kept_t, 0L) as kept_t", "coalesce(kept_c, 0L) as kept_c",
        """case when coalesce(kept_t, 0L) = 0 then 0L else
          | cast(round(1000000.0 * tsum_t / kept_t) as bigint) end
          | as tmean_t_micro""".stripMargin.replace("\n", " "),
        """case when coalesce(kept_c, 0L) = 0 then 0L else
          | cast(round(1000000.0 * tsum_c / kept_c) as bigint) end
          | as tmean_c_micro""".stripMargin.replace("\n", " "),
        """case when coalesce(kept_t, 0L) = 0 or coalesce(kept_c, 0L) = 0
          | then 0L else
          | cast(round(1000000.0 * (tsum_t / cast(kept_t as double)
          |   - tsum_c / cast(kept_c as double))) as bigint) end
          | as tdiff_micro""".stripMargin.replace("\n", " "))
        .localCheckpoint() // outlives the released prefix-sum blocks
    } finally release()
  }

  def qTrimmedAb(spark: SparkSession, dir: String): DataFrame =
    trimmedAb(Tables(spark, dir, "events"))

  def qte(events: DataFrame): DataFrame =
    qteFromPerUser(
      AbTest.perUserArm(events).select("user_id", "arm", "cents"))

  /** Decile QTE from any (arm, cents) per-user frame: 9 rows
    * (p, q_t, q_c, qte). */
  def qteFromPerUser(pu: DataFrame): DataFrame = {
    val spark = pu.sparkSession
    val (ranked, release) = rankedGroups(pu)
    try {
      val deciles = spark.range(1, 10).select(col("id").as("p"))
      ranked.crossJoin(broadcast(deciles))
        .withColumn("k_p", expr("(p * n_a + 9) div 10")) // integer div
        .filter(col("c") < col("k_p") && col("k_p") <= col("c") + col("m"))
        .groupBy("p").agg(
          max(when(col("arm") === 1, col("cents"))).as("q_t"),
          max(when(col("arm") === 0, col("cents"))).as("q_c"))
        .selectExpr("p", "coalesce(q_t, 0L) as q_t",
          "coalesce(q_c, 0L) as q_c",
          "coalesce(q_t, 0L) - coalesce(q_c, 0L) as qte")
        .orderBy("p")
        .localCheckpoint() // outlives the released prefix-sum blocks
    } finally release()
  }

  def qQte(spark: SparkSession, dir: String): DataFrame =
    qte(Tables(spark, dir, "events"))

  /** Shared oracle CTE substrate: per-(arm, cents) groups with in-arm
    * window running totals. */
  private val rankedCtes: String =
    """pu AS MATERIALIZED (
      |  SELECT user_id,
      |    SUM(CASE WHEN event_type = 'purchase'
      |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
      |      AS cents,
      |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
      |      AS UBIGINT) AS BIGINT) % 2 AS arm
      |  FROM events GROUP BY user_id),
      |groups AS (
      |  SELECT arm, cents, CAST(COUNT(*) AS BIGINT) AS m
      |  FROM pu GROUP BY arm, cents),
      |ranked AS (
      |  SELECT arm, cents, m,
      |    SUM(m) OVER (PARTITION BY arm ORDER BY cents
      |      ROWS UNBOUNDED PRECEDING) - m AS c,
      |    SUM(m) OVER (PARTITION BY arm) AS n_a
      |  FROM groups)""".stripMargin

  val qTrimmedAbSql: String =
    s"""WITH $rankedCtes,
       |cut AS (
       |  SELECT arm, cents, m, c, n_a,
       |    (n_a * $trimPct) // 100 AS k1,
       |    n_a - (n_a * $trimPct) // 100 AS k2
       |  FROM ranked),
       |kept AS (
       |  SELECT arm, n_a, k2 - k1 AS n_kept,
       |    cents * GREATEST(0, LEAST(c + m, k2) - GREATEST(c, k1))
       |      AS contrib
       |  FROM cut),
       |agg AS (
       |  SELECT arm, MAX(n_a) AS n_a, MAX(n_kept) AS n_kept,
       |    SUM(contrib) AS tsum
       |  FROM kept GROUP BY arm),
       |wide AS (
       |  SELECT
       |    MAX(CASE WHEN arm = 1 THEN n_a END) AS n_t,
       |    MAX(CASE WHEN arm = 0 THEN n_a END) AS n_c,
       |    MAX(CASE WHEN arm = 1 THEN n_kept END) AS kept_t,
       |    MAX(CASE WHEN arm = 0 THEN n_kept END) AS kept_c,
       |    MAX(CASE WHEN arm = 1 THEN tsum END) AS tsum_t,
       |    MAX(CASE WHEN arm = 0 THEN tsum END) AS tsum_c
       |  FROM agg)
       |SELECT CAST(COALESCE(n_t, 0) AS BIGINT) AS n_t,
       |  CAST(COALESCE(n_c, 0) AS BIGINT) AS n_c,
       |  CAST(COALESCE(kept_t, 0) AS BIGINT) AS kept_t,
       |  CAST(COALESCE(kept_c, 0) AS BIGINT) AS kept_c,
       |  CASE WHEN COALESCE(kept_t, 0) = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * tsum_t / kept_t) AS BIGINT) END
       |    AS tmean_t_micro,
       |  CASE WHEN COALESCE(kept_c, 0) = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * tsum_c / kept_c) AS BIGINT) END
       |    AS tmean_c_micro,
       |  CASE WHEN COALESCE(kept_t, 0) = 0 OR COALESCE(kept_c, 0) = 0
       |    THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * (tsum_t / CAST(kept_t AS DOUBLE)
       |      - tsum_c / CAST(kept_c AS DOUBLE))) AS BIGINT) END
       |    AS tdiff_micro
       |FROM wide""".stripMargin

  val qQteSql: String =
    s"""WITH $rankedCtes,
       |probes AS (
       |  SELECT r.arm, r.cents, tp.p
       |  FROM ranked r, UNNEST(generate_series(1, 9)) AS tp(p)
       |  WHERE r.c < (tp.p * r.n_a + 9) // 10
       |    AND (tp.p * r.n_a + 9) // 10 <= r.c + r.m)
       |SELECT CAST(p AS BIGINT) AS p,
       |  CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN cents END), 0)
       |    AS BIGINT) AS q_t,
       |  CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN cents END), 0)
       |    AS BIGINT) AS q_c,
       |  CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN cents END), 0)
       |    - COALESCE(MAX(CASE WHEN arm = 0 THEN cents END), 0)
       |    AS BIGINT) AS qte
       |FROM probes GROUP BY p ORDER BY p""".stripMargin
}
