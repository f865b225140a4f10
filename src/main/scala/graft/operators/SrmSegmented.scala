package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SEGMENTED SRM + OVERDISPERSION — two integrity checks the global
  * readouts can mask:
  *
  * 1. SEGMENTED SAMPLE-RATIO MISMATCH: a corpus-level SRM check
  *    ([[SrmMde.srmCheck]]) passes when segment-level imbalances
  *    cancel; split users by their GATEWAY segment (first event
  *    type — a deterministic pre-treatment attribute) and run the
  *    per-segment χ² against the Bonferroni-adjusted fence
  *    (α = 0.05 / |segments|): one flagged segment means the
  *    randomizer interacts with traffic source — the classic
  *    redirect-bug signature (Fabijan et al. 2019).
  *
  * 2. OVERDISPERSION (Fisher's index of dispersion): events-per-user
  *    variance over mean. Poisson arrivals give exactly 1; the
  *    monitoring family's count models silently assume it. The index
  *    and its z = (D−1)·sqrt((n−1)/2) say how wrong that is.
  *
  * DETERMINISM. Segment assignment = min_by(ts, event_type) with an
  * exact (ts, type) struct-min (ties break on the type string);
  * counts and moments are exact integers; χ²/D/z are
  * fully-double-cast shared text. α fences are micro-pinned
  * constants.
  *
  * SCALE. Each is one scan → per-user agg → a |segments|-row (or
  * 1-row) aggregate. */
object SrmSegmented {

  /** χ²₁ fence at α = 0.05/5 (Bonferroni over the 5 gateway
    * segments): 6.634897 (α=0.01). */
  val chi2BonferroniMicro = 6634897L

  def srmSegmented(events: DataFrame): DataFrame = {
    val pu = events.groupBy("user_id").agg(
        min(struct(col("ts"), col("event_type"))).getField("event_type")
          .as("segment"))
      .withColumn("arm", AbTest.armOf(col("user_id")))
    pu.groupBy("segment").agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"))
      .selectExpr("segment", "n_t", "n_c",
        """case when n_t + n_c = 0 then 0L else
          | cast(round(1000000.0
          |   * cast((n_t - n_c) * cast(n_t - n_c as decimal(38,0))
          |       as double)
          |   / (n_t + n_c)) as bigint) end as chi2_micro"""
          .stripMargin.replace("\n", " "))
      .withColumn("srm_detected",
        col("chi2_micro") >= chi2BonferroniMicro)
      .orderBy("segment")
  }

  def qSrmSegmented(spark: SparkSession, dir: String): DataFrame =
    srmSegmented(Tables(spark, dir, "events"))

  val qSrmSegmentedSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    MIN(struct_pack(ts := ts, et := event_type))['et'] AS segment,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id)
       |SELECT segment,
       |  CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_t,
       |  CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_c,
       |  CASE WHEN COUNT(*) = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0
       |      * CAST((SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
       |              - SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END))
       |          * CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
       |              - SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
       |            AS HUGEINT) AS DOUBLE)
       |      / COUNT(*)) AS BIGINT) END AS chi2_micro,
       |  (CASE WHEN COUNT(*) = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0
       |      * CAST((SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
       |              - SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END))
       |          * CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
       |              - SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
       |            AS HUGEINT) AS DOUBLE)
       |      / COUNT(*)) AS BIGINT) END) >= $chi2BonferroniMicro
       |    AS srm_detected
       |FROM pu GROUP BY segment
       |ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------
  // Overdispersion index
  // ---------------------------------------------------------------

  def overdispersion(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    events.groupBy("user_id").agg(count(lit(1)).as("k"))
      .agg(count(lit(1)).as("g"), sum(col("k")).as("t"),
        sum(col("k").cast(DecimalType(38, 0)) * col("k")).as("t2"))
      .selectExpr("g as n_users", "t as n_events",
        s"$dExpr as dispersion_micro",
        s"""case when g <= 1 or t = 0 then 0 else
           |cast(round(($dRaw - 1.0)
           |  * sqrt((cast(g as double) - 1.0) / 2.0) * 1000000.0)
           | as bigint) end as z_micro""".stripMargin.replace("\n", " "))
      .withColumn("poisson_ok", abs(col("z_micro")) < AbTest.zCritMicro)
  }

  /** D = var/mean = g·(t2/g − (t/g)²)/( (g−1) · t/g ). */
  private def dRaw: String =
    """((cast(t2 as double) / cast(g as double)
      | - (cast(t as double) / cast(g as double))
      |   * (cast(t as double) / cast(g as double)))
      | * cast(g as double) / (cast(g as double) - 1.0)
      | / (cast(t as double) / cast(g as double)))"""
      .stripMargin.replace("\n", " ")
  private def dExpr: String =
    s"""case when g <= 1 or t = 0 then 0 else
       |cast(round(1000000.0 * $dRaw) as bigint) end"""
      .stripMargin.replace("\n", " ")

  def qOverdispersion(spark: SparkSession, dir: String): DataFrame =
    overdispersion(Tables(spark, dir, "events"))

  val qOverdispersionSql: String =
    s"""WITH pu AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
       |  FROM events GROUP BY user_id),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS g,
       |    CAST(SUM(k) AS BIGINT) AS t,
       |    SUM(CAST(k AS HUGEINT) * k) AS t2
       |  FROM pu)
       |SELECT g AS n_users, t AS n_events,
       |  $dExpr AS dispersion_micro,
       |  CASE WHEN g <= 1 OR t = 0 THEN 0 ELSE
       |    CAST(ROUND(($dRaw - 1.0)
       |      * sqrt((CAST(g AS DOUBLE) - 1.0) / 2.0) * 1000000.0)
       |      AS BIGINT) END AS z_micro,
       |  ABS(CASE WHEN g <= 1 OR t = 0 THEN 0 ELSE
       |    CAST(ROUND(($dRaw - 1.0)
       |      * sqrt((CAST(g AS DOUBLE) - 1.0) / 2.0) * 1000000.0)
       |      AS BIGINT) END) < ${AbTest.zCritMicro} AS poisson_ok
       |FROM agg""".stripMargin
}
