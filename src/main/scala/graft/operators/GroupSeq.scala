package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** GROUP-SEQUENTIAL ANALYSIS with O'Brien–Fleming boundaries (O'Brien
  * & Fleming 1979; Pocock 1977 framed the problem) — the third corner
  * of the peeking triangle the suite now covers end to end:
  * [[AbTest]] is the fixed-horizon readout (peek once), [[Sprt]] is
  * fully sequential (peek always), and THIS is what a production
  * experiment actually runs: K = [[looks]] SCHEDULED interim analyses,
  * each testing the Welch z of the spend metric over the users
  * enrolled so far against the OBF boundary
  *
  *   b_k = c · sqrt(K / k),   c = 2.040082 (K = 5, two-sided α = 0.05)
  *
  * — nearly unspendable α early (b₁ ≈ 4.56), the full 1.96-ish at the
  * final look (b₅ ≈ 2.04), so an early stop needs overwhelming
  * evidence but the end-of-experiment test is barely taxed. The
  * readout is one row per look: enrollment, the z, the boundary, and
  * whether it crossed — the first crossed look is the stopping time.
  *
  * Look k enrolls users whose FIRST event precedes the look date and
  * observes their spend UP TO that date (the standard information-
  * accrual design: both enrollment and exposure are time-truncated).
  *
  * DETERMINISM. Per-user per-look cents are exact integer conditional
  * sums off ONE scan; per-look sufficient statistics ride
  * Long/DECIMAL(38,0); z_k is the [[AbTest]] Welch expression shape
  * (mul/div/sqrt, mirrored); the boundary is one literal·sqrt(K/k).
  * Degenerate looks (an arm < 2 enrolled, zero variance) abstain with
  * z = 0 under the family's exact-integer guards.
  *
  * SCALE. One events scan → per-user K conditional sums (map-side) →
  * a K×2-cell aggregate; everything after is K-row arithmetic. The
  * streaming twin holds the K per-look cents as per-user sum monoids —
  * [[graft.streaming.ExperimentStore.groupSeqView]], K extra columns
  * on the experiment delta, parameterized by [[lookDates]] (look
  * columns are schedule-specific: a schedule change is a store schema
  * change, stated up front). */
object GroupSeq {

  /** Scheduled look dates over the 30-day event window (day 6·k). */
  val lookDates: Seq[String] = Seq("2024-01-07", "2024-01-13",
    "2024-01-19", "2024-01-25", "2024-01-31")

  def looks: Int = lookDates.size

  /** OBF constant for K = 5, two-sided α = 0.05 (standard tables —
    * e.g. Jennison & Turnbull 2000, Table 2.3). */
  val obfC = "2.040082"

  /** Per-user (arm, first_ts, c1..cK): one scan. */
  def perUserLooks(events: DataFrame): DataFrame = {
    val isPurchase = col("event_type") === "purchase"
    val cents = expr("cast(round(value * 100.0) as bigint)")
    val sums = lookDates.zipWithIndex.map { case (d, i) =>
      sum(when(isPurchase && col("ts") < lit(d).cast("timestamp"), cents)
        .otherwise(0L)).as(s"c${i + 1}")
    }
    events.groupBy("user_id")
      .agg(min(col("ts")).as("first_ts"), sums: _*)
      .withColumn("arm", AbTest.armOf(col("user_id")))
  }

  def groupSeq(events: DataFrame): DataFrame =
    groupSeqFromPerUser(perUserLooks(events))

  /** The K-look readout from any (arm, first_ts: timestamp, c1..cK)
    * per-user frame. */
  def groupSeqFromPerUser(pu: DataFrame): DataFrame = {
    def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    val aggs = lookDates.zipWithIndex.flatMap { case (d, i) =>
      val k = i + 1
      val enrolled = col("first_ts") < lit(d).cast("timestamp")
      Seq(
        sum(when(enrolled && col("arm") === 1, 1L).otherwise(0L))
          .as(s"n_t_$k"),
        sum(when(enrolled && col("arm") === 0, 1L).otherwise(0L))
          .as(s"n_c_$k"),
        sum(when(enrolled && col("arm") === 1, col(s"c$k")).otherwise(0L))
          .as(s"s_t_$k"),
        sum(when(enrolled && col("arm") === 0, col(s"c$k")).otherwise(0L))
          .as(s"s_c_$k"),
        sum(when(enrolled && col("arm") === 1, d38(col(s"c$k")) * col(s"c$k"))
          .otherwise(lit(0).cast(DecimalType(38, 0)))).as(s"q_t_$k"),
        sum(when(enrolled && col("arm") === 0, d38(col(s"c$k")) * col(s"c$k"))
          .otherwise(lit(0).cast(DecimalType(38, 0)))).as(s"q_c_$k"))
    }
    val suff = pu.agg(aggs.head, aggs.tail: _*)
    // one stack row per look; z is the AbTest Welch shape per look
    val rows = (1 to looks).map { k =>
      val vt = s"(n_t_$k * q_t_$k - s_t_$k * cast(s_t_$k as decimal(38,0)))"
      val vc = s"(n_c_$k * q_c_$k - s_c_$k * cast(s_c_$k as decimal(38,0)))"
      val z =
        s"""case when n_t_$k < 2 or n_c_$k < 2
           | or ($vt = 0 and $vc = 0) then 0L else
           | cast(round(1000000.0
           |   * (s_t_$k / cast(n_t_$k as double)
           |      - s_c_$k / cast(n_c_$k as double))
           |   / sqrt(
           |     cast($vt as double)
           |       / (cast(n_t_$k as double) * n_t_$k * (n_t_$k - 1))
           |     + cast($vc as double)
           |       / (cast(n_c_$k as double) * n_c_$k * (n_c_$k - 1))))
           |   as bigint) end""".stripMargin.replace("\n", " ")
      val bound = s"cast(round(1000000.0 * $obfC" +
        s" * sqrt(cast($looks as double) / $k)) as bigint)"
      s"${k}L, n_t_$k, n_c_$k, $z, $bound"
    }
    suff.selectExpr(
      s"""stack($looks, ${rows.mkString(", ")})
         | as (look, n_t, n_c, z_micro, bound_micro)"""
        .stripMargin.replace("\n", " "))
      .withColumn("crossed", abs(col("z_micro")) >= col("bound_micro"))
      .orderBy("look")
  }

  def qGroupSeq(spark: SparkSession, dir: String): DataFrame =
    groupSeq(Tables(spark, dir, "events"))

  val qGroupSeqSql: String = {
    val centSums = lookDates.zipWithIndex.map { case (d, i) =>
      s"""SUM(CASE WHEN event_type = 'purchase' AND ts < TIMESTAMP '$d'
         |      THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
         |      AS c${i + 1}""".stripMargin
    }.mkString(",\n    ")
    val cells = lookDates.zipWithIndex.flatMap { case (d, i) =>
      val k = i + 1
      val e = s"first_ts < TIMESTAMP '$d'"
      Seq(
        s"SUM(CASE WHEN $e AND arm = 1 THEN 1 ELSE 0 END) AS n_t_$k",
        s"SUM(CASE WHEN $e AND arm = 0 THEN 1 ELSE 0 END) AS n_c_$k",
        s"SUM(CASE WHEN $e AND arm = 1 THEN c$k ELSE 0 END) AS s_t_$k",
        s"SUM(CASE WHEN $e AND arm = 0 THEN c$k ELSE 0 END) AS s_c_$k",
        s"SUM(CASE WHEN $e AND arm = 1 THEN c$k * c$k ELSE 0 END) AS q_t_$k",
        s"SUM(CASE WHEN $e AND arm = 0 THEN c$k * c$k ELSE 0 END) AS q_c_$k")
    }.mkString(",\n    ")
    val lookRows = (1 to looks).map { k =>
      val vt = s"(n_t_$k * q_t_$k - s_t_$k * s_t_$k)"
      val vc = s"(n_c_$k * q_c_$k - s_c_$k * s_c_$k)"
      s"""SELECT CAST($k AS BIGINT) AS look,
         |  CAST(n_t_$k AS BIGINT) AS n_t, CAST(n_c_$k AS BIGINT) AS n_c,
         |  CASE WHEN n_t_$k < 2 OR n_c_$k < 2
         |    OR ($vt = 0 AND $vc = 0) THEN 0 ELSE
         |  CAST(ROUND(1000000.0
         |    * (s_t_$k / CAST(n_t_$k AS DOUBLE)
         |       - s_c_$k / CAST(n_c_$k AS DOUBLE))
         |    / SQRT(
         |      CAST($vt AS DOUBLE)
         |        / (CAST(n_t_$k AS DOUBLE) * n_t_$k * (n_t_$k - 1))
         |      + CAST($vc AS DOUBLE)
         |        / (CAST(n_c_$k AS DOUBLE) * n_c_$k * (n_c_$k - 1))))
         |    AS BIGINT) END AS z_micro,
         |  CAST(ROUND(1000000.0 * $obfC
         |    * SQRT(CAST($looks AS DOUBLE) / $k)) AS BIGINT)
         |    AS bound_micro
         |FROM suff""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id, MIN(ts) AS first_ts,
       |    $centSums,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |suff AS MATERIALIZED (
       |  SELECT
       |    $cells
       |  FROM pu),
       |perlook AS (
       |$lookRows
       |)
       |SELECT look, n_t, n_c, z_micro, bound_micro,
       |  ABS(z_micro) >= bound_micro AS crossed
       |FROM perlook ORDER BY look""".stripMargin
  }
}
