package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** DIFFERENCE-IN-DIFFERENCES (Card & Krueger 1994 made it canon; the
  * quasi-experimental workhorse when a feature launches mid-stream
  * rather than under a clean A/B): compare each user's spend CHANGE
  * across a launch date between arms,
  *
  *   DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)
  *       = mean_t(d_u) − mean_c(d_u),   d_u = post_u − pre_u,
  *
  * the PANEL form — differencing per user first removes user-level
  * time-invariant heterogeneity exactly (the whole point of DiD), and
  * turns inference into [[AbTest]]'s Welch machinery on the derived
  * metric d. The four cell means are surfaced too: the parallel-trends
  * eyeball every DiD readout owes its reader.
  *
  * Period split: event ts before/after [[splitUs]] (mid-corpus, the
  * [[PsiDrift]]/[[KsDrift]] ref/cur convention transplanted to the
  * event clock). Users with activity in only one period stay in the
  * panel with 0 in the other — the balanced-panel-with-zeros design.
  *
  * DETERMINISM: per-user pre/post cents are exact integers from one
  * scan; d and its square-sums ride Long/DECIMAL(38,0); the t is one
  * mirrored div/sqrt ([[AbTest]] contract, same degenerate guards).
  *
  * SCALE: one events scan → per-user two conditional sums → 1-row
  * sufficient statistics with map-side combine. Nothing sorts. */
object DiffInDiff {

  /** Period boundary on the event clock. */
  val splitDate = "2024-01-16"

  def didTest(events: DataFrame): DataFrame = {
    val pu = events.groupBy("user_id").agg(
        sum(when(col("event_type") === "purchase" &&
          col("ts") < lit(splitDate).cast("timestamp"),
          expr("cast(round(value * 100.0) as bigint)")).otherwise(0L))
          .as("pre"),
        sum(when(col("event_type") === "purchase" &&
          col("ts") >= lit(splitDate).cast("timestamp"),
          expr("cast(round(value * 100.0) as bigint)")).otherwise(0L))
          .as("post"))
      .withColumn("arm", AbTest.armOf(col("user_id")))
    didFromPerUser(pu)
  }

  /** The readout from any (arm, pre, post) per-user frame
    * (streaming-store entry — pre/post cents are per-user sum
    * monoids, so the live view equals this batch path). */
  def didFromPerUser(pu0: DataFrame): DataFrame = {
    val pu = pu0.withColumn("d", col("post") - col("pre"))
    val suff = pu.agg(
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
      sum(when(col("arm") === 1, col("pre")).otherwise(0L)).as("pre_t"),
      sum(when(col("arm") === 0, col("pre")).otherwise(0L)).as("pre_c"),
      sum(when(col("arm") === 1, col("post")).otherwise(0L)).as("post_t"),
      sum(when(col("arm") === 0, col("post")).otherwise(0L)).as("post_c"),
      sum(when(col("arm") === 1,
        col("d").cast(DecimalType(38, 0)) * col("d"))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as("q_t"),
      sum(when(col("arm") === 0,
        col("d").cast(DecimalType(38, 0)) * col("d"))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as("q_c"))
    val derived = suff.selectExpr("*",
      "post_t - pre_t as s_t", "post_c - pre_c as s_c")
      .selectExpr("*",
        "n_t * q_t - s_t * cast(s_t as decimal(38,0)) as vt_num",
        "n_c * q_c - s_c * cast(s_c as decimal(38,0)) as vc_num")
    val did = "(s_t / cast(n_t as double) - s_c / cast(n_c as double))"
    // cell means and the DiD itself carry the same exact-integer
    // empty-arm guard as the t: 0/0 is NaN, and NaN→BIGINT throws
    // under ANSI on Spark but errors outright in DuckDB (the AbTest
    // abstain convention)
    derived.selectExpr(
      "cast(n_t as bigint) as n_t", "cast(n_c as bigint) as n_c",
      """case when n_t = 0 then 0L else
        | cast(round(1000000.0 * pre_t / n_t) as bigint) end
        | as pre_t_micro""".stripMargin.replace("\n", " "),
      """case when n_t = 0 then 0L else
        | cast(round(1000000.0 * post_t / n_t) as bigint) end
        | as post_t_micro""".stripMargin.replace("\n", " "),
      """case when n_c = 0 then 0L else
        | cast(round(1000000.0 * pre_c / n_c) as bigint) end
        | as pre_c_micro""".stripMargin.replace("\n", " "),
      """case when n_c = 0 then 0L else
        | cast(round(1000000.0 * post_c / n_c) as bigint) end
        | as post_c_micro""".stripMargin.replace("\n", " "),
      s"""case when n_t = 0 or n_c = 0 then 0L else
         | cast(round(1000000.0 * $did) as bigint) end as did_micro"""
        .stripMargin.replace("\n", " "),
      s"""case when n_t < 2 or n_c < 2
         |   or (vt_num = 0 and vc_num = 0) then 0L else
         | cast(round(1000000.0 * $did
         |   / sqrt(
         |     cast(vt_num as double)
         |       / (cast(n_t as double) * n_t * (n_t - 1))
         |     + cast(vc_num as double)
         |       / (cast(n_c as double) * n_c * (n_c - 1)))) as bigint)
         | end as t_micro""".stripMargin.replace("\n", " "))
      .withColumn("significant", abs(col("t_micro")) >= AbTest.zCritMicro)
  }

  def qDidTest(spark: SparkSession, dir: String): DataFrame =
    didTest(Tables(spark, dir, "events"))

  val qDidTestSql: String = {
    val did = "(s_t / CAST(n_t AS DOUBLE) - s_c / CAST(n_c AS DOUBLE))"
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        AND ts < TIMESTAMP '$splitDate'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
       |      AS pre,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        AND ts >= TIMESTAMP '$splitDate'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
       |      AS post,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |pd AS MATERIALIZED (SELECT *, post - pre AS d FROM pu),
       |suff AS MATERIALIZED (
       |  SELECT
       |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_t,
       |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_c,
       |    SUM(CASE WHEN arm = 1 THEN pre ELSE 0 END) AS pre_t,
       |    SUM(CASE WHEN arm = 0 THEN pre ELSE 0 END) AS pre_c,
       |    SUM(CASE WHEN arm = 1 THEN post ELSE 0 END) AS post_t,
       |    SUM(CASE WHEN arm = 0 THEN post ELSE 0 END) AS post_c,
       |    SUM(CASE WHEN arm = 1 THEN d * d ELSE 0 END) AS q_t,
       |    SUM(CASE WHEN arm = 0 THEN d * d ELSE 0 END) AS q_c
       |  FROM pd),
       |derived AS MATERIALIZED (
       |  SELECT *, post_t - pre_t AS s_t, post_c - pre_c AS s_c,
       |    n_t * q_t - (post_t - pre_t) * (post_t - pre_t) AS vt_num,
       |    n_c * q_c - (post_c - pre_c) * (post_c - pre_c) AS vc_num
       |  FROM suff)
       |SELECT CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
       |  CASE WHEN n_t = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * pre_t / n_t) AS BIGINT) END
       |    AS pre_t_micro,
       |  CASE WHEN n_t = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * post_t / n_t) AS BIGINT) END
       |    AS post_t_micro,
       |  CASE WHEN n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * pre_c / n_c) AS BIGINT) END
       |    AS pre_c_micro,
       |  CASE WHEN n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * post_c / n_c) AS BIGINT) END
       |    AS post_c_micro,
       |  CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * $did) AS BIGINT) END AS did_micro,
       |  CASE WHEN n_t < 2 OR n_c < 2
       |      OR (vt_num = 0 AND vc_num = 0) THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * $did
       |      / SQRT(
       |        CAST(vt_num AS DOUBLE)
       |          / (CAST(n_t AS DOUBLE) * n_t * (n_t - 1))
       |        + CAST(vc_num AS DOUBLE)
       |          / (CAST(n_c AS DOUBLE) * n_c * (n_c - 1)))) AS BIGINT)
       |    END AS t_micro,
       |  ABS(CASE WHEN n_t < 2 OR n_c < 2
       |      OR (vt_num = 0 AND vc_num = 0) THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * $did
       |      / SQRT(
       |        CAST(vt_num AS DOUBLE)
       |          / (CAST(n_t AS DOUBLE) * n_t * (n_t - 1))
       |        + CAST(vc_num AS DOUBLE)
       |          / (CAST(n_c AS DOUBLE) * n_c * (n_c - 1)))) AS BIGINT)
       |    END) >= ${AbTest.zCritMicro} AS significant
       |FROM derived""".stripMargin
  }
}
