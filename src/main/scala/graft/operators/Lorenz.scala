package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** LORENZ CURVE + GINI of per-user spend (Lorenz 1905; Gini 1912) —
  * the revenue-concentration readout behind every "top X% of users
  * drive Y% of revenue" statement, and the inequality number a
  * marketplace tracks over time. Ten user deciles ORDERED BY SPEND
  * DESCENDING, each with its exact revenue share and the cumulative
  * share (the Lorenz curve read from the top), plus the exact Gini
  *
  *   G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n
  *
  * over the ascending ranking (ties ranked arbitrarily — equal values
  * contribute identically under any permutation of their ranks, so
  * the statistic is still exact).
  *
  * DETERMINISM. Σ i·x₍ᵢ₎ is O(n²·cents) mass — DECIMAL(38,0) here,
  * HUGEINT in the oracle; deciles use the exact ntile identity over
  * [[RowNumbering]]'s scalable rank; shares are mirrored divisions of
  * exact integers.
  *
  * SCALE. One scan → per-user spend; one two-level global row number
  * (no single-partition window); 10-row output. */
object Lorenz {

  def lorenzGini(events: DataFrame): DataFrame =
    lorenzFromPerUser(events.groupBy("user_id").agg(
      sum(when(col("event_type") === "purchase",
        expr("cast(round(value * 100.0) as bigint)")).otherwise(0L))
        .as("cents")))

  /** The readout from any (user_id, cents) per-user frame (streaming-
    * store entry — per-user cents is a sum monoid, so
    * [[graft.streaming.ExperimentStore.lorenzView]] equals this). */
  def lorenzFromPerUser(pu: DataFrame): DataFrame = {
    val n = pu.count()
    val ranked = RowNumbering.withGlobalRowNumber(pu,
      Seq(col("cents").asc, col("user_id").asc), "rn")
    val gini = ranked.agg(
        sum(col("rn").cast(DecimalType(38, 0)) * col("cents")).as("ix"),
        sum(col("cents")).as("tot"))
      .selectExpr(
        """case when tot = 0 then 0L else
          | cast(round(1000000.0 *
          |   (2.0 * cast(ix as double) / (cast(tot as double) * """
          .stripMargin.replace("\n", " ")
          + s"$n) - ${n + 1}.0 / $n)) as bigint) end as gini_micro")
    val deciles = ranked
      // spend-descending deciles: decile 1 = top spenders
      .selectExpr("cents", s"($n - rn) * 10 div $n + 1 as decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum("cents").as("cents"))
    val withTot = deciles.crossJoin(broadcast(
      deciles.agg(sum("cents").as("tot"))))
    val cum = graft.operators.PrefixSum.withRunningTotal(
      withTot, Seq(col("decile").asc), "cents", "cum_cents")
    cum.crossJoin(broadcast(gini))
      .selectExpr("decile", "n_users", "cents",
        """case when tot = 0 then 0L else
          | cast(round(1000000.0 * cents / tot) as bigint) end
          | as share_micro""".stripMargin.replace("\n", " "),
        """case when tot = 0 then 0L else
          | cast(round(1000000.0 * cum_cents / tot) as bigint) end
          | as cum_share_micro""".stripMargin.replace("\n", " "),
        "gini_micro")
      .orderBy("decile")
  }

  def qLorenz(spark: SparkSession, dir: String): DataFrame =
    lorenzGini(Tables(spark, dir, "events"))

  val qLorenzSql: String =
    """WITH pu AS MATERIALIZED (
      |  SELECT user_id,
      |    SUM(CASE WHEN event_type = 'purchase'
      |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
      |      AS cents
      |  FROM events GROUP BY user_id),
      |nn AS (SELECT COUNT(*) AS n FROM pu),
      |ranked AS MATERIALIZED (
      |  SELECT cents,
      |    row_number() OVER (ORDER BY cents ASC, user_id ASC) AS rn
      |  FROM pu),
      |gini AS (
      |  SELECT CASE WHEN SUM(cents) = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 *
      |      (2.0 * CAST(SUM(rn * cents) AS DOUBLE)
      |         / (CAST(SUM(cents) AS DOUBLE) * nn.n)
      |       - (nn.n + 1) * 1.0 / nn.n)) AS BIGINT) END AS gini_micro
      |  FROM ranked, nn GROUP BY nn.n),
      |dec AS (
      |  SELECT (nn.n - rn) * 10 // nn.n + 1 AS decile,
      |    CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(cents) AS BIGINT) AS cents
      |  FROM ranked, nn GROUP BY 1, nn.n),
      |tot AS (SELECT SUM(cents) AS tot FROM dec),
      |cum AS (
      |  SELECT decile, n_users, cents,
      |    SUM(cents) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
      |      AS cum_cents
      |  FROM dec)
      |SELECT decile, n_users, cents,
      |  CASE WHEN tot.tot = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * cents / tot.tot) AS BIGINT) END
      |    AS share_micro,
      |  CASE WHEN tot.tot = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * cum_cents / tot.tot) AS BIGINT) END
      |    AS cum_share_micro,
      |  gini.gini_micro
      |FROM cum, tot, gini ORDER BY decile""".stripMargin
}
