package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** INTRACLASS CORRELATION + DESIGN EFFECT (Fisher 1925 one-way
  * random effects; Kish 1965) — the cluster-randomization planning
  * number: how much of event-value variance lives BETWEEN users
  * rather than within them,
  *
  *   ICC = (MSB − MSW) / (MSB + (k₀ − 1)·MSW),
  *   k₀  = (N − Σn_g²/N) / (G − 1)      (unbalanced-groups size),
  *   DEFF = 1 + (N/G − 1)·ICC,
  *
  * because a user-randomized experiment with high ICC has an
  * effective sample of N/DEFF — the correction [[SrmMde]]'s MDE
  * silently needs whenever the unit of analysis (events) is finer
  * than the unit of randomization (users).
  *
  * DETERMINISM. All sums of squares come from THREE exact integer
  * masses per group (n, Σc, Σc² in cents, DECIMAL(38,0)/HUGEINT);
  * MSB/MSW/ICC/DEFF form fully-double-cast expressions over six
  * exact integers ([[BayesAb]] posture). Degenerate cases (one
  * group, zero within variance) surface as pinned values.
  *
  * SCALE. One scan → per-user integer masses → ONE 1-row aggregate. */
object Icc {

  def icc(events: DataFrame): DataFrame = {
    val pu = events
      .select(col("user_id"),
        expr("cast(round(value * 100.0) as bigint)").as("c"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c").cast(DecimalType(38, 0)) * col("c")).as("ss"))
    pu.agg(
        sum(col("n")).as("nn"),
        count(lit(1)).as("g"),
        sum(col("s").cast(DecimalType(38, 0))).as("ts"),
        sum(col("ss")).as("tss"),
        // Σ s_g²/n_g stays exact via per-group double (one division
        // per group is unavoidable; the per-term round keeps it
        // order-portable — KM convention)
        sum(expr("""cast(round(cast(s as double) * cast(s as double)
                   | / cast(n as double) * 1000000.0) as decimal(38,0))"""
          .stripMargin.replace("\n", " "))).as("bg_micro"),
        sum(col("n").cast(DecimalType(38, 0)) * col("n")).as("n2"))
      .selectExpr("nn as n_obs", "g as n_users",
        "cast(round(cast(nn as double) / g * 1000000.0) as bigint)"
          + " as mean_cluster_micro",
        s"$iccExpr as icc_micro")
      .selectExpr("n_obs", "n_users", "mean_cluster_micro", "icc_micro",
        """cast(round(1000000.0 + (cast(mean_cluster_micro as double)
          | - 1000000.0) * cast(icc_micro as double) / 1000000.0)
          | as bigint) as deff_micro""".stripMargin.replace("\n", " "))
  }

  /** Shared ICC text over (nn, g, ts, tss, bg_micro, n2):
    * SSB = Σs²/n − T²/N (in micro), SSW = Σc² − Σs²/n,
    * MSB = SSB/(G−1), MSW = SSW/(N−G),
    * k0 = (N − Σn²/N)/(G−1). */
  private def iccExpr: String =
    """case when g <= 1 or nn <= g
      | or (cast(tss as double) - cast(ts as double)
      |     * cast(ts as double) / cast(nn as double)) <= 0.0
      | then 0 else
      |cast(round(1000000.0 * (
      |  (cast(bg_micro as double) / 1e6
      |     - cast(ts as double) * cast(ts as double) / cast(nn as double))
      |    / (cast(g as double) - 1.0)
      |  - (cast(tss as double) - cast(bg_micro as double) / 1e6)
      |    / (cast(nn as double) - g)
      |) / (
      |  (cast(bg_micro as double) / 1e6
      |     - cast(ts as double) * cast(ts as double) / cast(nn as double))
      |    / (cast(g as double) - 1.0)
      |  + ((cast(nn as double) - cast(n2 as double) / cast(nn as double))
      |       / (cast(g as double) - 1.0) - 1.0)
      |    * (cast(tss as double) - cast(bg_micro as double) / 1e6)
      |      / (cast(nn as double) - g)
      |)) as bigint) end""".stripMargin.replace("\n", " ")

  def qIcc(spark: SparkSession, dir: String): DataFrame =
    icc(Tables(spark, dir, "events"))

  val qIccSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT)
       |      AS s,
       |    SUM(CAST(CAST(ROUND(value * 100.0) AS BIGINT) AS HUGEINT)
       |      * CAST(ROUND(value * 100.0) AS BIGINT)) AS ss
       |  FROM events GROUP BY user_id),
       |agg AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
       |    CAST(COUNT(*) AS BIGINT) AS g,
       |    SUM(CAST(s AS HUGEINT)) AS ts,
       |    SUM(ss) AS tss,
       |    SUM(CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
       |      / CAST(n AS DOUBLE) * 1000000.0) AS HUGEINT)) AS bg_micro,
       |    SUM(CAST(n AS HUGEINT) * n) AS n2
       |  FROM pu),
       |base AS (
       |  SELECT nn AS n_obs, g AS n_users,
       |    CAST(ROUND(CAST(nn AS DOUBLE) / g * 1000000.0) AS BIGINT)
       |      AS mean_cluster_micro,
       |    $iccExpr AS icc_micro
       |  FROM agg)
       |SELECT n_obs, n_users, mean_cluster_micro, icc_micro,
       |  CAST(ROUND(1000000.0 + (CAST(mean_cluster_micro AS DOUBLE)
       |    - 1000000.0) * CAST(icc_micro AS DOUBLE) / 1000000.0)
       |    AS BIGINT) AS deff_micro
       |FROM base""".stripMargin
}
