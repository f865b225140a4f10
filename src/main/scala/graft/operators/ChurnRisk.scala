package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CHURN-RISK PROFILE — the inactivity readout retention dashboards
  * run daily: score each user by how OVERDUE they are relative to
  * their own rhythm,
  *
  *   risk = (t_corpus − t_last) / mean_gap,
  *   mean_gap = (t_last − t_first) / (n − 1),
  *
  * and report the population histogram over the standard bands
  * (<1× = active, 1–2× = cooling, 2–4× / 4–8× = at risk, ≥8× =
  * churned; single-event users form their own "unknown rhythm" band).
  * A shifting histogram is the churn early-warning the per-user
  * [[KaplanMeier]] machinery formalizes after the fact.
  *
  * DETERMINISM — no division anywhere: band membership is the exact
  * integer cross-multiplication
  *   (t_corpus − t_last)·(n−1) ≥ k·(t_last − t_first)
  * (the [[graft.operators.Rfm]] posture), so every user lands in
  * exactly one band by integer comparisons; the one double is each
  * band's population share.
  *
  * SCALE. One scan → per-user clock triple → a 1-row corpus max
  * broadcast → 6-row histogram. */
object ChurnRisk {

  /** Band edges in mean-gap multiples. */
  val bands: Seq[Long] = Seq(1L, 2L, 4L, 8L)

  def churnRisk(events: DataFrame): DataFrame = {
    val pu = events.groupBy("user_id").agg(
      min(unix_micros(col("ts"))).as("f_us"),
      max(unix_micros(col("ts"))).as("l_us"),
      count(lit(1)).as("n"))
    val mx = pu.agg(max(col("l_us")).as("corpus_us"))
    val banded = pu.crossJoin(broadcast(mx))
      .select(
        when(col("n") <= 1, "unknown")
          .otherwise(
            // overdue·(n−1) vs k·span — exact integers
            when((col("corpus_us") - col("l_us")) * (col("n") - 1) <
              lit(bands.head) * (col("l_us") - col("f_us")), "lt1x")
            .when((col("corpus_us") - col("l_us")) * (col("n") - 1) <
              lit(bands(1)) * (col("l_us") - col("f_us")), "1to2x")
            .when((col("corpus_us") - col("l_us")) * (col("n") - 1) <
              lit(bands(2)) * (col("l_us") - col("f_us")), "2to4x")
            .when((col("corpus_us") - col("l_us")) * (col("n") - 1) <
              lit(bands(3)) * (col("l_us") - col("f_us")), "4to8x")
            .otherwise("ge8x")).as("band"))
    // the 6-row histogram feeds its own total — checkpoint it so the
    // corpus scan is paid once (plan-asserted posture)
    val (hist, _) = graft.util.Checkpoints.checkpointTracked(
      banded.groupBy("band").agg(count(lit(1)).as("n_users")))
    val tot = hist.agg(sum(col("n_users")).as("t"))
    hist.crossJoin(broadcast(tot))
      .selectExpr("band", "n_users",
        """cast(round(1000000.0 * cast(n_users as double)
          | / cast(t as double)) as bigint) as share_micro"""
          .stripMargin.replace("\n", " "))
      .orderBy("band")
  }

  def qChurnRisk(spark: SparkSession, dir: String): DataFrame =
    churnRisk(Tables(spark, dir, "events"))

  val qChurnRiskSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id, MIN(epoch_us(ts)) AS f_us,
       |    MAX(epoch_us(ts)) AS l_us, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY user_id),
       |mx AS (SELECT MAX(l_us) AS corpus_us FROM pu),
       |banded AS (
       |  SELECT CASE WHEN n <= 1 THEN 'unknown'
       |    WHEN (corpus_us - l_us) * (n - 1)
       |       < ${bands.head} * (l_us - f_us) THEN 'lt1x'
       |    WHEN (corpus_us - l_us) * (n - 1)
       |       < ${bands(1)} * (l_us - f_us) THEN '1to2x'
       |    WHEN (corpus_us - l_us) * (n - 1)
       |       < ${bands(2)} * (l_us - f_us) THEN '2to4x'
       |    WHEN (corpus_us - l_us) * (n - 1)
       |       < ${bands(3)} * (l_us - f_us) THEN '4to8x'
       |    ELSE 'ge8x' END AS band
       |  FROM pu, mx),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM banded)
       |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_users,
       |  CAST(ROUND(1000000.0 * CAST(COUNT(*) AS DOUBLE)
       |    / CAST((SELECT t FROM tot) AS DOUBLE)) AS BIGINT)
       |    AS share_micro
       |FROM banded GROUP BY band
       |ORDER BY band""".stripMargin
}
