package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVIVAL QUANTILES (Brookmeyer & Crowley 1982's point estimate) —
  * the one-number summaries a KM curve gets read for: the first
  * duration at which survival crosses 75% / 50% (median) / 25%,
  *
  *   t_q = min{ t : S(t) ≤ q },
  *
  * with "never crossed in the observation window" surfaced as a NULL
  * duration + reached = false rather than a censored-looking number.
  *
  * DETERMINISM. The crossing test runs entirely on
  * [[KaplanMeier.lifeTable]]'s INTEGER log-survival column:
  * S(t) ≤ q ⟺ log_s_micro ≤ round(1e6·ln q) (or S hit exact 0, the
  * NULL-log case) — no float compare anywhere.
  *
  * SCALE. The life table is duration-domain-bounded; the quantile
  * probe is a 3-row broadcast fan-out + MIN. */
object MedianSurvival {

  /** (q_micro, ln-q threshold in micronats). */
  val quantiles: Seq[(Long, Long)] =
    Seq(0.75, 0.5, 0.25).map(q =>
      math.round(1e6 * q) -> math.round(1e6 * math.log(q)))

  /** Quantile table over any (f_us, l_us, p_us) per-subject frame:
    * (q_micro, t_days nullable, reached). */
  def survivalQuantiles(perUser: DataFrame): DataFrame = {
    val lt = KaplanMeier.lifeTable(perUser)
    val spark = perUser.sparkSession
    import spark.implicits._
    val qs = quantiles.toDF("q_micro", "thr")
    broadcast(qs).join(lt,
        col("log_s_micro").isNull || col("log_s_micro") <= col("thr"),
        "left")
      .groupBy("q_micro")
      .agg(min(col("t_days")).as("t_days"),
        (count(col("t_days")) > 0).as("reached"))
      .orderBy(col("q_micro").desc)
  }

  def qMedianSurvival(spark: SparkSession, dir: String): DataFrame =
    survivalQuantiles(
      KaplanMeier.timeToBigPurchase(Tables(spark, dir, "events")))

  val qMedianSurvivalSql: String = {
    val vals = quantiles.map { case (q, t) => s"($q, $t)" }.mkString(", ")
    s"""WITH km AS MATERIALIZED (${KaplanMeier.qKaplanMeierSql}),
       |qs(q_micro, thr) AS (VALUES $vals)
       |SELECT q_micro, MIN(km.t_days) AS t_days,
       |  COUNT(km.t_days) > 0 AS reached
       |FROM qs LEFT JOIN km
       |  ON km.log_s_micro IS NULL OR km.log_s_micro <= qs.thr
       |GROUP BY q_micro
       |ORDER BY q_micro DESC""".stripMargin
  }
}
