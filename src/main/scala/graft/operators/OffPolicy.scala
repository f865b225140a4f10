package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** OFF-POLICY EVALUATION — IPS and SNIPS (Horvitz & Thompson 1952;
  * Li et al. 2011, "Unbiased offline evaluation of contextual-bandit-
  * based news article recommendation"; Swaminathan & Joachims 2015's
  * self-normalized estimator) — the counterfactual question every
  * targeting change asks BEFORE shipping: "what value would policy π
  * have earned on the traffic we already logged under the current
  * randomization?"
  *
  * The logged data is the experiment stream itself: the logging
  * policy is the [[AbTest.armOf]] md5 coin (uniform over {0,1}, so
  * the propensity is exactly ½ — known, not estimated), the context
  * is the user's non-purchase activity count, and the reward is the
  * user's purchase cents. Three candidate policies are evaluated:
  * treat-all, treat-none, and treat-high-engagement (treat iff
  * activity ≥ [[engagementT]]).
  *
  *   IPS(π)   = (1/n)·Σᵤ 1[armᵤ = π(xᵤ)]·rᵤ / ½  = 2·Σ match·r / n
  *   SNIPS(π) = Σ match·r / Σ match            (weights cancel)
  *
  * With a constant known propensity both estimators are EXACT INTEGER
  * arithmetic (micro-quantized by one division) — no float channel at
  * all, unusual for a causal estimator and exactly why this
  * formulation is the right first off-policy readout for an
  * integer-exact engine.
  *
  * SCALE SHAPE. ONE corpus scan → per-user (arm, activity, cents)
  * (the [[AbTest.perUserArm]] posture); each policy is a conditional
  * aggregate over that table — |policies| rows out, no additional
  * shuffle. The per-user inputs are sums the streaming
  * [[graft.streaming.ExperimentStore]] already carries, so
  * offPolicyView serves this live with zero new state. */
object OffPolicy {

  /** Treat-high-engagement threshold (non-purchase events). */
  val engagementT = 40L

  /** Policy table: name → the action π(x) as a SQL predicate over the
    * per-user activity count. */
  val policies: Seq[(String, String)] = Seq(
    ("treat_all", "1"),
    ("treat_none", "0"),
    ("treat_high_engagement",
      s"case when activity >= $engagementT then 1 else 0 end"))

  /** IPS/SNIPS table from any per-user (user_id, arm, activity,
    * cents) frame — ONE pass: every policy's match/reward sums ride
    * the same aggregate, then a bounded stack unpivots to rows. */
  def offPolicyFromPerUser(pu: DataFrame): DataFrame = {
    val aggs = policies.zipWithIndex.flatMap { case ((_, actionSql), i) =>
      Seq(
        sum(when(col("arm") === expr(actionSql), 1L).otherwise(0L))
          .as(s"m$i"),
        sum(when(col("arm") === expr(actionSql), col("cents"))
          .otherwise(0L)).as(s"mc$i"))
    }
    val one = pu.agg(count(lit(1)).as("n"), aggs: _*)
    val stackArgs = policies.zipWithIndex
      .map { case ((name, _), i) => s"'$name', m$i, mc$i" }
      .mkString(", ")
    one.selectExpr("n",
        s"stack(${policies.size}, $stackArgs)" +
          " as (policy, n_matched, matched_cents)")
      .select(col("policy"), col("n"), col("n_matched"),
        col("matched_cents"),
        // value per logged user in micro-cents: 2·Σmr·10⁶ div n
        expr("case when n = 0 then 0L else" +
          " (2000000L * matched_cents) div n end").as("ips_micro"),
        // self-normalized: micro-cents per MATCHED user
        expr("case when n_matched = 0 then 0L else" +
          " (1000000L * matched_cents) div n_matched end")
          .as("snips_micro"))
      .orderBy("policy")
  }

  /** Per-user logged tuple — the one corpus scan. */
  def perUserLogged(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(
        sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
          .as("activity"),
        sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100.0) as bigint)")).otherwise(0L))
          .as("cents"))
      .select(col("user_id"), AbTest.armOf(col("user_id")).as("arm"),
        col("activity"), col("cents"))

  def qOffPolicyEval(spark: SparkSession, dir: String): DataFrame =
    offPolicyFromPerUser(perUserLogged(Tables(spark, dir, "events")))

  val qOffPolicyEvalSql: String = {
    val branches = policies.map { case (name, actionSql) =>
      s"""SELECT '$name' AS policy, n, n_matched, matched_cents,
         |  CASE WHEN n = 0 THEN 0
         |    ELSE (2000000 * matched_cents) // n END AS ips_micro,
         |  CASE WHEN n_matched = 0 THEN 0
         |    ELSE (1000000 * matched_cents) // n_matched END
         |    AS snips_micro
         |FROM (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN arm = ($actionSql) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_matched,
         |    CAST(SUM(CASE WHEN arm = ($actionSql) THEN cents ELSE 0 END)
         |      AS BIGINT) AS matched_cents
         |  FROM pu)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS BIGINT) % 2 AS BIGINT) AS arm,
       |    SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
       |      AS activity,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
       |      AS cents
       |  FROM events GROUP BY user_id)
       |$branches
       |ORDER BY policy""".stripMargin
  }
}
