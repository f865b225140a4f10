package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** WALD'S SEQUENTIAL PROBABILITY RATIO TEST (Wald 1945, Ann. Math.
  * Stat. — the optimal sequential test, and the modern "always-valid
  * inference" answer to the A/B-peeking problem the fixed-horizon
  * [[AbTest]] chi-square can't give): per experiment arm, users are
  * observed in ARRIVAL ORDER (first event timestamp, user_id tiebreak)
  * and the cumulative log-likelihood ratio of H1: p = p1 vs
  * H0: p = p0 runs until it escapes Wald's boundaries
  *
  *   A = ln((1−β)/α) = ln 19,   B = ln(β/(1−α)) = −ln 19
  *
  * (α = β = 0.05). First crossing decides — accept_h1 above, accept_h0
  * below, 'continue' if the walk never escapes — and the readout is
  * HOW MANY observations the decision needed (Wald's whole point:
  * typically far fewer than the fixed-horizon n).
  *
  * DETERMINISM. The per-user increment takes one of exactly two
  * values (y∈{0,1}), each ONE ln of one literal-double ratio,
  * micro-quantized — so the running LLR is an integer prefix sum over
  * a total order, and boundary crossings compare integers to integer
  * constants. Conversion (y = purchases ≥ [[AbTest.convMin]]) and the
  * md5 arm coin are shared with [[AbTest]] — same split, same metric.
  *
  * SCALE. The cumulative sum is the [[PrefixSum]] scalable shape (one
  * range-partitioned sort, per-partition offsets — never a
  * single-partition window): ONE global sort on (arm, first_ts,
  * user_id) carries BOTH running totals (LLR and observation rank, the
  * new multi-column variant), and per-arm prefixes are recovered by
  * subtracting the bounded per-arm offset table (arms-before totals —
  * a broadcast). First-crossing extraction is a per-arm min + one
  * equi-join back. */
object Sprt {

  /** H0/H1 conversion rates — exact decimal literals on both sides,
    * bracketing the corpus's ~0.5 conversion base rate. */
  val p0 = "0.45"
  val p1 = "0.55"

  /** ln(19)·1e6: Wald's A (and −B) for α = β = 0.05. */
  val boundMicro = 2944439L

  /** Per-user (arm, first_ts, y, inc_micro): one scan of events. */
  def perUser(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchases"),
        min(col("ts")).as("first_ts"))
      .withColumn("arm", AbTest.armOf(col("user_id")))
      .withColumn("y",
        (col("purchases") >= AbTest.convMin).cast(IntegerType))
      .transform(withInc)
      .select("user_id", "arm", "first_ts", "y", "inc_micro")

  /** Adds the two-valued LLR increment from the 0/1 `y` column. */
  def withInc(df: DataFrame): DataFrame =
    df.selectExpr("*",
      s"""case when y = 1
         | then cast(round(1000000.0 * ln($p1 / $p0)) as bigint)
         | else cast(round(1000000.0 * ln((1.0 - $p1) / (1.0 - $p0)))
         |   as bigint) end as inc_micro""".stripMargin.replace("\n", ""))

  /** One row per arm: (arm, decision, n_obs, llr_micro). */
  def sprt(events: DataFrame): DataFrame =
    sprtFromPerUser(perUser(events))

  /** The walk from any (user_id, arm, first_ts, inc_micro) per-user
    * frame — `first_ts` only needs to be orderable (timestamp in the
    * batch path, epoch micros in the streaming store's view; the
    * induced arrival order is identical). */
  def sprtFromPerUser(perUserRows: DataFrame): DataFrame = {
    val rows = perUserRows.withColumn("one", lit(1L))
    val cum = PrefixSum.withRunningTotals(rows,
      Seq(col("arm"), col("first_ts"), col("user_id")),
      Seq("inc_micro", "one"), Seq("cum_g", "n_g"))
    // per-arm totals and arms-before offsets: bounded (2 rows), so the
    // triangular self-join and the broadcast back are both trivial
    val armTot = rows.groupBy("arm")
      .agg(sum("inc_micro").as("t_llr"), count(lit(1)).as("t_n"))
    val off = armTot.alias("a")
      .join(armTot.alias("b"), col("b.arm") < col("a.arm"), "left_outer")
      .groupBy(col("a.arm").as("arm"))
      .agg(sum(coalesce(col("b.t_llr"), lit(0L))).as("off_llr"),
        sum(coalesce(col("b.t_n"), lit(0L))).as("off_n"),
        max(col("a.t_llr")).as("t_llr"), max(col("a.t_n")).as("t_n"))
    val inArm = cum.join(broadcast(off.select("arm", "off_llr", "off_n")),
        Seq("arm"))
      .select(col("arm"),
        (col("cum_g") - col("off_llr")).as("cum_llr"),
        (col("n_g") - col("off_n")).as("n_in"))
    val crossing = inArm.filter(
      col("cum_llr") >= boundMicro || col("cum_llr") <= -boundMicro)
    val firstCross = crossing.groupBy("arm").agg(min("n_in").as("n_obs"))
    val decided = firstCross
      .join(inArm.withColumnRenamed("n_in", "n_obs"), Seq("arm", "n_obs"))
      .select(col("arm"),
        when(col("cum_llr") >= boundMicro, "accept_h1")
          .otherwise("accept_h0").as("decision"),
        col("n_obs"), col("cum_llr").as("llr_micro"))
    val undecided = off.join(firstCross, Seq("arm"), "left_anti")
      .select(col("arm"), lit("continue").as("decision"),
        col("t_n").as("n_obs"), col("t_llr").as("llr_micro"))
    decided.unionByName(undecided)
  }

  def qSprt(spark: SparkSession, dir: String): DataFrame =
    sprt(Tables(spark, dir, "events"))

  val qSprtSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id, min(ts) AS first_ts,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm,
       |    CASE WHEN SUM(CASE WHEN event_type = 'purchase'
       |      THEN 1 ELSE 0 END) >= ${AbTest.convMin}
       |      THEN 1 ELSE 0 END AS y
       |  FROM events GROUP BY user_id),
       |inc AS MATERIALIZED (
       |  SELECT *, CASE WHEN y = 1
       |    THEN CAST(round(1000000.0 * ln($p1 / $p0)) AS BIGINT)
       |    ELSE CAST(round(1000000.0 * ln((1.0 - $p1) / (1.0 - $p0)))
       |      AS BIGINT) END AS inc_micro
       |  FROM pu),
       |cum AS MATERIALIZED (
       |  SELECT arm,
       |    SUM(inc_micro) OVER w AS cum_llr,
       |    ROW_NUMBER() OVER w AS n_in
       |  FROM inc
       |  WINDOW w AS (PARTITION BY arm ORDER BY first_ts, user_id)),
       |cr AS MATERIALIZED (
       |  SELECT arm, min(n_in) AS n_obs FROM cum
       |  WHERE cum_llr >= $boundMicro OR cum_llr <= -$boundMicro
       |  GROUP BY arm),
       |tot AS MATERIALIZED (
       |  SELECT arm, CAST(SUM(inc_micro) AS BIGINT) AS t_llr,
       |    CAST(COUNT(*) AS BIGINT) AS t_n
       |  FROM inc GROUP BY arm)
       |SELECT t.arm,
       |  CASE WHEN cr.arm IS NULL THEN 'continue'
       |    WHEN k.cum_llr >= $boundMicro THEN 'accept_h1'
       |    ELSE 'accept_h0' END AS decision,
       |  CAST(COALESCE(cr.n_obs, t.t_n) AS BIGINT) AS n_obs,
       |  CAST(COALESCE(k.cum_llr, t.t_llr) AS BIGINT) AS llr_micro
       |FROM tot t
       |LEFT JOIN cr ON t.arm = cr.arm
       |LEFT JOIN cum k ON k.arm = cr.arm AND k.n_in = cr.n_obs""".stripMargin
}
