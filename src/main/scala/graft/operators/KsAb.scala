package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** TWO-SAMPLE KOLMOGOROV-SMIRNOV A/B TEST (Smirnov 1939) on per-user
  * spend — the DISTRIBUTION-level readout completing the experiment
  * family's triple: [[AbTest]] compares means, [[AbTest.mannWhitney]]
  * ranks, this one the whole CDF:
  *
  *   D = sup_x |F_t(x) − F_c(x)|,
  *   reject at α = 0.05 when D > 1.358·sqrt((n_t+n_c)/(n_t·n_c)),
  *
  * the test that fires when an effect moves the SHAPE (a new heavy
  * tail, a bimodal split) while means and ranks barely move.
  *
  * DETERMINISM. The CDF gap is exact integer cross-multiplication:
  * at every distinct spend value, |cum_t·n_c − cum_c·n_t| is an
  * integer in DECIMAL(38,0)/HUGEINT (d_scaled = D·n_t·n_c exactly);
  * the running totals ride [[PrefixSum]]'s range-partitioned
  * cumulative over the DISTINCT VALUE domain — the [[AbTest
  * .mannWhitneyFromPerUser]] plan shape, no single-partition window.
  * The fence is one sqrt over exact integers with the α constant
  * micro-pinned in shared text.
  *
  * SCALE. One scan → per-user agg → distinct-value groups →
  * range-partitioned prefix sum → 1 row. Serves live from
  * [[graft.streaming.ExperimentStore.ksView]] — zero new state. */
object KsAb {

  /** c(0.05) = 1.358, micro-pinned in the shared fence text. */
  val ksAlphaCoefMicro = 1358000L

  def ksAb(events: DataFrame): DataFrame =
    ksFromPerUser(AbTest.perUserArm(events))

  /** From any (arm, cents) per-user frame (streaming-store entry).
    * BOTH running totals ride one range-partitioned pass. */
  def ksFromPerUser(pu: DataFrame): DataFrame = {
    val groups = pu.groupBy("cents").agg(
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("m_t"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("m_c"))
    val t = PrefixSum.withRunningTotalsTracked(groups,
      Seq(col("cents").asc), Seq("m_t", "m_c"), Seq("cum_t", "cum_c"))
    try ksImpl(t.df)
    finally t.checkpoint.unpersist(blocking = false)
  }

  private def ksImpl(run2: DataFrame): DataFrame = {
    def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    val tot = run2.agg(max(col("cum_t")).as("n_t"),
      max(col("cum_c")).as("n_c"))
    run2.crossJoin(broadcast(tot))
      .select(col("n_t"), col("n_c"),
        abs(d38(col("cum_t")) * col("n_c") - d38(col("cum_c")) * col("n_t"))
          .as("gap"))
      .groupBy("n_t", "n_c")
      .agg(max(col("gap")).as("d_scaled"))
      .selectExpr("n_t", "n_c",
        """case when n_t = 0 or n_c = 0 then 0 else
          |cast(round(1000000.0 * cast(d_scaled as double)
          |  / (cast(n_t as double) * cast(n_c as double))) as bigint)
          |end as d_micro""".stripMargin.replace("\n", " "),
        s"""case when n_t = 0 or n_c = 0 then 0 else
           |cast(round(1.358 * sqrt((cast(n_t as double) + n_c)
           |  / (cast(n_t as double) * cast(n_c as double)))
           |  * 1000000.0) as bigint) end as fence_micro"""
          .stripMargin.replace("\n", " "))
      .withColumn("significant",
        col("fence_micro") > 0L && col("d_micro") > col("fence_micro"))
      // the one-row result must outlive the released checkpoints
      .localCheckpoint()
  }

  def qKsAb(spark: SparkSession, dir: String): DataFrame =
    ksAb(Tables(spark, dir, "events"))

  val qKsAbSql: String =
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
       |      AS cents,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |groups AS (
       |  SELECT cents,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS m_t,
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS m_c
       |  FROM pu GROUP BY cents),
       |run AS (
       |  SELECT
       |    SUM(m_t) OVER w AS cum_t, SUM(m_c) OVER w AS cum_c
       |  FROM groups
       |  WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)),
       |tot AS (SELECT CAST(MAX(cum_t) AS BIGINT) AS n_t,
       |  CAST(MAX(cum_c) AS BIGINT) AS n_c FROM run),
       |agg AS (
       |  SELECT n_t, n_c,
       |    MAX(ABS(CAST(cum_t AS HUGEINT) * n_c
       |      - CAST(cum_c AS HUGEINT) * n_t)) AS d_scaled
       |  FROM run, tot GROUP BY n_t, n_c)
       |SELECT n_t, n_c,
       |  CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(d_scaled AS DOUBLE)
       |      / (CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE))) AS BIGINT)
       |    END AS d_micro,
       |  CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1.358 * sqrt((CAST(n_t AS DOUBLE) + n_c)
       |      / (CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE)))
       |      * 1000000.0) AS BIGINT) END AS fence_micro,
       |  (CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(d_scaled AS DOUBLE)
       |      / (CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE))) AS BIGINT)
       |    END) > (CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE
       |    CAST(ROUND(1.358 * sqrt((CAST(n_t AS DOUBLE) + n_c)
       |      / (CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE)))
       |      * 1000000.0) AS BIGINT) END)
       |  AND (CASE WHEN n_t = 0 OR n_c = 0 THEN 0 ELSE 1 END) = 1
       |    AS significant
       |FROM agg""".stripMargin
}
