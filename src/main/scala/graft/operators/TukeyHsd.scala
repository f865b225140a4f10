package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** TUKEY'S HSD POST-HOC (Tukey 1949) — the follow-up [[Anova]]'s F
  * demands: WHICH source pairs differ in document length, with the
  * familywise error held at 5% by the studentized-range fence
  *
  *   |m_i − m_j| > q · sqrt( MSW/2 · (1/n_i + 1/n_j) )
  *
  * (the Tukey-Kramer unbalanced form). q is pinned at
  * q₀.₀₅(20, ∞) = 5.01 — exact for the corpus' 20-source layout,
  * CONSERVATIVE for fewer groups (q shrinks with k), stated rather
  * than recomputed (a runtime studentized-range inverse is a float
  * channel no engine shares).
  *
  * DETERMINISM. Per-group (n, Σy, Σy²) are exact integers; MSW
  * re-derives through the SAME ordered-window fold as [[Anova]]
  * (left-to-right IEEE adds both engines replay); each pair's
  * diff and fence are fully-double-cast expressions over exact
  * integers plus that one ordered double.
  *
  * SCALE. One corpus scan → the checkpointed |sources| stat table;
  * the C(k, 2) pair join and the fence are grid-sized. */
object TukeyHsd {

  /** q₀.₀₅(k = 20, df = ∞), micro-pinned. */
  val qCritMicro = 5010000L

  def tukeyHsd(df: DataFrame): DataFrame = {
    val (grp, _) = graft.util.Checkpoints.checkpointTracked(
      df.groupBy("g").agg(count(lit(1)).as("n_g"),
        sum("y").as("s_g"),
        expr("sum(cast(y as decimal(38,0)) * y)").as("q_g")))
    val w = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grp.withColumn("t_g",
        expr("cast(s_g as double) * cast(s_g as double)" +
          " / cast(n_g as double)"))
      .withColumn("cum_t", sum(col("t_g")).over(w))
      .withColumn("rn", row_number().over(Window.orderBy(col("g"))))
    val msw = cum.agg(sum("n_g").as("n"), sum("q_g").as("q"),
        count(lit(1)).as("k"),
        max(struct(col("rn"), col("cum_t"))).as("last"))
      .selectExpr("n", "k",
        """case when n <= k then 0.0 else
          | (cast(q as double) - last.cum_t)
          |   / (cast(n as double) - cast(k as double)) end as msw"""
          .stripMargin.replace("\n", " "))
    val a = grp.select(col("g").as("g_a"), col("n_g").as("n_a"),
      col("s_g").as("s_a"))
    val b = grp.select(col("g").as("g_b"), col("n_g").as("n_b"),
      col("s_g").as("s_b"))
    a.join(b, col("g_a") < col("g_b"))
      .crossJoin(broadcast(msw))
      .selectExpr("g_a", "g_b", "n_a", "n_b",
        """cast(round(1000000.0 * abs(
          |  cast(s_a as double) / cast(n_a as double)
          |  - cast(s_b as double) / cast(n_b as double))) as bigint)
          | as diff_micro""".stripMargin.replace("\n", " "),
        s"""case when msw <= 0.0 then 0 else
           |cast(round(${qCritMicro / 1e6} * sqrt(msw / 2.0
           |  * (1.0 / cast(n_a as double) + 1.0 / cast(n_b as double)))
           |  * 1000000.0) as bigint) end as hsd_micro"""
          .stripMargin.replace("\n", " "))
      .withColumn("significant",
        col("hsd_micro") > 0L && col("diff_micro") > col("hsd_micro"))
      .orderBy("g_a", "g_b")
  }

  def qTukeyHsd(spark: SparkSession, dir: String): DataFrame =
    tukeyHsd(Tables(spark, dir, "documents")
      .select(col("source").as("g"), col("n_chars").as("y")))

  val qTukeyHsdSql: String =
    s"""WITH grp AS MATERIALIZED (
       |  SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS n_g,
       |    CAST(SUM(n_chars) AS BIGINT) AS s_g,
       |    CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT)
       |      AS q_g
       |  FROM documents GROUP BY source),
       |cum AS (
       |  SELECT g, n_g, s_g, q_g,
       |    SUM(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
       |      / CAST(n_g AS DOUBLE)) OVER (ORDER BY g
       |      ROWS UNBOUNDED PRECEDING) AS cum_t,
       |    row_number() OVER (ORDER BY g) AS rn
       |  FROM grp),
       |msw AS (
       |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
       |    CAST(COUNT(*) AS BIGINT) AS k,
       |    CASE WHEN SUM(n_g) <= COUNT(*) THEN 0.0 ELSE
       |      (CAST(SUM(q_g) AS DOUBLE) - max_by(cum_t, rn))
       |        / (CAST(SUM(n_g) AS DOUBLE) - COUNT(*)) END AS msw
       |  FROM cum)
       |SELECT a.g AS g_a, b.g AS g_b, a.n_g AS n_a, b.n_g AS n_b,
       |  CAST(ROUND(1000000.0 * ABS(
       |    CAST(a.s_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
       |    - CAST(b.s_g AS DOUBLE) / CAST(b.n_g AS DOUBLE))) AS BIGINT)
       |    AS diff_micro,
       |  CASE WHEN msw <= 0.0 THEN 0 ELSE
       |    CAST(ROUND(${qCritMicro / 1e6} * SQRT(msw / 2.0
       |      * (1.0 / CAST(a.n_g AS DOUBLE)
       |         + 1.0 / CAST(b.n_g AS DOUBLE))) * 1000000.0)
       |      AS BIGINT) END AS hsd_micro,
       |  (CASE WHEN msw <= 0.0 THEN 0 ELSE
       |    CAST(ROUND(${qCritMicro / 1e6} * SQRT(msw / 2.0
       |      * (1.0 / CAST(a.n_g AS DOUBLE)
       |         + 1.0 / CAST(b.n_g AS DOUBLE))) * 1000000.0)
       |      AS BIGINT) END) > 0
       |  AND CAST(ROUND(1000000.0 * ABS(
       |    CAST(a.s_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
       |    - CAST(b.s_g AS DOUBLE) / CAST(b.n_g AS DOUBLE))) AS BIGINT)
       |    > (CASE WHEN msw <= 0.0 THEN 0 ELSE
       |    CAST(ROUND(${qCritMicro / 1e6} * SQRT(msw / 2.0
       |      * (1.0 / CAST(a.n_g AS DOUBLE)
       |         + 1.0 / CAST(b.n_g AS DOUBLE))) * 1000000.0)
       |      AS BIGINT) END) AS significant
       |FROM grp a JOIN grp b ON a.g < b.g
       |CROSS JOIN msw
       |ORDER BY g_a, g_b""".stripMargin
}
