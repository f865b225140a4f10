package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** ONE-WAY ANOVA (Fisher 1925) of document length across sources —
  * the "are these sources even drawn from the same length
  * distribution?" gate a mixture plan ([[graft.ext.TextOps]]'s
  * mixture family) should check before treating sources as
  * exchangeable, and the classic k-group generalization of the
  * two-arm Welch readout in [[AbTest]]:
  *
  *   F = (SSB/(k−1)) / (SSW/(n−k)),  η² = SSB/SST.
  *
  * DETERMINISM. Per-group sufficient statistics (n_g, Σy, Σy²) are
  * exact integers off ONE scan; the between-group mass Σ_g S_g²/n_g
  * needs doubles (no common denominator), and a parallel double
  * reduction would be order-nondeterministic — so the per-group terms
  * are folded by an ORDERED window cumulative over the source name
  * (left-to-right IEEE adds, the same order the oracle's ordered
  * window sum replays). Everything after is 1-row arithmetic from
  * exact longs + that one ordered double.
  *
  * SCALE SHAPE. One corpus scan → |sources| rows; the window rides a
  * bounded-domain table (sources are schema-sized). Output: one row
  * per source (n, exact integer mean_micro) with the shared f_micro /
  * eta2_micro verdict columns repeated (the [[Lorenz]] single-table
  * convention). */
object Anova {

  /** ANOVA over any (g, y) frame — g the group label, y an integer
    * response. */
  def anova(df: DataFrame): DataFrame = {
    // |groups| sufficient-statistic rows, materialized once: the
    // verdict chain AND the output join both consume it — without the
    // checkpoint each would re-scan the corpus (plan-asserted)
    val (grp, _) = graft.util.Checkpoints.checkpointTracked(
      df.groupBy("g").agg(count(lit(1)).as("n_g"),
        sum("y").as("s_g"),
        expr("sum(cast(y as decimal(38,0)) * y)").as("q_g")))
    val w = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ordered double fold of the between-group terms
    val cum = grp.withColumn("t_g",
        expr("cast(s_g as double) * cast(s_g as double)" +
          " / cast(n_g as double)"))
      .withColumn("cum_t", sum(col("t_g")).over(w))
      .withColumn("rn", row_number().over(Window.orderBy(col("g"))))
    // max(struct(rn, cum_t)) picks the LAST cumulative (= the full
    // ordered fold) — the Spark twin of the oracle's max_by(cum_t, rn)
    val totals = cum.agg(sum("n_g").as("n"), sum("s_g").as("s"),
      sum("q_g").as("q"), count(lit(1)).as("k"),
      max(struct(col("rn"), col("cum_t"))).as("last"))
      .select(col("n"), col("s"), col("q"), col("k"),
        col("last.cum_t").as("a"))
    val verdict = totals.selectExpr("n", "k",
      """case when k <= 1 or n <= k then 0.0 else
        | (a - cast(s as double) * cast(s as double) / cast(n as double))
        | end as ssb""".stripMargin.replace("\n", " "),
      """case when k <= 1 or n <= k then 0.0 else
        | (cast(q as double)
        |  - cast(s as double) * cast(s as double) / cast(n as double))
        | end as sst""".stripMargin.replace("\n", " "))
      .selectExpr("n", "k", "ssb", "sst",
        "(sst - ssb) as ssw")
      .selectExpr(
        // ssw = 0 with real between-group spread is a PERFECT
        // separation — saturate F (the TimeSeriesPair sentinel), don't
        // report 0
        s"""case when k <= 1 or n <= k or sst = 0.0 then 0L
          | when ssw <= 0.0 then ${TimeSeriesPair.fSatMicro}L else
          | cast(round(1000000.0 *
          |   (ssb / (cast(k as double) - 1.0))
          |   / (ssw / (cast(n as double) - cast(k as double))))
          |   as bigint) end as f_micro""".stripMargin.replace("\n", " "),
        """case when sst = 0.0 then 0L else
          | cast(round(1000000.0 * ssb / sst) as bigint)
          | end as eta2_micro""".stripMargin.replace("\n", " "))
    grp.crossJoin(broadcast(verdict))
      .select(col("g").as("source"), col("n_g"),
        expr("(1000000L * s_g) div n_g").as("mean_micro"),
        col("f_micro"), col("eta2_micro"))
      .orderBy("source")
  }

  def qAnova(spark: SparkSession, dir: String): DataFrame =
    anova(Tables(spark, dir, "documents")
      .select(col("source").as("g"), col("n_chars").as("y")))

  val qAnovaSql: String =
    """WITH grp AS MATERIALIZED (
      |  SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS n_g,
      |    CAST(SUM(n_chars) AS BIGINT) AS s_g,
      |    CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS q_g
      |  FROM documents GROUP BY 1),
      |cum AS (
      |  SELECT g, n_g, s_g, q_g,
      |    SUM(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
      |        / CAST(n_g AS DOUBLE))
      |      OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS cum_t,
      |    row_number() OVER (ORDER BY g) AS rn
      |  FROM grp),
      |totals AS (
      |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
      |    CAST(SUM(s_g) AS BIGINT) AS s, CAST(SUM(q_g) AS HUGEINT) AS q,
      |    CAST(COUNT(*) AS BIGINT) AS k,
      |    max_by(cum_t, rn) AS a
      |  FROM cum),
      |sums AS (
      |  SELECT n, k,
      |    CASE WHEN k <= 1 OR n <= k THEN 0.0 ELSE
      |      (a - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |        / CAST(n AS DOUBLE)) END AS ssb,
      |    CASE WHEN k <= 1 OR n <= k THEN 0.0 ELSE
      |      (CAST(q AS DOUBLE)
      |       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |        / CAST(n AS DOUBLE)) END AS sst
      |  FROM totals),
      |verdict AS (
      |  SELECT
      |    CASE WHEN k <= 1 OR n <= k OR sst = 0.0 THEN 0
      |      WHEN (sst - ssb) <= 0.0 THEN 999999999999 ELSE
      |      CAST(ROUND(1000000.0 *
      |        (ssb / (CAST(k AS DOUBLE) - 1.0))
      |        / ((sst - ssb) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))
      |        AS BIGINT) END AS f_micro,
      |    CASE WHEN sst = 0.0 THEN 0 ELSE
      |      CAST(ROUND(1000000.0 * ssb / sst) AS BIGINT)
      |      END AS eta2_micro
      |  FROM sums)
      |SELECT g AS source, n_g,
      |  (1000000 * s_g) // n_g AS mean_micro, f_micro, eta2_micro
      |FROM grp CROSS JOIN verdict
      |ORDER BY source""".stripMargin
}
