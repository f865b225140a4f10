package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** CHI-SQUARE TEST OF INDEPENDENCE + CRAMÉR'S V (Pearson 1900;
  * Cramér 1946) — the categorical-association readout every corpus
  * card needs next to its marginal histograms: is `lang` distributed
  * independently of `source`, and if not, how strongly are they
  * associated on a [0,1] scale that doesn't grow with n (the same
  * statistic-vs-effect-size split as [[AbTest]] z vs Cliff's delta)?
  *
  *   χ² = Σ_cells (O·N − r·c)² / (N·r·c),
  *   V  = sqrt(χ² / (N · (min(R,C) − 1)))
  *
  * DETERMINISM. Observed counts, row/col totals and N are exact
  * integers off ONE corpus scan; each cell's χ² term keeps the
  * numerator (O·N − r·c)² in DECIMAL(38,0) cross-multiplied integers
  * and is micro-quantized per term (the [[KaplanMeier]] round-per-term
  * convention), so the statistic is an INTEGER sum over the bounded
  * grid — engine-portable regardless of summation order. V is one
  * sqrt of a ratio of exact integers.
  *
  * SCALE. One groupBy(lang, source) partial agg is the only
  * corpus-sized work; everything after lives on the |langs|×|sources|
  * grid (both domains bounded — the [[MixDrift]] boundedness
  * contract). Row/col totals are grid-sized re-aggregations, never a
  * second corpus pass. */
object Chi2Assoc {

  /** 1-row association profile over any (a, b) pair frame:
    * (n_obs, a_levels, b_levels, dof, stat_micro, v_micro). */
  def chi2(pairs: DataFrame): DataFrame = {
    // the bounded grid feeds FOUR legs (row totals, col totals, the
    // 1-row tot, and the densify join) — materialize once so the
    // corpus is scanned once (the t_closeness lesson, plan-asserted)
    val (grid, _) = graft.util.Checkpoints.checkpointTracked(
      pairs.groupBy("a", "b").agg(count(lit(1)).as("o")))
    val rows = grid.groupBy("a").agg(sum("o").as("r"))
    val cols = grid.groupBy("b").agg(sum("o").as("c"))
    val tot = grid.agg(sum("o").as("n"),
      countDistinct("a").as("ra"), countDistinct("b").as("cb"))
    // DENSIFY: zero cells carry χ² mass ((0 − E)²/E = E) — the
    // observed grid alone understates the statistic. rows × cols is
    // the bounded |A|×|B| grid, never corpus-sized.
    rows.crossJoin(cols)
      .join(grid, Seq("a", "b"), "left").na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .withColumn("num",
        col("o").cast(DecimalType(38, 0)) * col("n") - col("r") * col("c"))
      .withColumn("term_micro",
        expr("""cast(round(1000000.0
               | * cast(num as double) * cast(num as double)
               | / (cast(n as double) * cast(r as double)
               |    * cast(c as double))) as bigint)"""
          .stripMargin.replace("\n", " ")))
      .groupBy("n", "ra", "cb")
      .agg(sum(col("term_micro")).as("stat_micro"))
      .selectExpr("n as n_obs", "ra as a_levels", "cb as b_levels",
        "(ra - 1) * (cb - 1) as dof", "stat_micro",
        """case when n = 0 or least(ra, cb) <= 1 then 0L else
          |cast(round(1000000.0 * sqrt(cast(stat_micro as double) / 1e6
          |  / (cast(n as double) * (least(ra, cb) - 1)))) as bigint) end
          |as v_micro""".stripMargin.replace("\n", " "))
  }

  def qChi2Assoc(spark: SparkSession, dir: String): DataFrame =
    chi2(Tables(spark, dir, "documents")
      .select(col("lang").as("a"), col("source").as("b")))

  val qChi2AssocSql: String =
    """WITH grid AS MATERIALIZED (
      |  SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |rows_t AS (SELECT a, SUM(o) AS r FROM grid GROUP BY a),
      |cols_t AS (SELECT b, SUM(o) AS c FROM grid GROUP BY b),
      |tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT a) AS ra,
      |  COUNT(DISTINCT b) AS cb FROM grid),
      |dense AS (
      |  SELECT rows_t.a, cols_t.b, rows_t.r, cols_t.c,
      |    COALESCE(grid.o, 0) AS o
      |  FROM rows_t CROSS JOIN cols_t
      |  LEFT JOIN grid ON grid.a = rows_t.a AND grid.b = cols_t.b),
      |terms AS (
      |  SELECT n, ra, cb,
      |    CAST(ROUND(1000000.0
      |      * CAST(CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c AS DOUBLE)
      |      * CAST(CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
      |         * CAST(c AS DOUBLE))) AS BIGINT) AS term_micro
      |  FROM dense, tot),
      |agg AS (
      |  SELECT n, ra, cb, SUM(term_micro) AS stat_micro
      |  FROM terms GROUP BY 1, 2, 3)
      |SELECT CAST(n AS BIGINT) AS n_obs, CAST(ra AS BIGINT) AS a_levels,
      |  CAST(cb AS BIGINT) AS b_levels,
      |  CAST((ra - 1) * (cb - 1) AS BIGINT) AS dof,
      |  CAST(stat_micro AS BIGINT) AS stat_micro,
      |  CASE WHEN n = 0 OR LEAST(ra, cb) <= 1 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * SQRT(CAST(stat_micro AS DOUBLE) / 1e6
      |      / (CAST(n AS DOUBLE) * (LEAST(ra, cb) - 1)))) AS BIGINT) END
      |    AS v_micro
      |FROM agg""".stripMargin
}
