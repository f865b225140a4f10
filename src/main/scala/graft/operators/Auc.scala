package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EXACT ROC AUC by rank statistics — the threshold-free grade of the
  * quality classifier, completing its eval suite (confusion matrix =
  * one operating point; calibration = probability quality; AUC = the
  * full ranking quality). Uses the Mann-Whitney identity
  *
  *   AUC = U₁ / (n₊·n₋),   U₁ = R₊ − n₊(n₊+1)/2
  *
  * with average-rank tie handling — exactly P(score₊ > score₋) +
  * ½·P(score₊ = score₋), the probabilistic definition (Hanley &
  * McNeil 1982). NOT the trapezoid-over-sampled-thresholds
  * approximation ML libraries default to: ranks make it exact at any
  * scale in one pass.
  *
  * DETERMINISM: the [[AbTest.mannWhitney]] doubled-rank machinery —
  * ties take average ranks so ALL bookkeeping is on 2·rank integers
  * (a value group of size m with c observations strictly below gives
  * every member doubled rank 2c + m + 1); the only float is the final
  * division, mirrored both engines. Degenerate inputs (single-class
  * labels) report the uninformative 0.5 with `defined` = false — an
  * exact-integer guard, never a NaN.
  *
  * SCALE: one partial agg to the per-SCORE group table (bounded by
  * the score domain, not the corpus — integer classifier margins),
  * [[PrefixSum]]'s range-partitioned running total for the
  * strictly-below counts (NO single-partition window), then a 1-row
  * agg. Rank sums ride DECIMAL(38,0): Σ m₊·(2c+m+1) is O(N²) mass
  * and would overflow Long at 100 TB corpus sizes. */
object Auc {

  /** AUC over a scored frame: `scoreCol` integral, `labelCol` 0/1.
    * Output (1 row): (n_pos, n_neg, auc_micro, gini_micro, defined). */
  def auc(scored: DataFrame, scoreCol: String = "score",
          labelCol: String = "y"): DataFrame = {
    val groups = scored.groupBy(scoreCol).agg(
      count(lit(1)).as("m"),
      sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("m1"))
    val t = PrefixSum.withRunningTotalTracked(
      groups, Seq(col(scoreCol).asc), "m", "run")
    try {
      t.df
        .select(col("m"), col("m1"), (col("run") - col("m")).as("c"))
        .agg(
          sum(col("m1")).as("n1"),
          sum(col("m") - col("m1")).as("n0"),
          sum(col("m1").cast(DecimalType(38, 0))
            * (lit(2L) * col("c") + col("m") + 1L)).as("r2"))
        .selectExpr(
          "cast(n1 as bigint) as n_pos",
          "cast(n0 as bigint) as n_neg",
          """case when n1 = 0 or n0 = 0 then 500000L else
            |cast(round(1000000.0
            |  * cast(r2 - n1 * (cast(n1 as decimal(38,0)) + 1) as double)
            |  / (2.0 * cast(n1 as double) * n0)) as bigint) end
            |  as auc_micro""".stripMargin.replace("\n", " "),
          """case when n1 = 0 or n0 = 0 then 0L else
            |cast(round(1000000.0
            |  * (cast(r2 - n1 * (cast(n1 as decimal(38,0)) + 1) as double)
            |     / (cast(n1 as double) * n0) - 1.0)) as bigint) end
            |  as gini_micro""".stripMargin.replace("\n", " "),
          "n1 > 0 and n0 > 0 as defined")
        // the 1-row result must outlive the released checkpoint
        .localCheckpoint()
    } finally t.checkpoint.unpersist(blocking = false)
  }

  /** The production readout: AUC of the trained quality classifier's
    * margin against the gate label (the [[graft.ext.CorpusOps]]
    * train → serve loop, memoized model). */
  def qAuc(spark: SparkSession, dir: String): DataFrame =
    auc(graft.ext.CorpusOps.qClassifierInfer(spark, dir)
      .select("score", "y"))

  /** Oracle: the full training-unroll + scoring subquery (every
    * divergence in training surfaces here too), then the identical
    * rank-sum rollup — DuckDB's window runs over the BOUNDED
    * per-score group table. */
  val qAucSql: String =
    s"""WITH inf AS MATERIALIZED (
       |  ${graft.ext.CorpusOps.qClassifierInferSql.replace("\n", "\n  ")}),
       |groups AS (
       |  SELECT score, CAST(COUNT(*) AS BIGINT) AS m,
       |    SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS m1
       |  FROM inf GROUP BY score),
       |run AS (
       |  SELECT m, m1,
       |    SUM(m) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) - m AS c
       |  FROM groups),
       |agg AS (
       |  SELECT SUM(m1) AS n1, SUM(m - m1) AS n0,
       |    SUM(m1 * (2 * c + m + 1)) AS r2
       |  FROM run)
       |SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
       |  CASE WHEN n1 = 0 OR n0 = 0 THEN 500000 ELSE
       |    CAST(ROUND(1000000.0
       |      * CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
       |      / (2.0 * CAST(n1 AS DOUBLE) * n0)) AS BIGINT) END
       |    AS auc_micro,
       |  CASE WHEN n1 = 0 OR n0 = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0
       |      * (CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
       |         / (CAST(n1 AS DOUBLE) * n0) - 1.0)) AS BIGINT) END
       |    AS gini_micro,
       |  n1 > 0 AND n0 > 0 AS defined
       |FROM agg""".stripMargin
}
