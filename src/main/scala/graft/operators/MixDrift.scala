package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CATEGORICAL MIX DRIFT (G-test / log-likelihood ratio) — does a
  * period's category mix differ from the corpus baseline more than
  * chance allows? The data-quality monitor for DISTRIBUTIONS where the
  * trio in [[Events]] monitors COUNTS: an upstream change that doubles
  * one order-priority's share while volume stays flat trips nothing in
  * a rate monitor, and everything here.
  *
  * G = 2·Σ O·ln(O/E) with E = rowTotal·colTotal/N (Dunning 1993's
  * log-likelihood form — better-behaved than χ² at small expecteds,
  * and its ln evaluates on an INTEGER-count ratio, the engine's
  * float-determinism posture: O·N/(rowTotal·colTotal) is assembled
  * from exact longs cast to double, both engines evaluate the same
  * tree, and the per-row sum has ≤|categories| well-conditioned
  * positive terms). Zero cells contribute 0 (lim x·ln x = 0),
  * spelled as an explicit CASE on both engines.
  *
  * Plan: ONE partial-agg scan collapses the corpus to the
  * |periods × categories| contingency rollup; row/column totals are
  * two more aggs OVER THE ROLLUP (never the corpus), broadcast back;
  * scoring is map-only. The alarm threshold is χ²(df=4) at 1% —
  * 13.28, a source literal both engines compare against. */
object MixDrift {

  /** G-test of `obs(period, cat)` counts vs the all-period mix:
    * (period, n, g, drifted). */
  def mixDrift(obs: DataFrame): DataFrame =
    mixDriftCells(
      obs.groupBy("period", "cat").agg(count(lit(1)).as("o")))

  /** The statistic over a PRE-AGGREGATED contingency table
    * `cell(period, cat, o)` — the form incremental stores serve
    * directly (the hourly count store's day rollup IS this table, so
    * the streaming view shares this one definition with batch). */
  def mixDriftCells(cellIn: DataFrame): DataFrame = {
    val cell = cellIn
    val rowT = cell.groupBy("period").agg(sum(col("o")).as("rt"))
    val colT = cell.groupBy("cat").agg(sum(col("o")).as("ct"))
    val n = cell.agg(sum(col("o")).as("n"))
    cell
      .join(broadcast(rowT), "period")
      .join(broadcast(colT), "cat")
      .crossJoin(broadcast(n))
      .withColumn("term",
        when(col("o") > 0,
          col("o").cast("double") * log(
            (col("o").cast("double") * col("n").cast("double")) /
              (col("rt").cast("double") * col("ct").cast("double"))))
          .otherwise(lit(0.0)))
      .groupBy("period")
      .agg(max(col("rt")).as("n"), (sum(col("term")) * 2.0).as("g"))
      .withColumn("drifted", (col("g") > 13.28).cast("integer"))
      .select("period", "n", "g", "drifted")
  }

  /** Driver query: monthly order-priority mix vs the corpus mix. */
  def qMixDrift(spark: SparkSession, dir: String): DataFrame =
    mixDrift(Tables(spark, dir, "orders").select(
      date_trunc("month", col("o_orderdate")).as("period"),
      col("o_orderpriority").as("cat")))

  val qMixDriftSql: String =
    """WITH cell AS (
      |  SELECT date_trunc('month', o_orderdate) AS period,
      |    o_orderpriority AS cat, CAST(COUNT(*) AS BIGINT) AS o
      |  FROM orders GROUP BY 1, 2),
      |rt AS (SELECT period, CAST(SUM(o) AS BIGINT) AS rt
      |       FROM cell GROUP BY 1),
      |ct AS (SELECT cat, CAST(SUM(o) AS BIGINT) AS ct
      |       FROM cell GROUP BY 1),
      |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cell),
      |terms AS (
      |  SELECT c.period, r.rt,
      |    CASE WHEN c.o > 0
      |      THEN CAST(c.o AS DOUBLE) * ln(
      |        (CAST(c.o AS DOUBLE) * CAST(n.n AS DOUBLE))
      |          / (CAST(r.rt AS DOUBLE) * CAST(t.ct AS DOUBLE)))
      |      ELSE 0.0 END AS term
      |  FROM cell c JOIN rt r USING (period) JOIN ct t USING (cat)
      |  CROSS JOIN n)
      |SELECT period, MAX(rt) AS n, SUM(term) * 2.0 AS g,
      |  CAST(SUM(term) * 2.0 > 13.28 AS INTEGER) AS drifted
      |FROM terms GROUP BY 1""".stripMargin
}
