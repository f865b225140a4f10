package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Aggregation operators (SURVEY.md §2.4: A1 scalar MIN; plus the
  * groupBy/agg path the reference delegates to its warehouse).
  *
  * Float-determinism note: summing DoubleType is order-dependent across
  * engines (Spark partial aggregation vs DuckDB's order), so any SUM/AVG
  * over a double column is computed exactly by first casting the input to
  * DecimalType — decimal addition is associative/exact — and the final
  * scalar is cast back to double. Both engines then produce bit-identical
  * results regardless of partitioning. This is also the right call at
  * 100 TB: money-like columns should be decimals at rest anyway
  * (SURVEY.md §1.2, BQ NUMERIC semantics).
  */
object Aggregates {

  /** Exact, order-independent sum of a money-like double column.
    *
    * Precondition: values carry at most 2 decimal places and |v| < 1e16 —
    * the cast to decimal(18,2) rounds anything finer and (under Spark 4's
    * default ANSI mode) throws CAST_OVERFLOW beyond 1e16. Spark widens the
    * sum to decimal(28,2), so up to ~1e10 rows of 1e16-scale values fit.
    * Do NOT reuse on arbitrary double columns (metrics, embeddings) where
    * 2-dp rounding changes semantics — use a plain `sum` there and accept
    * order-dependence, or widen the precision/scale. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Order-independent average of a money-like double column (same
    * precondition as [[dsum]]). The exact decimal sum is cast to double
    * FIRST and then divided as an IEEE double op — both Spark and DuckDB
    * perform the identical double division, so results are bit-identical.
    * (Dividing in decimal space first is NOT portable: Spark rounds the
    * decimal quotient to 12 fractional digits before the double cast.) */
  def davg(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(c)

  /** Flagship aggregate — TPC-H-Q1-shaped groupBy over lineitem.
    * Map-side partial aggregation (HashAggregate x2) keeps the shuffle to
    * |groups| rows; at 100 TB this is the canonical scalable agg shape. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** A1 — scalar MIN aggregate used as the merge cutoff
    * (reference config.py:180-187). */
  def scalarMin(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").agg(min(col("o_orderdate")).as("mindate"))

  val scalarMinSql: String =
    "SELECT MIN(o_orderdate) AS mindate FROM orders"
}
