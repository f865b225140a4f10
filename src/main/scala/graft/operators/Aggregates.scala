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

  /** Exact, order-independent sum of a double column. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact, order-independent average of a double column. */
  def davg(c: Column): Column =
    (sum(c.cast("decimal(18,2)")) / count(c)).cast("double")

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
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) / COUNT(l_discount) AS DOUBLE) AS avg_disc,
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
