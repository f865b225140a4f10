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

  /** Exact, order-independent sum of a money-like double column,
    * computed as integer CENTS: round(v·100) is an exact long for 2-dp
    * values, long addition is associative (any partitioning gives the
    * same sum), and the final double(cents)/100.0 is one correctly-
    * rounded IEEE op both engines perform identically — bit-identical
    * to the oracle's same formula.
    *
    * This replaced a decimal(18,2)-intermediate formulation that was
    * equally exact but 4× slower (decimal128 adds + ANSI overflow checks
    * vs primitive long adds in codegen; measured 1.8 s → 0.5 s on q1 at
    * sf0.1).
    *
    * Precondition: values carry at most 2 decimal places (rounding
    * anything finer changes semantics) and the cents total stays within
    * long range (|Σv| < 9.2e16; ANSI mode throws on overflow rather than
    * wrapping). Do NOT reuse on arbitrary double columns (metrics,
    * embeddings) — use a plain `sum` there and accept order-dependence. */
  def dsum(c: Column): Column =
    sum(round(c * 100).cast("long")).cast("double") / 100.0

  /** Order-independent average of a money-like double column (same
    * precondition as [[dsum]]): the exact cents sum goes through
    * double(cents)/100.0/count — a fixed sequence of IEEE double ops
    * both engines perform identically, so results are bit-identical.
    * (Dividing in decimal space first is NOT portable: Spark rounds the
    * decimal quotient to 12 fractional digits before the double cast.) */
  def davg(c: Column): Column = dsum(c) / count(c)

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
      |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
      |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Multi-level rollup (SURVEY §2.4: the reference defers grouping to
    * its BI layer; the engine proves the path natively). Spark plans
    * rollup as ONE Expand + hash-aggregate pass — grouping-set rows are
    * generated map-side and partially aggregated before the shuffle, so
    * the exchange still carries only |groups| rows per level. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** GROUPING SETS — the general form [[qRollup]] is a special case of:
    * an explicit lattice of grouping levels in ONE pass. Like rollup,
    * Spark plans it as a single Expand + partial hash-aggregate: the
    * per-level rows are generated map-side and combined before the
    * shuffle, so the exchange carries |groups per level| rows summed
    * over levels — one scan where the naive UNION ALL of three GROUP
    * BYs would take three. Per-column `grouping()` flags (not the
    * packed grouping_id, whose bit order is engine-specific) let
    * consumers — and the oracle — distinguish "NULL key" from
    * "aggregated-away level". */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
        |    / 100.0 AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS (
        |  (l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
      |    / 100.0 AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS (
      |  (l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin

  /** CUBE — the full 2^d grouping lattice, completing the
    * rollup/grouping-sets family: one Expand + one partial
    * hash-aggregate pass (the [[qRollup]] plan shape with 4 levels
    * instead of 3), never a UNION ALL of separate GROUP BYs.
    * grouping() flags disambiguate a real NULL key from a subtotal
    * row, the standard CUBE-consumption contract. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("cast(grouping(l_returnflag) as int)").as("g_rf"),
        expr("cast(grouping(l_linestatus) as int)").as("g_ls"),
        count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** NTILE deciles of customer spend — the quantile-bucketing reporting
    * op ("which spend decile is this account in"), WITHOUT the
    * single-partition window `ntile()` plans: decile is computed from
    * the scalable two-level global row number ([[RowNumbering]], the
    * TRANSACTIONS-scaled posture) and the row count via the exact
    * remainder arithmetic of [[RowNumbering.ntileFromRowNumber]]
    * (first n mod k tiles take one extra row — ntile's own
    * definition; the round-16 edge-corpus sweep retired the
    * approximate "(rn−1)·k div n + 1" identity, which holds only when
    * k divides n). The oracle runs DuckDB's native ntile over the
    * same total order, cross-validating the arithmetic.
    * Order: spend desc, custkey asc. */
  def qNtile(spark: SparkSession, dir: String): DataFrame = {
    val k = 10
    val spend = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("spend"))
    val n = spend.count()
    RowNumbering.withGlobalRowNumber(spend,
        Seq(col("spend").desc, col("o_custkey")), "rn")
      .withColumn("decile",
        RowNumbering.ntileFromRowNumber(k, math.max(n, 1L), "rn"))
      .drop("rn")
  }

  val qNtileSql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
      |      / 100.0 AS spend
      |  FROM orders GROUP BY o_custkey)
      |SELECT o_custkey, spend,
      |  CAST(ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS INTEGER)
      |    AS decile
      |FROM spend""".stripMargin

  /** REGIONAL REVENUE — the TPC-H-Q5-shaped 5-table join rollup
    * (lineitem ⨝ orders ⨝ customer ⨝ nation ⨝ region → revenue per
    * region-year): the canonical star-schema chain the view family's
    * J1–J6 don't cover in one plan. Revenue is the discounted price
    * Σ price·(1−disc), computed EXACTLY as integer 1/10000ths:
    * cents(price)·(100−pct(disc)) is an exact long for 2-dp inputs,
    * and the final double/10000 is one correctly-rounded IEEE op both
    * engines share — [[dsum]]'s argument one multiplication deeper.
    *
    * Plan at scale: lineitem→orders and orders→customer shuffle on
    * their keys (facts both); nation and region broadcast (true dims);
    * the rollup partial-aggregates to |regions × years| before its
    * exchange. Catalyst picks exactly this given the sizes — the spec
    * asserts the two broadcasts. */
  def qRegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val ord = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
    val nat = Tables(spark, dir, "nation")
    val reg = Tables(spark, dir, "region")
    val revUnits = (round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("o_year"))
      .agg((sum(revUnits).cast("double") / 10000.0).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val qRegionRevenueSql: String =
    """SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      |    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE)
      |    / 10000.0 AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2""".stripMargin

  /** WINSORIZATION — robust-scaling of a metric column: clip each
    * event's value to its type's exact [p1, p99] band (the outlier
    * treatment feature pipelines apply before normalization). The
    * per-type percentile table is |types| rows — broadcast back onto
    * the corpus, so clipping is map-only; the exact ordered statistic
    * sorts per group once (the q_quantiles posture; at petabyte scale
    * the same plan takes `approx_percentile`). Both engines share the
    * (1−d)·lo + d·hi interpolation, and min/max against the raw
    * double are value-preserving — output hashes bit-identically. */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val bounds = ev.groupBy(col("event_type").as("bt"))
      .agg(expr("percentile(value, 0.01)").as("p01"),
        expr("percentile(value, 0.99)").as("p99"))
    ev.join(broadcast(bounds), col("event_type") === col("bt"))
      .select(col("event_id"), col("event_type"), col("value"),
        least(greatest(col("value"), col("p01")), col("p99"))
          .as("clipped"),
        (col("value") < col("p01") || col("value") > col("p99"))
          .cast("int").as("was_clipped"))
  }

  val qWinsorizeSql: String =
    """WITH b AS (
      |  SELECT event_type AS bt,
      |    quantile_cont(value, 0.01) AS p01,
      |    quantile_cont(value, 0.99) AS p99
      |  FROM events GROUP BY 1)
      |SELECT event_id, event_type, value,
      |  least(greatest(value, p01), p99) AS clipped,
      |  CAST(value < p01 OR value > p99 AS INTEGER) AS was_clipped
      |FROM events JOIN b ON event_type = bt""".stripMargin

  /** A1 — scalar MIN aggregate used as the merge cutoff
    * (reference config.py:180-187). */
  def scalarMin(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders").agg(min(col("o_orderdate")).as("mindate"))

  val scalarMinSql: String =
    "SELECT MIN(o_orderdate) AS mindate FROM orders"
}
