package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** DATA-QUALITY PROFILING — the observability layer a config-driven
  * ingest pipeline needs before it trusts arriving data. The reference's
  * clean stage (config.py:131-148) embodies a *posture* toward messy
  * input — prune, coerce, normalize, never crash — but it measures
  * nothing; a 100 TB pipeline needs the measurements too, both to
  * alarm on upstream drift and to pick physical strategies (a skewed
  * join key needs salting; a near-unique column is a dedup candidate).
  *
  * Three operators, one design rule: every statistic is assembled from
  * EXACT integer counts (or exact element selection like min/max) in
  * one or two partial-agg scans, and only the final presentation step
  * divides into a double — the engine's float-determinism posture, so
  * the driver gate hash-compares every row against DuckDB.
  *
  *  - [[qDqProfile]]: per-column completeness / distinct / min / max in
  *    ONE scan (multi-distinct lowers to a single Expand pass; column
  *    count is schema-bounded, so the k× expansion is a constant
  *    factor, not a scale risk). At 100 TB the exact
  *    `count(distinct)` would swap for the KMV sketch already in the
  *    engine ([[graft.ext.Similarity]] bottom-k) — the scan shape is
  *    identical; exact is kept here because the driver gate
  *    hash-compares and the expand factor is the benign cost.
  *  - [[qBenford]]: first-significant-digit mix vs Benford's law,
  *    scored with the same G-test the categorical drift monitor uses
  *    ([[MixDrift]], Dunning 1993) — the classic anomaly/fraud signal
  *    for amount columns. Digit extraction is pure integer/string
  *    work (no log10 on data values); the expected share ln((d+1)/d)
  *    / ln 10 evaluates on exact small-integer ratios.
  *  - [[qDqRules]]: declarative constraint checking (Deequ-style) —
  *    domain, range, referential integrity, key uniqueness, and a
  *    cross-table temporal rule — each one conditional-sum over a
  *    scan (the RI rule is a key-keyed anti-join), unioned into one
  *    (rule, checked, violations) report. NULL never silently passes:
  *    a row violates when the predicate is not definitely true.
  */
object DataQuality {

  private case class ProfCol(name: String, numExpr: Column => Column,
                             isString: Boolean)

  /** Per-column profile of `orders`: row count, nulls, exact distinct,
    * min/max (numeric-ish columns on a shared double axis — timestamps
    * via epoch micros, exact in a double's 53-bit mantissa until the
    * year ~2255; string columns on a string axis). */
  def qDqProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val cols = Seq(
      ProfCol("o_orderkey", c => c.cast(DoubleType), isString = false),
      ProfCol("o_custkey", c => c.cast(DoubleType), isString = false),
      ProfCol("o_orderstatus", identity, isString = true),
      ProfCol("o_totalprice", c => c.cast(DoubleType), isString = false),
      ProfCol("o_orderdate", c => unix_micros(c).cast(DoubleType),
        isString = false),
      ProfCol("o_orderpriority", identity, isString = true))
    // one wide agg row: ONE scan (multi-distinct → a single Expand);
    // the per-column report rows are carved out of it driver-free via
    // an inline stack over the already-aggregated scalars.
    val aggs: Seq[Column] = Seq(count(lit(1)).as("n_rows")) ++
      cols.flatMap { pc =>
        val c = col(pc.name)
        Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"null_${pc.name}"),
          countDistinct(c).as(s"dist_${pc.name}")) ++
          (if (pc.isString)
            Seq(min(c).as(s"mins_${pc.name}"), max(c).as(s"maxs_${pc.name}"))
          else
            Seq(min(pc.numExpr(c)).as(s"minn_${pc.name}"),
              max(pc.numExpr(c)).as(s"maxn_${pc.name}")))
      }
    val wide = o.agg(aggs.head, aggs.tail: _*)
    val arms = cols.map { pc =>
      val minN = if (pc.isString) "CAST(NULL AS DOUBLE)" else s"minn_${pc.name}"
      val maxN = if (pc.isString) "CAST(NULL AS DOUBLE)" else s"maxn_${pc.name}"
      val minS = if (pc.isString) s"mins_${pc.name}" else "CAST(NULL AS STRING)"
      val maxS = if (pc.isString) s"maxs_${pc.name}" else "CAST(NULL AS STRING)"
      s"'${pc.name}', n_rows, null_${pc.name}, dist_${pc.name}, " +
        s"$minN, $maxN, $minS, $maxS"
    }
    wide.selectExpr(
      s"stack(${cols.length}, ${arms.mkString(", ")})")
      .toDF("col_name", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str")
  }

  val qDqProfileSql: String = {
    val cols = Seq(
      ("o_orderkey", "num"), ("o_custkey", "num"), ("o_orderstatus", "str"),
      ("o_totalprice", "num"), ("o_orderdate", "ts"),
      ("o_orderpriority", "str"))
    val arms = cols.map { case (c, kind) =>
      val (minN, maxN, minS, maxS) = kind match {
        case "num" => (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        case "ts" => (s"CAST(MIN(epoch_us($c)) AS DOUBLE)",
          s"CAST(MAX(epoch_us($c)) AS DOUBLE)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
          s"MIN($c)", s"MAX($c)")
      }
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  $minN AS min_num, $maxN AS max_num,
         |  $minS AS min_str, $maxS AS max_str
         |FROM orders""".stripMargin
    }
    arms.mkString("\nUNION ALL\n")
  }

  /** First-significant-digit Benford test on o_totalprice: per digit
    * (1-9) the observed count, observed and expected shares, the
    * corpus G statistic (same on every row — a window sum over the
    * 9-row rollup) and the χ²(df=8)@1% alarm (20.09). Digit comes from
    * the decimal rendering of floor(price) — integer/string work only,
    * no log10 on data. One partial-agg scan to 9 rows. */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders").filter(col("o_totalprice") >= 1.0)
    // explicit floor on both engines: a bare CAST(double AS BIGINT)
    // truncates in Spark but rounds in DuckDB — boundary prices flip digit
    val digits = o.select(
      substring(floor(col("o_totalprice")).cast(LongType).cast(StringType),
        1, 1).cast(IntegerType).as("digit"))
    val obs = digits.groupBy("digit").agg(count(lit(1)).as("o"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)) // 9-row rollup: a single-partition window is free
    obs
      .withColumn("n", sum(col("o")).over(w))
      .withColumn("exp_p",
        log((col("digit") + 1).cast(DoubleType) / col("digit").cast(DoubleType))
          / log(lit(10.0)))
      .withColumn("obs_p", col("o").cast(DoubleType) / col("n").cast(DoubleType))
      .withColumn("term",
        col("o").cast(DoubleType) *
          log(col("o").cast(DoubleType) /
            (col("n").cast(DoubleType) * col("exp_p"))))
      .withColumn("g", sum(col("term")).over(w) * 2.0)
      .withColumn("drifted", (col("g") > 20.09).cast(IntegerType))
      .select("digit", "o", "n", "exp_p", "obs_p", "g", "drifted")
  }

  val qBenfordSql: String =
    """WITH obs AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
      |             AS VARCHAR), 1, 1) AS INTEGER) AS digit,
      |    CAST(COUNT(*) AS BIGINT) AS o
      |  FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1),
      |wide AS (
      |  SELECT digit, o, CAST(SUM(o) OVER () AS BIGINT) AS n,
      |    ln(CAST(digit + 1 AS DOUBLE) / CAST(digit AS DOUBLE)) / ln(10.0)
      |      AS exp_p
      |  FROM obs),
      |terms AS (
      |  SELECT digit, o, n, exp_p,
      |    CAST(o AS DOUBLE) / CAST(n AS DOUBLE) AS obs_p,
      |    CAST(o AS DOUBLE)
      |      * ln(CAST(o AS DOUBLE) / (CAST(n AS DOUBLE) * exp_p)) AS term
      |  FROM wide)
      |SELECT digit, o, n, exp_p, obs_p, SUM(term) OVER () * 2.0 AS g,
      |  CAST(SUM(term) OVER () * 2.0 > 20.09 AS INTEGER) AS drifted
      |FROM terms""".stripMargin

  /** Declarative constraint report: (rule, checked, violations,
    * viol_frac). A row VIOLATES a rule when its predicate is not
    * definitely true (NULL counts as a violation — the posture that
    * catches both bad values and unexpected missingness). Six rules
    * spanning range, domain, positivity, cross-table temporal order,
    * referential integrity, and key uniqueness. Each rule is one
    * conditional partial-agg scan; the RI rule is a key-keyed
    * anti-join; at 100 TB they run as independent map-side passes
    * (and the single-table ones share one scan if fused — kept
    * separate here for per-rule clarity). */
  def qDqRules(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")

    def ruleAgg(name: String, df: DataFrame, pred: Column): DataFrame =
      df.agg(count(lit(1)).as("checked"),
          sum(when(pred, 0L).otherwise(1L)).as("violations"))
        .select(lit(name).as("rule"), col("checked"), col("violations"))

    val qtyRange = ruleAgg("l_quantity_in_1_50", li,
      col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0)
    val flagDomain = ruleAgg("l_returnflag_domain", li,
      col("l_returnflag").isin("A", "N", "R"))
    val pricePos = ruleAgg("o_totalprice_positive", o,
      col("o_totalprice") > 0.0)
    val discRange = ruleAgg("l_discount_in_0_1", li,
      col("l_discount") >= 0.0 && col("l_discount") <= 1.0)
    // temporal: every shipment at/after its order date (inner join —
    // orphans are r6's business, not this rule's)
    val shipAfter = ruleAgg("l_ship_after_order",
      li.select("l_orderkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey")),
      col("l_shipdate") >= col("o_orderdate"))
    // referential integrity: lineitem rows whose order key has no
    // orders row; checked = all lineitem rows
    val nLi = li.agg(count(lit(1)).as("checked"))
    val orphans = li.select("l_orderkey")
      .join(o.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val ri = nLi.crossJoin(orphans)
      .select(lit("l_orderkey_in_orders").as("rule"),
        col("checked"), col("violations"))
    // key uniqueness: duplicate-mass of o_orderkey
    val pk = o.agg(count(lit(1)).as("checked"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("violations"))
      .select(lit("o_orderkey_unique").as("rule"),
        col("checked"), col("violations"))

    Seq(qtyRange, flagDomain, pricePos, discRange, shipAfter, ri, pk)
      .reduce(_ unionAll _)
      .withColumn("viol_frac",
        col("violations").cast(DoubleType) / col("checked").cast(DoubleType))
  }

  val qDqRulesSql: String =
    """WITH r AS (
      |  SELECT 'l_quantity_in_1_50' AS rule, COUNT(*) AS checked,
      |    SUM(CASE WHEN l_quantity >= 1.0 AND l_quantity <= 50.0
      |        THEN 0 ELSE 1 END) AS violations
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_returnflag_domain', COUNT(*),
      |    SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'o_totalprice_positive', COUNT(*),
      |    SUM(CASE WHEN o_totalprice > 0.0 THEN 0 ELSE 1 END)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'l_discount_in_0_1', COUNT(*),
      |    SUM(CASE WHEN l_discount >= 0.0 AND l_discount <= 1.0
      |        THEN 0 ELSE 1 END)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_ship_after_order', COUNT(*),
      |    SUM(CASE WHEN l_shipdate >= o_orderdate THEN 0 ELSE 1 END)
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  UNION ALL
      |  SELECT 'l_orderkey_in_orders',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem li
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                       WHERE o.o_orderkey = li.l_orderkey))
      |  UNION ALL
      |  SELECT 'o_orderkey_unique', COUNT(*),
      |    COUNT(*) - COUNT(DISTINCT o_orderkey)
      |  FROM orders)
      |SELECT rule, CAST(checked AS BIGINT) AS checked,
      |  CAST(violations AS BIGINT) AS violations,
      |  CAST(violations AS DOUBLE) / CAST(checked AS DOUBLE) AS viol_frac
      |FROM r""".stripMargin

  /** JOIN-KEY SKEW PROFILE — the statistics a physical planner (or the
    * engineer choosing between plain shuffle, AQE skew split, and
    * explicit salting — [[Salting]]) needs about each candidate join
    * key: cardinality, max key frequency, the heaviest key's share of
    * all rows, and the Herfindahl concentration index Σc²/(Σc)² (= the
    * probability two random rows collide on the key; 1/n_keys when
    * uniform, →1 when one key dominates). Two-phase: the per-key count
    * (one partial-agg shuffle keyed by the column), then a bounded agg
    * OVER THE COUNT TABLE (|keys| rows, never the corpus). All inputs
    * to the doubles are exact longs. */
  def qSkewProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    def arm(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key)).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_cnt"),
          sum(col("c") * col("c")).as("sum_c2"))
        .select(lit(key).as("key_col"), col("n_keys"), col("n_rows"),
          col("max_cnt"),
          (col("max_cnt").cast(DoubleType) / col("n_rows").cast(DoubleType))
            .as("top1_share"),
          (col("sum_c2").cast(DoubleType) /
            (col("n_rows").cast(DoubleType) * col("n_rows").cast(DoubleType)))
            .as("hhi"))
    Seq(arm(li, "l_orderkey"), arm(li, "l_partkey"), arm(li, "l_suppkey"),
      arm(o, "o_custkey")).reduce(_ unionAll _)
  }

  val qSkewProfileSql: String = {
    def arm(table: String, key: String): String =
      s"""SELECT '$key' AS key_col, COUNT(*) AS n_keys,
         |  CAST(SUM(c) AS BIGINT) AS n_rows, CAST(MAX(c) AS BIGINT) AS max_cnt,
         |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top1_share,
         |  CAST(SUM(c * c) AS DOUBLE)
         |    / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS hhi
         |FROM (SELECT $key, CAST(COUNT(*) AS BIGINT) AS c FROM $table
         |      GROUP BY 1)""".stripMargin
    Seq(arm("lineitem", "l_orderkey"), arm("lineitem", "l_partkey"),
      arm("lineitem", "l_suppkey"), arm("orders", "o_custkey"))
      .mkString("\nUNION ALL\n")
  }
}
