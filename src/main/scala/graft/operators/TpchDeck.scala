package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** CLASSIC DECISION-SUPPORT DECK — the canonical TPC-H query shapes the
  * reference's relational layer delegates wholesale to its warehouse
  * (reference `settings.yaml:24-140` keeps every SELECT as SQL-in-YAML;
  * `config.py:200-245` just ships the text to BigQuery). A replacement
  * engine must prove it runs the decision-support shapes that layer
  * would also be handed: correlated scalar subqueries, EXISTS / NOT
  * EXISTS anti-semantics, IN / NOT IN subquery decorrelation, HAVING
  * over grouped aggregates, and 4-6-table multi-fact join chains.
  *
  * POSTURE. Each query is ONE ANSI SQL string (adapted to the driver
  * testdata's TPC-H-lite schema — no partsupp, no commit/receipt dates;
  * FIXTURES.md maps the roles) that runs UNCHANGED on both engines:
  * Spark executes it over [[graft.Tables.registerAll]] temp views, the
  * DuckDB oracle executes the identical text — the
  * `q_view_transactions_scaled` convention, so the thing under test is
  * Catalyst's planning of the declared shape, not a hand translation.
  * The engine side is deliberately SQL-first here: decorrelation
  * (RewriteCorrelatedScalarSubquery, RewritePredicateSubquery) is
  * exactly the machinery a warehouse replacement must exercise, and
  * TpchDeckSpec pins the outcome — no BroadcastNestedLoopJoin, no
  * CartesianProduct anywhere in any optimized plan, subqueries
  * included.
  *
  * DETERMINISM. Money aggregates ride the exact-cents convention
  * ([[Aggregates.dsum]]'s SQL form): round(x·100) is an exact long for
  * 2-dp inputs, long addition is associative (any partitioning gives
  * the same sum), and the final double division is one IEEE op both
  * engines perform identically. revenue = Σ price_c·(100−disc_c) stays
  * in exact integer 1e-4 units until a single closing divide. Every
  * ORDER BY under a LIMIT carries a full key tie-break. Q17's
  * `0.2·AVG(l_quantity)` is portable because quantities are
  * integer-valued doubles: their sum is exact in ANY accumulation
  * order (< 2^53), so avg and the comparison are bit-identical across
  * engines.
  *
  * SCALE (the 100 TB read):
  *  - dims (region/nation/supplier/customer vs facts) broadcast; the
  *    fact-fact joins (lineitem⋈orders) hash-partition on the join key
  *    — at 1000 executors that is one co-partitioned shuffle, and AQE
  *    re-plans the build side when a filtered fact collapses;
  *  - every predicate here is scan-pushable (dates, flags, segments) —
  *    plans show PushedFilters at the parquet scan, so the 100 TB scan
  *    reads the filtered fraction;
  *  - Q11/Q15/Q22's scalar subqueries are one extra bounded-output
  *    aggregate pass each (a scalar or a |suppliers|-row table), never
  *    a per-row rescan; Q17/Q02's correlated aggregates decorrelate to
  *    ONE grouped aggregate over the filtered fact joined back
  *    equi-keyed;
  *  - Q21's EXISTS/NOT EXISTS pair becomes two semi/anti hash joins on
  *    l_orderkey against the self-fact — shuffle-bounded, no n² probe.
  *  - Q11's share threshold is scale-FREE (value > 2× the mean part
  *    value) rather than TPC-H's SF-pinned fraction, so the row count
  *    survives any corpus size instead of emptying as parts multiply.
  */
object TpchDeck {

  /** Exact revenue term in 1e-4 units: price cents × (100 − discount
    * cents), BIGINT throughout — associative, partition-order-proof. */
  private val rev =
    "CAST(ROUND(l_extendedprice*100) AS BIGINT) * " +
      "(100 - CAST(ROUND(l_discount*100) AS BIGINT))"

  /** name → the ONE SQL text both engines run (ListMap: stable order
    * for specs/docs). */
  val sql: ListMap[String, String] = ListMap(
    // Q2 shape: correlated scalar MIN with equality — cheapest shipped
    // price per part, the minimum-cost-supplier selection.
    "q_tpch_q02" ->
      """SELECT DISTINCT p_partkey, p_name, s_name, l_extendedprice AS min_price
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE p_size = 11
        |  AND l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice)
        |    FROM lineitem l2
        |    WHERE l2.l_partkey = p_partkey)
        |ORDER BY p_partkey, s_name""".stripMargin,

    // Q3 shape: 3-table fact chain + grouped revenue + top-k.
    "q_tpch_q03" ->
      s"""SELECT l_orderkey,
         |  CAST(SUM($rev) AS DOUBLE)/10000.0 AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-06-01'
         |  AND l_shipdate > TIMESTAMP '1997-06-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,

    // Q4 shape: EXISTS semi-join (orders with a late-shipping line).
    "q_tpch_q04" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > TIMESTAMP '1997-04-01')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // Q5 shape: 6-table chain with the same-nation fact⋈dim⋈dim spine.
    "q_tpch_q05" ->
      s"""SELECT n_name,
         |  CAST(SUM($rev) AS DOUBLE)/10000.0 AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    // Q7 shape: dual-aliased dimension (nation × 2) + disjunctive
    // nation-pair predicate + per-year rollup.
    "q_tpch_q07" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(SUM(vol_e4) AS DOUBLE)/10000.0 AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
         |    $rev AS vol_e4
         |  FROM supplier
         |  JOIN lineitem ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |    AND l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1998-01-01'
         |) shipping
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    // Q10 shape: returned-item revenue per customer, top-20.
    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(SUM($rev) AS DOUBLE)/10000.0 AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-07-01'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    // Q11 shape: HAVING over a grouped aggregate against an
    // uncorrelated scalar subquery (scale-free 2×-mean threshold).
    "q_tpch_q11" ->
      s"""SELECT l_partkey,
         |  CAST(SUM($rev) AS DOUBLE)/10000.0 AS part_value
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_7'
         |GROUP BY l_partkey
         |HAVING SUM($rev) > (
         |  SELECT 2.0 * SUM($rev) / COUNT(DISTINCT l_partkey)
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_7')
         |ORDER BY part_value DESC, l_partkey""".stripMargin,

    // Q15 shape: CTE revenue view + scalar MAX equality (all ties kept,
    // so the exact-integer total makes the result set deterministic).
    "q_tpch_q15" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    SUM($rev) AS total_e4
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-07-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name,
         |  CAST(total_e4 AS DOUBLE)/10000.0 AS total_revenue
         |FROM supplier
         |JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_e4 = (SELECT MAX(total_e4) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,

    // Q16 shape: NOT IN subquery (null-aware anti join — Catalyst
    // plans the single-column form as a broadcast NAAJ hash join, and
    // TpchDeckSpec asserts the nested-loop fallback never appears) +
    // COUNT(DISTINCT) over a dim⋈fact association.
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#3'
        |  AND p_type NOT LIKE 'SMALL%'
        |  AND p_size IN (1, 5, 11, 28, 37)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // Q17 shape: correlated scalar AVG — decorrelates to ONE grouped
    // aggregate joined back on partkey. Portable floating compare: see
    // the object scaladoc (integer-valued quantities ⇒ exact sums).
    "q_tpch_q17" ->
      """SELECT CAST(SUM(CAST(ROUND(l1.l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0/7.0 AS avg_yearly
        |FROM lineitem l1
        |JOIN part ON p_partkey = l1.l_partkey
        |WHERE p_brand = 'Brand#5'
        |  AND p_type = 'ECONOMY'
        |  AND l1.l_quantity < (
        |    SELECT 0.2 * AVG(l2.l_quantity)
        |    FROM lineitem l2
        |    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,

    // Q18 shape: IN-subquery over a HAVING'd grouped fact (large-volume
    // orders) re-joined through customer.
    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(l_quantity) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    // Q20 shape: nested IN subqueries (suppliers of 'small%' parts
    // with above-threshold shipped volume) under a dim filter.
    "q_tpch_q20" ->
      """SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_3', 'NATION_4', 'NATION_5', 'NATION_6')
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (
        |        SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |      AND l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1998-01-01'
        |    GROUP BY l_suppkey
        |    HAVING SUM(l_quantity) > 400)
        |ORDER BY s_name""".stripMargin,

    // Q21 shape: EXISTS + NOT EXISTS against the same fact — the sole
    // 'R'-flagged supplier on multi-supplier finished orders
    // (returnflag stands in for the missing commit/receipt dates).
    "q_tpch_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 25""".stripMargin,

    // Q6 shape: single-table filtered aggregate — every predicate
    // lands in PushedFilters at the scan; at 100 TB the scan reads
    // the date/discount/quantity-filtered fraction only.
    "q_tpch_q06" ->
      """SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |  * CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    // Q8 shape: 9-relation chain (nation/region dual-aliased) + CASE
    // market-share ratio. Share = exact-integer sums entering ONE
    // double division.
    "q_tpch_q08" ->
      s"""SELECT o_year,
         |  CAST(SUM(CASE WHEN supp_region = 'ASIA' THEN vol_e4 ELSE 0 END) AS DOUBLE)
         |    / CAST(SUM(vol_e4) AS DOUBLE) AS mkt_share
         |FROM (
         |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         |    $rev AS vol_e4, r2.r_name AS supp_region
         |  FROM part
         |  JOIN lineitem ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
         |  WHERE r1.r_name = 'EUROPE' AND p_type = 'ECONOMY'
         |) allsales
         |GROUP BY o_year
         |ORDER BY o_year""".stripMargin,

    // Q9 shape: profit rollup by nation × year under a part-name LIKE
    // (non-sargable contains — evaluated post-scan on the pruned
    // column set).
    "q_tpch_q09" ->
      s"""SELECT n_name, o_year,
         |  CAST(SUM(vol_e4) AS DOUBLE)/10000.0 AS profit
         |FROM (
         |  SELECT n_name,
         |    CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         |    $rev AS vol_e4
         |  FROM part
         |  JOIN lineitem ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%gear%'
         |) profit
         |GROUP BY n_name, o_year
         |ORDER BY n_name, o_year DESC""".stripMargin,

    // Q12 shape: two-way CASE counts over a fact-fact join.
    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |        OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
        |        AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_quantity >= 30
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // Q13 shape: LEFT OUTER join with an extra join-side predicate +
    // count-of-counts distribution (customers with zero qualifying
    // orders MUST survive as c_count = 0).
    "q_tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // Q14 shape: CASE-numerator revenue share, one join, one month.
    "q_tpch_q14" ->
      s"""SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0 END) AS DOUBLE)
         |  * 100.0 / CAST(SUM($rev) AS DOUBLE) AS promo_revenue
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
         |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,

    // Q19 shape: disjunctive OR-of-ANDs predicate spanning both join
    // sides — the join-condition-pushdown stress case (each disjunct
    // constrains part AND lineitem attributes).
    "q_tpch_q19" ->
      s"""SELECT CAST(SUM($rev) AS DOUBLE)/10000.0 AS revenue
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity >= 1 AND l_quantity <= 21)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity >= 10 AND l_quantity <= 30)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity >= 20 AND l_quantity <= 40)""".stripMargin,

    // LATERAL shape: correlated top-k-per-group subquery in FROM —
    // the modern decision-support idiom for "best N orders per
    // customer". Catalyst decorrelates the correlated ORDER BY+LIMIT
    // lateral into window machinery / a domain join — TpchDeckSpec
    // asserts the nested-loop fallback never survives.
    "q_tpch_lateral" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        |) best
        |WHERE c_mktsegment = 'MACHINERY' AND c_custkey < 300
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    // Set-op shape: INTERSECT / EXCEPT cohort algebra (retained vs
    // churned 1997 buyers) — planned as semi/anti hash joins over the
    // distinct key sets.
    "q_tpch_setops" ->
      """SELECT 'both' AS cohort, CAST(COUNT(*) AS BIGINT) AS n_cust FROM (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |  INTERSECT
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |    AND o_orderdate < TIMESTAMP '1999-01-01')
        |UNION ALL
        |SELECT 'churned' AS cohort, CAST(COUNT(*) AS BIGINT) AS n_cust FROM (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |  EXCEPT
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |    AND o_orderdate < TIMESTAMP '1999-01-01')
        |ORDER BY cohort""".stripMargin,

    // Q22 shape: uncorrelated scalar subquery (exact-cents mean) +
    // NOT EXISTS with a windowed predicate (no recent orders).
    "q_tpch_q22" ->
      """SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0 AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-06-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
  )

  // ───────── Round-16: manual runtime filters on the two fact-fact
  // shapes whose probe side grows with the corpus ─────────
  //
  // Q18 and Q21 were the deck's worst 100× slopes (7.65× / the q21
  // self-fact pair): their semi/anti probe sides are the FULL lineitem
  // fact, shuffled wholesale even though only the rows whose orderkey
  // survives a highly selective build side can ever match. Catalyst's
  // own InjectRuntimeFilter declines both (the creation side is an
  // Aggregate for Q18, a filtered self-fact for Q21 — neither passes
  // the injection's creation-side gates), so this is exactly
  // [[BloomProbe.bloomJoin]]'s documented escape hatch applied by hand.
  // The ORACLE text above is unchanged — the bloom ONLY PRUNES rows
  // the exact join/semi/anti after it would drop anyway (one-sided
  // contract: no false negatives, and a false-positive row either
  // matches the exact key set, in which case it was legitimate, or
  // doesn't, in which case the equi-condition kills it) — so the
  // result is row-for-row the shared SQL's, which the driver gate
  // hash-certifies.

  /** Q18, runtime-filtered: the HAVING'd qualifying-order key set is
    * computed ONCE (one map-side-combine pass over lineitem — the
    * unavoidable scan), localCheckpointed (it is tiny: orders over 300
    * total qty), and a 0.1%-FP bloom over it prunes BOTH fact scans
    * before any shuffle. At 100 TB: the old plan shuffled every
    * lineitem row into the o_orderkey join; this plan shuffles only
    * the ~qualifying fraction (+0.1% passengers), and the exact
    * semi-join against the materialized key set removes those. Keys +
    * bloom are memoized per (session, dir) — the [[PageRank
    * .coPurchaseEdgesMemo]] artifact posture. */
  def q18RuntimeFiltered(spark: SparkSession, dir: String): DataFrame = {
    val (keys, bloom) = graft.util.SessionCache.memoize(
      spark, "tpch-q18-rf", dir) {
      val qual = graft.Tables(spark, dir, "lineitem")
        .groupBy(col("l_orderkey").as("qk"))
        .agg(sum("l_quantity").as("qsum"))
        .filter(col("qsum") > 300).select("qk")
        .localCheckpoint()
      val n = qual.count()
      (qual, BloomProbe.buildFilter(qual, "qk",
        expectedKeys = math.max(n, 1L), fpRate = 0.001))
    }
    val liRf = graft.Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .filter(BloomProbe.mightContain(bloom, col("l_orderkey")))
    val ordRf = graft.Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .filter(BloomProbe.mightContain(bloom, col("o_orderkey")))
      // exact semi-join drops the bloom's ~0.1% false passengers
      .join(keys, col("o_orderkey") === col("qk"), "left_semi")
    graft.Tables(spark, dir, "customer").select("c_custkey", "c_name")
      .join(ordRf, col("c_custkey") === col("o_custkey"))
      .join(liRf, col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice")
      .agg((sum(round(col("l_quantity") * 100).cast("long")).cast("double")
        / 100.0).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q21, runtime-filtered: the EXISTS/NOT-EXISTS pair probes the
    * self-fact (l2/l3) with the FULL lineitem; only rows sharing an
    * orderkey with an 'R'-flagged line on a finished order can ever
    * match, so a bloom over that key set (bounded by |orders|) prunes
    * both probe scans map-side. Pruning a semi/anti join's PROBE side
    * to a superset of the matchable keys is exact: a dropped row
    * matches no build row by the equi-condition, so it contributed
    * nothing to either the semi's keeps or the anti's kills. */
  def q21RuntimeFiltered(spark: SparkSession, dir: String): DataFrame = {
    val bloom = graft.util.SessionCache.memoize(
      spark, "tpch-q21-rf", dir) {
      val k1 = graft.Tables(spark, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(graft.Tables(spark, dir, "orders")
          .filter(col("o_orderstatus") === "F").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select(col("l_orderkey").as("k1")).distinct()
        .localCheckpoint()
      BloomProbe.buildFilter(k1, "k1",
        expectedKeys = math.max(k1.count(), 1L), fpRate = 0.001)
    }
    val li = graft.Tables(spark, dir, "lineitem")
    val base = graft.Tables(spark, dir, "supplier")
      .select("s_suppkey", "s_name")
      .join(li.filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_suppkey"),
        col("s_suppkey") === col("l_suppkey"))
      .join(graft.Tables(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderkey"),
        col("o_orderkey") === col("l_orderkey"))
    val l2 = li.select(col("l_orderkey").as("k2"),
        col("l_suppkey").as("sk2"))
      .filter(BloomProbe.mightContain(bloom, col("k2")))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("sk3"))
      .filter(BloomProbe.mightContain(bloom, col("k3")))
    base
      .join(l2, col("l_orderkey") === col("k2") &&
        col("sk2") =!= col("l_suppkey"), "left_semi")
      .join(l3, col("l_orderkey") === col("k3") &&
        col("sk3") =!= col("l_suppkey"), "left_anti")
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(25)
  }

  /** Engine-side overrides: same rows as the shared text (the oracle
    * still runs [[sql]]'s string), different physical plan. */
  // Measured at 100× (ScaleCheck, one host window): q18 7.65× → 2.94×.
  // q21's RF reads 9.79× vs plain 6.44× — but in ABSOLUTE wall the RF
  // wins at both scales (1.24 s vs 2.20 s at 1×, 12.1 s vs 14.2 s at
  // 100×); the ratio optics flip only because the bloom saves
  // proportionally more on the small corpus. Ratios compare a query to
  // itself, so a small-side speedup inflates them — absolute wall at
  // the big scale is the number that matters, and both RFs lower it.
  val rfQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q18" -> (q18RuntimeFiltered _),
    "q_tpch_q21" -> (q21RuntimeFiltered _))

  /** SparkEntry-shaped runners: register the dir's tables, run the
    * shared text — except the two runtime-filtered shapes, which run
    * the hand-pruned plan against the unchanged oracle text. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sql.map { case (name, text) =>
      name -> ((s: SparkSession, dir: String) => {
        graft.Tables.registerAll(s, dir)
        s.sql(text)
      })
    } ++ rfQueries
}
