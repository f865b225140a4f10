package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Association-rule mining over order baskets (support / confidence /
  * lift — the market-basket classic): for every ordered item pair
  * (a → c) whose UNORDERED pair support clears `minSupport`, emit the
  * rule with its exact integer-permille confidence and lift.
  *
  * This is frequent-itemset mining capped at size 2 — the size that
  * dominates production use (recommender candidate generation) and the
  * one with a clean distributed story:
  *
  *  - BASKETS: distinct (order, item) — one partial-agg dedup pass.
  *  - APRIORI PREFILTER: only items appearing in ≥ minSupport baskets
  *    can be in a frequent pair (monotonicity), so baskets are pruned
  *    to frequent items BEFORE the pair join. |frequent items| is
  *    bounded by Σ basket sizes / minSupport — broadcastable for any
  *    real support threshold, and the prune is what keeps the pair
  *    join's fan-out at Σ (pruned basket size)² rather than Σ basket².
  *  - PAIR COUNTS: the co-partitioned self-join on the order key
  *    ([[PageRank.coPurchaseEdges]]'s shape), partial-aggregated.
  *  - METRICS: each surviving pair joins item supports for both sides
  *    (a ≤|items|-row side — broadcast), then exact integer arithmetic:
  *    confidence = 1000·sup(a,c) div sup(a); lift = 1000·N·sup(a,c)
  *    div (sup(a)·sup(c)). All longs — 1000·N·sup stays far inside
  *    long range while N·sup < 9.2e15 (beyond that, move the product
  *    to decimal(38) — same plan, wider arithmetic).
  *
  * Everything after the basket dedup operates on pair/item AGGREGATES,
  * never raw lineitems — the event-volume collapse every 100 TB rollup
  * here relies on. */
object AssocRules {

  /** Pairs must co-occur in at least this many baskets. */
  val minSupport = 2L

  def assocRules(li: DataFrame, minSup: Long = minSupport): DataFrame = {
    val baskets = li.select(col("l_orderkey").as("ok"),
      col("l_partkey").as("item")).distinct()
    val itemSup = baskets.groupBy("item").agg(count(lit(1)).as("sup"))
    val frequent = itemSup.filter(col("sup") >= minSup)
    val pruned = baskets.join(
      broadcast(frequent.select(col("item"))), "item")
    val a = pruned.select(col("ok"), col("item").as("u"))
    val b = pruned.select(col("ok"), col("item").as("v"))
    val pairs = a.join(b, "ok").filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("sup_pair"))
      .filter(col("sup_pair") >= minSup)
    val rules = pairs.select(col("u").as("antecedent"),
        col("v").as("consequent"), col("sup_pair"))
      .unionAll(pairs.select(col("v").as("antecedent"),
        col("u").as("consequent"), col("sup_pair")))
    val n = baskets.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    rules
      .join(broadcast(itemSup.select(col("item").as("antecedent"),
        col("sup").as("sup_ante"))), "antecedent")
      .join(broadcast(itemSup.select(col("item").as("consequent"),
        col("sup").as("sup_cons"))), "consequent")
      .crossJoin(broadcast(n))
      .select(col("antecedent"), col("consequent"), col("sup_pair"),
        col("sup_ante"), col("sup_cons"),
        expr("1000 * sup_pair div sup_ante").as("confidence_permille"),
        expr("1000 * n_baskets * sup_pair div (sup_ante * sup_cons)")
          .as("lift_permille"))
  }

  def qAssocRules(spark: SparkSession, dir: String): DataFrame =
    assocRules(Tables(spark, dir, "lineitem"))

  val qAssocRulesSql: String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
       |item_sup AS (
       |  SELECT item, CAST(COUNT(*) AS BIGINT) AS sup
       |  FROM baskets GROUP BY item),
       |pruned AS (
       |  SELECT b.ok, b.item FROM baskets b
       |  JOIN item_sup s ON s.item = b.item AND s.sup >= $minSupport),
       |pairs AS (
       |  SELECT a.item AS u, b.item AS v, CAST(COUNT(*) AS BIGINT)
       |    AS sup_pair
       |  FROM pruned a JOIN pruned b
       |    ON a.ok = b.ok AND a.item < b.item
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $minSupport),
       |rules AS (
       |  SELECT u AS antecedent, v AS consequent, sup_pair FROM pairs
       |  UNION ALL
       |  SELECT v AS antecedent, u AS consequent, sup_pair FROM pairs),
       |n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_baskets
       |  FROM baskets)
       |SELECT r.antecedent, r.consequent, r.sup_pair,
       |  sa.sup AS sup_ante, sc.sup AS sup_cons,
       |  CAST(1000 * r.sup_pair // sa.sup AS BIGINT)
       |    AS confidence_permille,
       |  CAST(1000 * n.n_baskets * r.sup_pair // (sa.sup * sc.sup)
       |    AS BIGINT) AS lift_permille
       |FROM rules r
       |JOIN item_sup sa ON sa.item = r.antecedent
       |JOIN item_sup sc ON sc.item = r.consequent
       |CROSS JOIN n""".stripMargin
}
