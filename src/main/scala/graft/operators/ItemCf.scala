package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** ITEM-ITEM COLLABORATIVE FILTERING over order baskets — "customers
  * who bought X also bought Y", the classic co-occurrence recommender
  * (Linden et al. 2003, Amazon item-to-item CF; public semantics:
  * cosine over the item-basket incidence matrix).
  *
  * similarity(i,j) = co(i,j) / √(f(i)·f(j)) where co = baskets
  * containing both, f = baskets containing the item. Top-N per item by
  * (similarity desc, then key) with a support floor.
  *
  * Scale plan — the same candidate-generation discipline as the dedup
  * family: co-occurrence pairs are generated PER BASKET (join lineitem
  * to itself on l_orderkey after an in-basket DISTINCT), so work is
  * Σ basket² — basket size is business-bounded (tens), never
  * corpus-bounded; the precedent is [[PageRank.coPurchaseEdges]] and
  * [[Triangles]]' wedge budget. One pair-keyed partial agg collapses
  * duplicates as they stream; item frequencies are a second
  * node-keyed partial agg, joined onto the (much smaller) pair table
  * twice. The support floor (co ≥ 2) cuts the long noise tail BEFORE
  * the top-N window, and the per-item window rides the pair table
  * partitioned by item — never a global sort. In a production system
  * the per-basket DISTINCT also caps mega-baskets (docfreq-cap
  * precedent); the testdata's baskets are TPC-H-bounded (≤7 lines) so
  * no cap fires here.
  *
  * Determinism: co and f are exact longs; cosine is one double
  * division of exact values (√ of an exact integer product is
  * correctly rounded in both engines); rank ties break on the item
  * key, a total order. */
object ItemCf {

  val topN = 5
  val minSupport = 2

  /** Core: top-N most-similar items per item over a deduplicated
    * basket-incidence frame `basket(ok, item)`:
    * (item, rec, co, cosine, rank). */
  def itemCf(basketIn: DataFrame, n: Int = topN,
             minSup: Int = minSupport): DataFrame = {
    val basket = basketIn.select("ok", "item").distinct()
    val freq = basket.groupBy("item").agg(count(lit(1)).as("f"))
    scorePairs(supportPairs(basket, minSup), freq, n)
  }

  /** Unordered co-occurrence pairs (item < item2, co ≥ minSup) from a
    * deduplicated basket frame — generated once, mirrored only after
    * scoring (the mirror is a projection, not a recompute). */
  def supportPairs(basket: DataFrame,
                   minSup: Int = minSupport): DataFrame =
    basket.join(
        basket.select(col("ok"), col("item").as("item2")), "ok")
      .filter(col("item") < col("item2"))
      .groupBy(col("item"), col("item2"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minSup)

  /** Per-(session, dir) memoized support pair table over lineitem
    * baskets — shared by [[qItemCf]] and [[KCore.qKcore]], which
    * otherwise each pay the basket self-join independently in a
    * sweep. */
  def supportPairsMemo(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionCache.memoize(spark, "copairs", dir) {
      supportPairs(Tables(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
        .distinct()).localCheckpoint()
    }

  /** Score + rank a prepared unordered pair table against item
    * frequencies. */
  def scorePairs(pairs: DataFrame, freq: DataFrame,
                 n: Int = topN): DataFrame = {
    val scored = pairs
      .join(freq.select(col("item"), col("f").as("f1")), "item")
      .join(freq.select(col("item").as("item2"), col("f").as("f2")), "item2")
      .withColumn("cosine", col("co").cast(DoubleType) /
        sqrt((col("f1") * col("f2")).cast(DoubleType)))
      .select(col("item"), col("item2"), col("co"), col("cosine"))
    val sym = scored.unionAll(scored.select(col("item2").as("item"),
      col("item").as("item2"), col("co"), col("cosine")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("item2"))
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("item"), col("item2").as("rec"),
        col("co"), col("cosine"), col("rank").cast(LongType).as("rank"))
  }

  /** Driver query: top-5 co-purchase recommendations per part (pair
    * table shared with q_kcore via [[supportPairsMemo]]). */
  def qItemCf(spark: SparkSession, dir: String): DataFrame = {
    val basket = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct()
    val freq = basket.groupBy("item").agg(count(lit(1)).as("f"))
    scorePairs(supportPairsMemo(spark, dir), freq)
      .select(col("item").as("p_partkey"), col("rec").as("rec_partkey"),
        col("co"), col("cosine"), col("rank"))
  }

  val qItemCfSql: String =
    s"""WITH basket AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
       |freq AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS f
       |         FROM basket GROUP BY 1),
       |pairs AS (
       |  SELECT a.item AS item, b.item AS item2,
       |    CAST(COUNT(*) AS BIGINT) AS co
       |  FROM basket a JOIN basket b
       |    ON a.ok = b.ok AND a.item < b.item
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $minSupport),
       |scored AS (
       |  SELECT p.item, p.item2, p.co,
       |    CAST(p.co AS DOUBLE) / sqrt(CAST(f1.f * f2.f AS DOUBLE)) AS cosine
       |  FROM pairs p
       |  JOIN freq f1 ON p.item = f1.item
       |  JOIN freq f2 ON p.item2 = f2.item),
       |sym AS (
       |  SELECT item, item2, co, cosine FROM scored
       |  UNION ALL
       |  SELECT item2 AS item, item AS item2, co, cosine FROM scored),
       |ranked AS (
       |  SELECT item, item2, co, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY item
       |                       ORDER BY cosine DESC, item2) AS rank
       |  FROM sym)
       |SELECT item AS p_partkey, item2 AS rec_partkey, co, cosine,
       |  CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= $topN""".stripMargin
}
