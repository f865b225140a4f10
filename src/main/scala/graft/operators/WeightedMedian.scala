package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** EXACT WEIGHTED MEDIAN without a global sort — the weight-threshold
  * order statistic: the smallest value v such that the total WEIGHT at
  * or below v reaches half the corpus weight. The quantity-weighted
  * median price ("half the shipped units cost at most this"), the
  * duration-weighted median latency, the token-weighted median doc
  * score — whenever observations carry mass, the unweighted median
  * answers the wrong question and `percentile()` can't help.
  *
  * The COUNT-threshold selection plan
  * ([[graft.ext.CorpusOps.qScoreThreshold]]'s two-phase distributed
  * selection) generalizes verbatim — count is just weight ≡ 1:
  *
  *  1. one partial-agg scan: min/max → ≤[[wmBuckets]] coarse value
  *     buckets; per-bucket WEIGHT sums → driver (≤wmBuckets rows,
  *     the bounded-metadata posture);
  *  2. the driver's cumulative scan finds the single bucket where the
  *     running weight crosses T = ⌈W/2⌉ — exact integer arithmetic,
  *     no floats anywhere;
  *  3. within that ONE bucket (its distinct values bounded by the
  *     bucket's integer width), a per-value weight agg + a window
  *     ordered by value — partitioned to the crossing bucket only,
  *     never global — locates the exact crossing value.
  *
  * Two partial-agg scans + one bounded window; driver state ≤wmBuckets
  * longs. The ORACLE is the definition replayed with a global
  * cumulative-sum window — the formulation this plan exists to avoid
  * running at scale, which is exactly what makes it an independent
  * cross-check. */
object WeightedMedian {

  val wmBuckets = 4096L

  /** Weighted median of `vw(v, w)` (both long, w > 0): one row
    * (median_v, total_w, cum_at_median). */
  def weightedMedian(vw: DataFrame): DataFrame = {
    val spark = vw.sparkSession
    val stats = vw.agg(min(col("v")), max(col("v")), sum(col("w"))).head
    val (mn, mx, tw) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val width = math.max(1L, (mx - mn) / wmBuckets + 1)
    val bw = vw.withColumn("bucket", expr(s"(v - $mn) div $width"))
    val hist = bw.groupBy("bucket").agg(sum(col("w")).as("bw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val target = (tw + 1) / 2 // ⌈W/2⌉ in integer arithmetic
    // driver cumulative over ≤wmBuckets rows: the crossing bucket and
    // the weight mass strictly below it
    var below = 0L
    val crossing = hist.find { case (_, w) =>
      if (below + w >= target) true else { below += w; false }
    }.get._1
    val inBucket = bw.filter(col("bucket") === crossing)
      .groupBy("v").agg(sum(col("w")).as("vw"))
    val wdw = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inBucket
      .withColumn("cum", sum(col("vw")).over(wdw) + lit(below))
      .filter(col("cum") >= target)
      .orderBy("v").limit(1)
      .select(col("v").as("median_v"), lit(tw).as("total_w"),
        col("cum").as("cum_at_median"))
  }

  /** Driver query: the quantity-weighted median extended price of all
    * line items, in exact cents. */
  def qWeightedMedian(spark: SparkSession, dir: String): DataFrame =
    weightedMedian(Tables(spark, dir, "lineitem").select(
      round(col("l_extendedprice") * 100).cast("long").as("v"),
      col("l_quantity").cast("long").as("w")))

  /** Definition replay: global cumulative weight over value order.
    * FLOOR is explicit on the weight (round-16 edge-corpus find):
    * Spark's double→BIGINT cast truncates toward zero while DuckDB's
    * ROUNDS — a fractional quantity (23.999) split the two engines'
    * total weight by 1 until the truncation was written out. FLOOR,
    * not TRUNC: quantities are non-negative (where the two agree) and
    * FLOOR is 1-arg on BOTH engines — Spark's trunc is the 2-arg DATE
    * function, which broke the specs that replay this text on Spark. */
  val qWeightedMedianSql: String =
    """WITH vw AS (
      |  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
      |         CAST(FLOOR(l_quantity) AS BIGINT) AS w
      |  FROM lineitem),
      |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM vw),
      |per AS (SELECT v, CAST(SUM(w) AS BIGINT) AS vw FROM vw GROUP BY 1),
      |cum AS (
      |  SELECT v, CAST(SUM(vw) OVER (ORDER BY v
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM per)
      |SELECT c.v AS median_v, t.tw AS total_w, c.cum AS cum_at_median
      |FROM cum c, tot t
      |WHERE c.cum >= (t.tw + 1) // 2
      |ORDER BY c.v LIMIT 1""".stripMargin
}
