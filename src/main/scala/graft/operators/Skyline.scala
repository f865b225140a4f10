package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** 2-D SKYLINE (Pareto frontier) — the customers nobody beats on BOTH
  * total spend and recency: p is dominated iff some q has q.x ≥ p.x ∧
  * q.y ≥ p.y with at least one strict. The account-review frontier
  * ("who is both high-value and active"), and the representative of a
  * whole family (multi-objective top-k, staircase queries).
  *
  * The naive test is the all-pairs anti-join (the ORACLE runs exactly
  * that — an independent formulation cross-validating this plan); the
  * classic exact answer is a sort-scan: ordered by x desc, p survives
  * iff its y strictly exceeds every y seen earlier. That running max
  * is GLOBAL — the single-partition-window trap — so this operator
  * runs the two-phase shape the engine already uses for threshold
  * calibration ([[graft.ext.CorpusOps.qScoreThreshold]]'s posture):
  *
  *  1. bucket x by value range (≤ [[skyBuckets]] coarse buckets, driver
  *     picks the width from min/max — one partial-agg scan);
  *  2. per-bucket max-y table → driver (≤ skyBuckets longs), scanned
  *     into a strictly-above cumulative, broadcast back;
  *  3. within a bucket, the prefix max runs over the (bucket, x)
  *     GROUPS — distinct x per row, so a ROWS frame is exact — a
  *     window partitioned by bucket, never global;
  *  4. p is dominated iff maxY(x' > x) ≥ y  or  maxY(x' ≥ x) > y —
  *     the two-prefix test that handles duplicate points exactly
  *     (equal points don't dominate each other; both survive).
  *
  * Cost: two partial-agg scans + one bucket-keyed window + a broadcast
  * join — no global sort, no all-pairs, driver state ≤ skyBuckets
  * rows. Output is frontier-sized (typically tiny). */
object Skyline {

  val skyBuckets = 4096L

  /** Skyline of `pts(id, x, y)` — maximize both x and y. */
  def skyline(pts: DataFrame): DataFrame = {
    val stats = pts.agg(min(col("x")), max(col("x"))).head
    if (stats.isNullAt(0)) return pts.limit(0)
    val (mn, mx) = (stats.getLong(0), stats.getLong(1))
    val width = math.max(1L, (mx - mn) / skyBuckets + 1)
    val withB = pts.withColumn("bucket",
      expr(s"(x - $mn) div $width"))
    // per-bucket max y → strictly-above cumulative (driver-side scan
    // over ≤ skyBuckets rows, the bounded-metadata posture)
    val bmax = withB.groupBy("bucket").agg(max(col("y")).as("by"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(-_._1)
    val spark = pts.sparkSession
    val cumAbove = bmax.scanLeft((Long.MaxValue, Long.MinValue)) {
      case ((_, acc), (b, by)) => (b, math.max(acc, by))
    }.sliding(2).collect { case Array((_, accAbove), (b, _)) =>
      (b, accAbove)
    }.toSeq
    import spark.implicits._
    val aboveDf = cumAbove.toDF("bucket", "above")
    // within-bucket prefix max over distinct-x groups (ROWS frame is
    // exact because each group row is one distinct x)
    val grp = withB.groupBy("bucket", "x").agg(max(col("y")).as("gy"))
    val wg = Window.partitionBy("bucket").orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val g2 = grp.withColumn("a_in", max(col("gy")).over(wg))
    withB
      .join(g2, Seq("bucket", "x"))
      .join(broadcast(aboveDf), Seq("bucket"), "left")
      .withColumn("max_above",
        greatest(coalesce(col("a_in"), lit(Long.MinValue)),
          coalesce(col("above"), lit(Long.MinValue))))
      // dominated iff maxY(x'>x) ≥ y or maxY(x'≥x) > y
      .filter(!(col("max_above") >= col("y")) &&
        !(greatest(col("max_above"), col("gy")) > col("y")))
      .select(col("id"), col("x"), col("y"))
  }

  /** Driver query: frontier of customers on (exact cents spend,
    * last-order epoch day). */
  def qSkyline(spark: SparkSession, dir: String): DataFrame =
    skyline(Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("id"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"),
        datediff(max(col("o_orderdate")).cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("y")))
      .select(col("id").as("c_custkey"), col("x").as("spend_cents"),
        col("y").as("last_day"))

  /** Independent all-pairs NOT EXISTS formulation — a genuinely
    * different algorithm validating the bucketed sort-scan. */
  val qSkylineSql: String =
    """WITH pts AS (
      |  SELECT o_custkey AS c_custkey,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS spend_cents,
      |    CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(MAX(o_orderdate) AS DATE)) AS BIGINT) AS last_day
      |  FROM orders GROUP BY o_custkey)
      |SELECT p.c_custkey, p.spend_cents, p.last_day
      |FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.spend_cents >= p.spend_cents
      |    AND q.last_day >= p.last_day
      |    AND (q.spend_cents > p.spend_cents
      |      OR q.last_day > p.last_day))""".stripMargin
}
