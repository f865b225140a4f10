package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** FIXED-WIDTH HISTOGRAM PERCENTILES — the mergeable percentile
  * estimator a monitoring pipeline actually deploys: exact order
  * statistics need a sort (or the two-phase selection of
  * [[graft.ext.CorpusOps.qScoreThreshold]]) per query, while a
  * fixed-width bucket histogram is a SUM MONOID — per-partition (and,
  * in [[graft.streaming.HistogramStore]], per-batch) counts merge by
  * addition, and any percentile is answered from the bounded bucket
  * table: find the first bucket whose cumulative count reaches the
  * target rank, then linearly interpolate inside it. Unlike t-digest /
  * KLL (whose states are seeded and engine-specific), every number
  * here is exact-integer-derived, so the WHOLE estimator —
  * bucketing, cumulative scan, interpolation — is hash-checked.
  *
  * Per percentile p: target = ⌈p·N/100⌉ (integer: (p·N + 99) div
  * 100); bucket b* = min{b : cum(b) ≥ target}; estimate =
  * W·b* + W·(target − cum(b*−1))/count(b*) — rank-linear
  * interpolation inside the bucket, the classic equi-width histogram
  * estimate (what Prometheus' histogram_quantile computes).
  *
  * Plan: one corpus scan → |buckets|-row count table (the only
  * shuffle); the cumulative window and the per-p pick run on bounded
  * rows. Accuracy is the bucket width — the documented trade. */
object HistogramQuantiles {

  /** Bucket width for the o_totalprice instantiation. */
  val bucketWidth = 1000L
  val percentiles: Seq[Int] = Seq(50, 90, 95, 99)

  /** Core over any frame: histogram percentiles of `valueCol`
    * (non-negative), one row per requested percentile:
    * (p, target_rank, bucket, bucket_count, est). */
  def histQuantiles(df: DataFrame, valueCol: String,
                    width: Long = bucketWidth,
                    ps: Seq[Int] = percentiles): DataFrame =
    quantilesOverHistogram(
      df.groupBy(floor(col(valueCol) / width.toDouble).cast(LongType)
          .as("bucket"))
        .agg(count(lit(1)).as("c")), width, ps)

  /** The same pick over an ALREADY-BUILT (bucket, c) histogram — the
    * shared definition [[graft.streaming.HistogramStore]] serves. */
  def quantilesOverHistogram(hist: DataFrame, width: Long = bucketWidth,
                             ps: Seq[Int] = percentiles): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // |buckets| rows — the unpartitioned window is bounded metadata
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
      .withColumn("prev", col("cum") - col("c"))
    // sum over zero rows is NULL (fresh/empty store) — serve the empty
    // percentile table rather than NPE on getLong
    val nRow = hist.agg(sum(col("c"))).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    val targets = ps.map(p => (p, (p.toLong * n + 99L) / 100L))
      .toDF("p", "target")
      .filter(col("target") > 0L) // n = 0: no rank to pick, empty result
    // first bucket whose cum reaches the target: struct-min argmin
    cum.join(broadcast(targets), col("cum") >= col("target"))
      .groupBy("p", "target")
      .agg(min(struct(col("bucket"), col("c"), col("prev"))).as("pk"))
      .select(col("p"), col("target").as("target_rank"),
        col("pk.bucket").as("bucket"),
        col("pk.c").as("bucket_count"),
        (col("pk.bucket").cast(DoubleType) * width.toDouble +
          lit(width.toDouble) *
            (col("target") - col("pk.prev")).cast(DoubleType) /
            col("pk.c").cast(DoubleType)).as("est"))
  }

  /** Driver query: o_totalprice percentiles from the 1000-wide
    * histogram. */
  def qQuantileHist(spark: SparkSession, dir: String): DataFrame =
    histQuantiles(Tables(spark, dir, "orders"), "o_totalprice")

  val qQuantileHistSql: String = {
    val w = bucketWidth
    val ps = percentiles.mkString(", ")
    s"""WITH hist AS MATERIALIZED (
      |  SELECT CAST(floor(o_totalprice / $w.0) AS BIGINT) AS bucket,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1),
      |cum AS MATERIALIZED (
      |  SELECT bucket, c,
      |    CAST(SUM(c) OVER (ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM hist),
      |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
      |t AS (
      |  SELECT p, (p * n + 99) // 100 AS target
      |  FROM (SELECT unnest([$ps]) AS p), nn),
      |pick AS (
      |  SELECT t.p, t.target,
      |    MIN({'bucket': cum.bucket, 'c': cum.c, 'cum': cum.cum}) AS pk
      |  FROM t JOIN cum ON cum.cum >= t.target
      |  GROUP BY 1, 2)
      |SELECT CAST(p AS INTEGER) AS p, target AS target_rank,
      |  (pk).bucket AS bucket, (pk).c AS bucket_count,
      |  CAST((pk).bucket AS DOUBLE) * $w.0
      |    + $w.0 * CAST(target - ((pk).cum - (pk).c) AS DOUBLE)
      |      / CAST((pk).c AS DOUBLE) AS est
      |FROM pick""".stripMargin
  }
}
