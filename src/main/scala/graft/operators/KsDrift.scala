package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.Tables

/** TWO-SAMPLE KOLMOGOROV–SMIRNOV drift — the EXACT companion to
  * [[PsiDrift]]'s bucketed score (reference `main.py:18-63` ingests
  * batch after batch of the same feed; PSI tells you the 10-bucket
  * histogram moved, KS tells you the full CDF moved and WHERE):
  *
  *   D = max_x | F_ref(x) − F_cur(x) |
  *
  * evaluated at every distinct observed value (the sup over ℝ of two
  * step functions is attained at a step). No buckets, no smoothing —
  * and, unlike textbook KS, no floats: with cumulative counts
  * (i, j) at value x, F_ref − F_cur = i/n_ref − j/n_cur, so
  *
  *   D·n_ref·n_cur = max_x | i·n_cur − j·n_ref |
  *
  * is an integer. The cumulant is built as the running sum of ONE
  * signed per-value step, c_ref(x)·n_cur − c_cur(x)·n_ref, in
  * DECIMAL(38,0) (count×count products overflow Long at the 100 TB
  * posture — the Changepoint/CorrMatrix exactness pattern), the
  * argmax tie-breaks toward the smallest value, and the alarm
  * (D ≥ 0.1, mirroring PSI's moderate-shift line) compares
  * 10·D_num ≥ n_ref·n_cur — integers end to end. Only the reported
  * `ks_micro` touches doubles, via the identical expression tree in
  * both engines (the lm_score posture).
  *
  * Plan shape: ONE scan partial-aggs to the per-distinct-value
  * (c_ref, c_cur) table; totals broadcast back; ONE ordered window
  * builds the cumulant; TakeOrderedAndProject picks the argmax row.
  * The window is a single partition BY CONSTRUCTION BOUNDED BY THE
  * VALUE DOMAIN, not the corpus: cents of a price capped at 600k
  * currency units give ≤ 6·10⁷ distinct values no matter how many
  * rows ground them — corpus-independent, the same boundedness
  * contract as [[HistogramQuantiles]]' bucket table (and if the
  * domain were unbounded, pre-quantizing the feature IS the KS of
  * the quantized variable — exact for data recorded at that
  * granularity). */
object KsDrift {

  /** Reference/current split point — [[PsiDrift.splitDate]], so the
    * two drift scores profile the same partition of the feed. */
  val splitDate: String = PsiDrift.splitDate
  /** Alarm line: D ≥ 1/10. */
  val alarmDen = 10L

  private val dec = DecimalType(38, 0)

  /** Exact KS over (side, cents) rows; one summary row. */
  def ksDrift(feat: DataFrame): DataFrame =
    ksFromCounts(feat.groupBy("cents").agg(
      sum(when(col("side") === "ref", 1L).otherwise(0L)).as("c_ref"),
      sum(when(col("side") === "cur", 1L).otherwise(0L)).as("c_cur")))

  /** Exact KS from a PARTIAL per-value count table (cents, c_ref,
    * c_cur) — rows may repeat per value (summed first), which is what
    * lets the streaming [[graft.streaming.DriftStore]] serve the live
    * statistic from per-batch count deltas (a sum monoid). */
  def ksFromCounts(valueCounts: DataFrame): DataFrame = {
    val counts = valueCounts.groupBy("cents")
      .agg(sum("c_ref").as("c_ref"), sum("c_cur").as("c_cur"))
    val tot = counts.agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
    val cum = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.crossJoin(broadcast(tot))
      .withColumn("step",
        (col("c_ref").cast(dec) * col("n_cur") -
          col("c_cur").cast(dec) * col("n_ref")).cast(dec))
      .withColumn("gap", abs(sum(col("step")).over(cum)).cast(dec))
      .orderBy(col("gap").desc, col("cents").asc).limit(1)
      .select(col("n_ref"), col("n_cur"), col("cents").as("at_cents"),
        // an empty side makes D undefined — report 0 on BOTH engines
        // (round-16 edge-corpus find: ANSI Spark throws on the double
        // division where DuckDB yields NULL)
        when(col("n_ref") === 0L || col("n_cur") === 0L, 0L).otherwise(
          round(lit(1e6) * col("gap").cast(DoubleType) /
              (col("n_ref").cast(DoubleType) * col("n_cur").cast(DoubleType)))
            .cast(LongType)).as("ks_micro"),
        (col("gap") * alarmDen >=
          col("n_ref").cast(dec) * col("n_cur")).cast("integer").as("drifted"))
  }

  /** Driver query: order-amount CDF, pre-[[splitDate]] reference vs
    * post-split current — the same feature [[PsiDrift.qPsiDrift]]
    * buckets, scored exactly. */
  def qKsDrift(spark: SparkSession, dir: String): DataFrame =
    ksDrift(Tables(spark, dir, "orders").select(
      when(col("o_orderdate") < lit(splitDate).cast("timestamp"), "ref")
        .otherwise("cur").as("side"),
      round(col("o_totalprice") * 100).cast(LongType).as("cents")))

  val qKsDriftSql: String =
    s"""WITH feat AS (
      |  SELECT CASE WHEN o_orderdate < TIMESTAMP '$splitDate 00:00:00'
      |      THEN 'ref' ELSE 'cur' END AS side,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |counts AS (
      |  SELECT cents,
      |    CAST(SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c_ref,
      |    CAST(SUM(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c_cur
      |  FROM feat GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
      |               CAST(SUM(c_cur) AS BIGINT) AS n_cur FROM counts),
      |gaps AS (
      |  SELECT cents, n_ref, n_cur,
      |    ABS(SUM(CAST(c_ref AS HUGEINT) * n_cur - CAST(c_cur AS HUGEINT)
      |        * n_ref) OVER (ORDER BY cents
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS gap
      |  FROM counts, tot)
      |SELECT n_ref, n_cur, cents AS at_cents,
      |  CASE WHEN n_ref = 0 OR n_cur = 0 THEN 0 ELSE
      |    CAST(round(1000000.0 * CAST(gap AS DOUBLE)
      |      / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE))) AS BIGINT)
      |    END AS ks_micro,
      |  CAST(gap * $alarmDen >= CAST(n_ref AS HUGEINT) * n_cur AS INTEGER)
      |    AS drifted
      |FROM gaps ORDER BY gap DESC, cents ASC LIMIT 1""".stripMargin
}
