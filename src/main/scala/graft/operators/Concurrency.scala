package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Peak concurrency over session intervals — "how many sessions were
  * open at once, per day": the interval-overlap classic behind capacity
  * planning and license-seat reports.
  *
  * The textbook formulation is a running sum over BOUNDARY EVENTS: each
  * session emits +1 at its start and −1 at its end (ends ordered AFTER
  * coincident starts, so touching/inclusive intervals count as
  * overlapping), and the concurrency at any boundary is the prefix sum
  * up to it. That prefix sum is inherently GLOBAL — a session spanning
  * midnight must carry into the next day — which is exactly the
  * single-partition-window trap `SUM(…) OVER (ORDER BY …)` plans.
  * This operator instead rides [[PrefixSum]]: range-partitioned sort,
  * per-partition subtotals to the driver (one long each), offset map
  * pass — the same two-job shape [[RowNumbering]] uses, scalable to any
  * boundary count.
  *
  * Output: per-day peak concurrency, sampled at boundary events (exact:
  * concurrency only changes at boundaries; a calendar day with zero
  * boundaries has no row — the gap-fill spine is [[Events.gapFill]]'s
  * job, deliberately composable rather than fused).
  *
  * Determinism: boundaries are ordered by (ts, delta DESC) — ties among
  * equal (ts, delta) rows permute only identical deltas, so the SET of
  * prefix values over any tie group is order-invariant and the per-day
  * MAX is exact and deterministic without a further tie-break. */
object Concurrency {

  /** Per-day peak concurrency of `sessions` (session_start,
    * session_end inclusive interval columns). */
  def peakConcurrency(sessions: DataFrame): DataFrame = {
    val bounds = sessions
      .select(col("session_start").as("ts"), lit(1L).as("delta"))
      .unionAll(sessions
        .select(col("session_end").as("ts"), lit(-1L).as("delta")))
    // the prefix sum at a −1 row has already dropped the session that
    // is still ACTIVE at that instant (ends are inclusive): the
    // instantaneous concurrency there is prefix + 1 — and over a group
    // of coincident ends (prefix values P−1, P−2, …) the corrected max
    // is exactly P, every one of them still open at that timestamp
    PrefixSum.withRunningTotal(bounds,
        Seq(col("ts").asc, col("delta").desc), "delta", "concurrency")
      .withColumn("active_now",
        col("concurrency") + (col("delta") === -1L).cast("long"))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(max(col("active_now")).as("peak_concurrency"))
  }

  /** Driver query: peak concurrent 30-minute-gap sessions per day over
    * the events table — composes [[Events.qSessionize]]'s intervals. */
  def qConcurrency(spark: SparkSession, dir: String): DataFrame =
    peakConcurrency(Events.qSessionize(spark, dir))

  /** Oracle: the same boundary running sum as ONE window over the
    * sessionize oracle's intervals (fine in DuckDB's single process;
    * the engine's PrefixSum replaces exactly this window at scale). */
  val qConcurrencySql: String =
    s"""WITH s AS (${Events.qSessionizeSql.replace("\n", "\n  ")}),
       |b AS (
       |  SELECT session_start AS ts, 1 AS delta FROM s
       |  UNION ALL
       |  SELECT session_end AS ts, -1 AS delta FROM s),
       |r AS (
       |  SELECT ts,
       |    SUM(delta) OVER (
       |      ORDER BY ts ASC, delta DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      + CASE WHEN delta = -1 THEN 1 ELSE 0 END AS active_now
       |  FROM b)
       |SELECT date_trunc('day', ts) AS day,
       |  CAST(MAX(active_now) AS BIGINT) AS peak_concurrency
       |FROM r GROUP BY 1""".stripMargin
}
