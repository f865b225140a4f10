package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream analytics over the `events` table (ts / user_id /
  * event_type / value / props-JSON) — the batch halves of the streaming
  * surface in [[graft.streaming]]: the same windowed aggregation and
  * sessionization semantics, expressed relationally so the driver can
  * oracle-check them, with the Structured Streaming counterparts
  * spec-checked for agreement.
  *
  * Scale shapes:
  *  - windowed agg: date_trunc is map-side; the groupBy shuffles
  *    |buckets × types| rows after partial aggregation — the canonical
  *    time-series rollup at any scale;
  *  - sessionization: one shuffle on user_id (the lag + cumulative-sum
  *    windows and the final groupBy all share that partitioning, so
  *    Catalyst plans a single exchange) — never a global window;
  *  - JSON extraction: map-only projection, codegen'd `get_json_object`
  *    (JsonPath over UTF8String, no UDF).
  */
object Events {

  /** Session gap: a pause of more than this many microseconds of event
    * time starts a new session (classic 30-minute web-analytics gap). */
  val sessionGapMicros: Long = 30L * 60 * 1000000

  /** Tumbling 1-hour windowed aggregation: count + exact sum(value) per
    * (hour, event_type). `value` is money-like 2-dp → [[Aggregates.dsum]]
    * keeps the sum order-independent and bit-identical to the oracle. */
  def qEventsWindow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("ws"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Aggregates.dsum(col("value")).as("sum_value"))

  val qEventsWindowSql: String =
    """SELECT date_trunc('hour', ts) AS ws, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS sum_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Gap-based sessionization, batch formulation: per user, a new
    * session starts when the gap to the previous event exceeds
    * [[sessionGapMicros]]; session_id = running count of session starts
    * (lag + cumulative sum over the same user_id/ts order, so one
    * exchange serves both windows and the final rollup). Event-time ties
    * are broken by event_id for a total order. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("us"))
    val order = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val newSession = when(
      col("us") - lag(col("us"), 1).over(order) > sessionGapMicros, 1L)
      .otherwise(0L)
    ev.withColumn("new_session", newSession)
      .withColumn("session_id",
        sum(col("new_session")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  val qSessionizeSql: String =
    s"""WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
      |              > $sessionGapMicros
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_session) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events
      |FROM numbered GROUP BY 1, 2""".stripMargin

  /** Pivot — long-to-wide reshaping: per-user event counts, one column
    * per event type. The value list is EXPLICIT: `pivot(col)` without
    * values first runs a distinct job over the corpus to discover them
    * and caps at `spark.sql.pivotMaxValues` — at 100 TB the enumerated
    * form is one pass, plans as an ordinary grouping aggregation, and
    * fails loudly if a new type appears instead of silently widening. */
  val eventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))

  val qPivotSql: String =
    s"""SELECT user_id,
      |${eventTypes.map(t =>
        s"  COUNT(*) FILTER (event_type = '$t') AS \"$t\"").mkString(",\n")}
      |FROM events GROUP BY user_id""".stripMargin

  /** Exact continuous percentiles per event type (both engines use the
    * same (1-d)·lower + d·upper interpolation). Exact ordered statistics
    * sort each group — the honest cost; the constant-memory scale path
    * is `approx_percentile` (same plan family as the HLL sketch pair in
    * Similarity), kept out of the oracle query because sketch estimates
    * are engine-specific. */
  def qQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"))

  val qQuantilesSql: String =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90,
      |  quantile_cont(value, 0.99) AS p99
      |FROM events GROUP BY event_type""".stripMargin

  /** JSON property extraction from the `props` column (every training
    * pipeline parses sidecar JSON metadata): pull `$.k` as a typed
    * column and keep the raw event key. */
  def qJsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))

  val qJsonPropsSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events""".stripMargin
}
