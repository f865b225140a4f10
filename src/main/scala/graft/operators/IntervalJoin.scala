package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** INTERVAL-OVERLAP JOIN — pair every left interval with every right
  * interval it intersects, without the O(|L|·|R|) cross product a
  * naive inequality join plans to: the temporal-join workhorse
  * (sessions × incident windows, visits × campaigns, trips ×
  * surge periods).
  *
  * [[RangeJoin]] already handles POINT-to-range with tolerance
  * bucketing; this is the two-sided INTERVAL form of the same banding
  * move: quantize TIME itself into fixed buckets, explode each
  * interval into the buckets it touches, and equi-join on the bucket —
  * Catalyst plans a plain shuffled hash join keyed by bucket, and the
  * inequality becomes set intersection. Because bucket membership is
  * `⌊start⌋ ≤ h ≤ ⌊end⌋ ⟺ touches [h, h+1)`, two intervals share a
  * bucket IFF they overlap at bucket granularity, and a final exact
  * predicate (kept even where alignment makes it vacuous — membership
  * proofs shouldn't depend on the caller's alignment) filters
  * bucket-grazing non-overlaps. `distinct` collapses multi-bucket
  * matches (a pair sharing k buckets appears k times).
  *
  * 100 TB posture: shuffle is Σ interval-length/bucket rows per side —
  * the bucket width is the skew dial (wide: fewer rows, more
  * false bucket-pairs; narrow: the reverse). Intervals orders of
  * magnitude longer than the bucket should be SPLIT at ingest (the
  * standard long-session cap); a hot bucket (everyone online at the
  * Super Bowl) is the AQE skew-join case, same as every banded join
  * in this engine. */
object IntervalJoin {

  /** Overlap pairs of `left(lid, lstart, lend)` × `right(rid, rstart,
    * rend)` (timestamps, closed intervals) at `bucket`-second banding. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   bucketSec: Long = 3600L): DataFrame = {
    def banded(df: DataFrame, s: String, e: String) =
      df.withColumn("bucket", explode(sequence(
        (unix_micros(col(s)) / (bucketSec * 1000000L)).cast("long"),
        (unix_micros(col(e)) / (bucketSec * 1000000L)).cast("long"))))
    banded(left, "lstart", "lend")
      .join(banded(right, "rstart", "rend"), "bucket")
      .filter(col("lstart") <= col("rend") && col("lend") >= col("rstart"))
      .select("lid", "rid", "lstart", "lend", "rstart", "rend")
      .distinct()
  }

  /** Above-average busy hours merged into maximal BURST intervals
    * [first_hour, last_hour + 1h): the hourly rollup runs first (cost
    * |hours|, never event volume — the anomaly-family posture), so the
    * island window over the ≤|hours|-row stream is bounded-domain by
    * construction. Burst threshold is integer-exact: cnt · |hours| ≥
    * total (strictly above-or-equal mean without a float division). */
  def busyBursts(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val tot = hourly.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_hours"))
    val busy = hourly.crossJoin(broadcast(tot))
      .filter(col("cnt") * col("n_hours") >= col("total"))
      .select("hour")
    // islands over the ≤|hours|-row busy stream: a new burst starts
    // where the previous busy hour isn't exactly 1h back
    val w = Window.orderBy("hour")
    busy
      .withColumn("brk",
        when(unix_micros(col("hour")) -
          unix_micros(lag(col("hour"), 1).over(w)) === 3600000000L, 0L)
          .otherwise(1L))
      .withColumn("burst", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("burst")
      .agg(min(col("hour")).as("rstart"),
        (max(col("hour")) + expr("INTERVAL 1 HOUR")).as("rend"))
  }

  /** Driver query: user sessions × high-activity bursts — which
    * sessions ran (partly) inside a site-wide rush. Sessions come from
    * the engine's own sessionizer; bursts from [[busyBursts]]. The
    * exact predicate uses the half-open burst end (rend exclusive). */
  def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val sessions = Events.qSessionize(spark, dir).select(
      col("user_id").as("lid"),
      col("session_start").as("lstart"), col("session_end").as("lend"))
    val bursts = busyBursts(Tables(spark, dir, "events"))
      .select(col("burst").as("rid"), col("rstart"), col("rend"))
    intervalJoin(sessions, bursts)
      // half-open right end: a session STARTING exactly at rend is out
      .filter(col("lstart") < col("rend"))
      .groupBy(col("lid").as("user_id"), col("rstart").as("burst_start"),
        col("rend").as("burst_end"))
      .agg(count(lit(1)).as("n_sessions"))
  }

  /** Independent inequality-join oracle over replayed sessions and
    * bursts — no banding anywhere. */
  val qIntervalJoinSql: String =
    s"""WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
      |              > ${Events.sessionGapMicros}
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_id,
      |    ts
      |  FROM flagged
      |), sessions AS (
      |  SELECT user_id, MIN(ts) AS s, MAX(ts) AS e
      |  FROM sess GROUP BY user_id, session_id
      |), hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
      |  FROM events GROUP BY 1
      |), tot AS (SELECT SUM(cnt) AS total, COUNT(*) AS n_hours FROM hourly),
      |busy AS (
      |  SELECT hour FROM hourly, tot WHERE cnt * n_hours >= total
      |), brk AS (
      |  SELECT hour, CASE WHEN epoch_us(hour) -
      |      epoch_us(lag(hour) OVER (ORDER BY hour)) = 3600000000
      |    THEN 0 ELSE 1 END AS b
      |  FROM busy
      |), isl AS (
      |  SELECT hour, SUM(b) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING)
      |    AS burst
      |  FROM brk
      |), bursts AS (
      |  SELECT MIN(hour) AS rstart, MAX(hour) + INTERVAL 1 HOUR AS rend
      |  FROM isl GROUP BY burst
      |)
      |SELECT s.user_id, b.rstart AS burst_start, b.rend AS burst_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_sessions
      |FROM sessions s JOIN bursts b
      |  ON s.s < b.rend AND s.e >= b.rstart
      |GROUP BY 1, 2, 3""".stripMargin
}
