package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Range (interval/proximity) join — the second join shape Spark lacks
  * natively: pair rows whose event times lie within ± `toleranceMicros`
  * of each other for the same key.
  *
  * A naive theta join (`abs(l.t - r.t) <= tol`) plans as a per-key
  * cartesian product — quadratic on hot keys, dead at scale. The
  * scalable shape is time-bucketing: truncate both sides to
  * tolerance-sized buckets, explode the LEFT side to its bucket ± 1
  * (any in-tolerance pair is at most one bucket apart), equi-join on
  * (key, bucket), then apply the exact tolerance filter. Each matching
  * pair meets exactly once (the right row's bucket equals exactly one
  * of the left row's three), so no dedup pass is needed.
  *
  * Cost at 100 TB: the shuffle is an equi-join on (key, bucket) — 3×
  * the left side, 1× the right — and the per-bucket fan-out is bounded
  * by event density per tolerance window, not by corpus size. The same
  * bucket-join trick underlies every production interval-join
  * implementation (Flink's, and Spark's own stream-stream join with
  * event-time bounds).
  */
object RangeJoin {

  /** Keyed proximity join. `left`/`right` must share ONLY `key`; their
    * time columns are passed separately and land in the output. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTime: String, rightTime: String,
                toleranceMicros: Long): DataFrame = {
    require(toleranceMicros > 0, "tolerance must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: $overlap")

    // SQL `div` = exact integer division (a double `/` + floor can be
    // off by one ulp at bucket boundaries on 1e15-scale micros)
    val lb = expr(s"unix_micros($leftTime) div ${toleranceMicros}L")
    val rb = expr(s"unix_micros($rightTime) div ${toleranceMicros}L")
    val lExploded = left.withColumn("__b",
      explode(array(lb - 1, lb, lb + 1)))
    val rBucketed = right.withColumn("__b", rb)
    lExploded.join(rBucketed, Seq(key, "__b"))
      .filter(abs(unix_micros(col(leftTime)) -
        unix_micros(col(rightTime))) <= toleranceMicros)
      .drop("__b")
  }

  /** Driver-contract query: error events paired with the same user's
    * click events within ± 1 hour (error-attribution shape). */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    rangeJoin(errors, clicks, "user_id", "ts", "cts", 3600000000L)
      .select(col("user_id"), col("event_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("cts"))).as("dt_us"))
  }

  val qRangeJoinSql: String =
    """WITH errors AS (
      |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'
      |), clicks AS (
      |  SELECT user_id, event_id AS click_id, ts AS cts
      |  FROM events WHERE event_type = 'click'
      |)
      |SELECT e.user_id, e.event_id, c.click_id,
      |  epoch_us(e.ts) - epoch_us(c.cts) AS dt_us
      |FROM errors e JOIN clicks c
      |  ON e.user_id = c.user_id
      | AND abs(epoch_us(e.ts) - epoch_us(c.cts)) <= 3600000000""".stripMargin
}
