package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (time-travel) join — an operator Spark has no native form of:
  * each left row picks up the payload of the most recent right row with
  * `right.time <= left.time` for the same key (the inclusive variant,
  * matching DuckDB's `ASOF LEFT JOIN ... ON l.t >= r.t`, which is the
  * oracle).
  *
  * NOT implemented as a join at all: a range/theta join on
  * `r.time <= l.time` explodes quadratically per key and then needs a
  * per-left-row argmax. The scalable shape is union + ordered
  * forward-fill:
  *   1. align both inputs to one schema, tag `__side` (right = 0 sorts
  *      before left = 1 at equal time → inclusive semantics, no theta
  *      predicate anywhere);
  *   2. ONE exchange on the key; within each key-partition sort by
  *      (time, side) and forward-fill the right payload with
  *      `last(ignoreNulls)` over rows-unbounded-preceding;
  *   3. keep the left rows.
  * Cost at 100 TB: one shuffle of |left| + |right| rows on a
  * high-cardinality key and one in-partition sort — the same profile as
  * any window, with zero risk of join blowup. Skewed keys fall back to
  * the usual guards (AQE, or pre-aggregate the right side per key).
  *
  * Left/right payload column names must be disjoint (enforced).
  *
  * The right payload is forward-filled as ONE struct column built only
  * on right rows — never per payload column: independent per-column
  * fills would backfill a legitimately-NULL payload value from an OLDER
  * right row, stitching the output from different right rows. With the
  * struct, a matched right row's nulls stay null, exactly as a real join
  * would produce.
  *
  * Determinism contract: if the right side has duplicate (key, time)
  * rows, which of them a left row picks up is UNSPECIFIED (the
  * in-partition sort breaks the tie arbitrarily) — deduplicate the right
  * side or add a tiebreak column to `time` if that matters.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               time: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => c == key || c == time).toSeq
    val rightPayload = right.columns.filterNot(c => c == key || c == time).toSeq
    val overlap = leftPayload.intersect(rightPayload)
    require(overlap.isEmpty,
      s"payload columns must be disjoint, both sides have: $overlap")
    // a payload-less right side has nothing to attach: the as-of join
    // degenerates to the left rows (struct() of zero columns is not
    // expressible, and no output column would reference it) — re-ordered
    // to the joined path's (key, time, leftPayload...) layout so
    // positional consumers see one schema regardless of right payload
    if (rightPayload.isEmpty)
      return left.select(Seq(col(key), col(time)) ++ leftPayload.map(col): _*)

    val rpayType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))
    val lAligned = left.select(
      Seq(col(key), col(time), lit(1).as("__side")) ++
        leftPayload.map(col) :+
        lit(null).cast(rpayType).as("__rpay"): _*)
    val rAligned = right.select(
      Seq(col(key), col(time), lit(0).as("__side")) ++
        leftPayload.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("__rpay"): _*)

    val w = Window.partitionBy(key).orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lAligned.unionByName(rAligned)
      .withColumn("__rpay", last(col("__rpay"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(Seq(col(key), col(time)) ++ leftPayload.map(col) ++
        rightPayload.map(c => col(s"__rpay.$c").as(c)): _*)
  }

  /** Driver-contract query: each click event picks up the value of the
    * user's most recent prior (or simultaneous) view event. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").as("click_value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value").as("view_value"))
    asofJoin(clicks, views, "user_id", "ts")
  }

  val qAsofJoinSql: String =
    """WITH clicks AS (
      |  SELECT user_id, ts, event_id, value AS click_value
      |  FROM events WHERE event_type = 'click'
      |), views AS (
      |  SELECT user_id, ts, value AS view_value
      |  FROM events WHERE event_type = 'view'
      |)
      |SELECT c.user_id, c.ts, c.event_id, c.click_value, v.view_value
      |FROM clicks c ASOF LEFT JOIN views v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin
}
