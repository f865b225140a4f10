package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SLOWLY-CHANGING-DIMENSION TYPE 2 history build — collapse a stream
  * of per-key attribute observations into versioned validity intervals
  * `[valid_from, valid_to)` with an open current row, the standard
  * warehouse dimension-history shape (Kimball SCD2). The reference's
  * warehouse stage replaces rows wholesale on load (overlap
  * replacement, `main.py:40-55`); SCD2 is the history-preserving
  * counterpart a dimension table needs once "what was this customer's
  * tier LAST quarter" becomes a query.
  *
  * Plan shape, all per-key:
  *
  *  1. observation dedup: one value per (key, date) — `min_by` keeps
  *     the deterministic representative when a key changes twice in
  *     one grain (partial-agg shuffle keyed by key+date);
  *  2. CHANGE DETECTION: `lag(value)` over (key, date) — a window
  *     PARTITIONED BY KEY, never global, so the sort is per-key and
  *     spills independently; rows where the value repeats are dropped
  *     (run-length collapse);
  *  3. interval close: `lead(change_date)` over the surviving change
  *     points gives each version its exclusive end; the last version
  *     stays open (NULL valid_to); `row_number` is the version ordinal.
  *
  * Two key-partitioned windows + one partial agg — a single shuffle
  * layout reused across all three (same key ordering), no global
  * operation anywhere. The incremental variant at 100 TB is the
  * standard boundary merge: rebuild only keys present in the arriving
  * batch (semi-join prune) and stitch at the open row — same operator
  * applied to the affected-key subset.
  *
  * Oracle: the definition replayed as window SQL over the same
  * observations (the q_score_threshold replay posture). */
object Scd2 {

  /** Build the SCD2 history of `obs(key, at, value)`:
    * (key, value, valid_from, valid_to, version). */
  def scd2(obs: DataFrame): DataFrame = {
    val grain = obs.groupBy("key", "at")
      .agg(min(col("value")).as("value"))
    val byKey = Window.partitionBy("key").orderBy("at")
    val changes = grain
      .withColumn("prev", lag(col("value"), 1).over(byKey))
      .filter(col("prev").isNull || col("prev") =!= col("value"))
    changes
      .withColumn("valid_to", lead(col("at"), 1).over(byKey))
      .withColumn("version", row_number().over(byKey))
      .select(col("key"), col("value"),
        col("at").as("valid_from"), col("valid_to"), col("version"))
  }

  /** Driver query: per-customer order-priority history — each
    * customer's observed priority per order date, collapsed into
    * versioned validity ranges. */
  def qScd2(spark: SparkSession, dir: String): DataFrame =
    scd2(Tables(spark, dir, "orders").select(
      col("o_custkey").as("key"),
      col("o_orderdate").cast("date").as("at"),
      col("o_orderpriority").as("value")))
      .select(col("key").as("c_custkey"),
        col("value").as("priority"),
        // surfaced as midnight timestamps: the driver's compare
        // stringifies DATE differently between arrow and DuckDB, and
        // every green date-bearing query (gap_fill, islands) ships the
        // timestamp form — value-identical at the pinned UTC zone
        col("valid_from").cast("timestamp").as("valid_from"),
        col("valid_to").cast("timestamp").as("valid_to"),
        col("version").cast("long").as("version"))

  val qScd2Sql: String =
    """WITH grain AS (
      |  SELECT o_custkey AS key, CAST(o_orderdate AS DATE) AS at,
      |         MIN(o_orderpriority) AS value
      |  FROM orders GROUP BY 1, 2
      |), chg AS (
      |  SELECT *, LAG(value) OVER (PARTITION BY key ORDER BY at) AS prev
      |  FROM grain
      |), runs AS (
      |  SELECT key, at, value FROM chg
      |  WHERE prev IS NULL OR prev <> value
      |)
      |SELECT key AS c_custkey, value AS priority,
      |  CAST(at AS TIMESTAMP) AS valid_from,
      |  CAST(LEAD(at) OVER (PARTITION BY key ORDER BY at) AS TIMESTAMP)
      |    AS valid_to,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY at) AS BIGINT)
      |    AS version
      |FROM runs""".stripMargin
}
