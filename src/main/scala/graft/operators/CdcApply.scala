package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CDC APPLY — compact a change log (upserts + tombstone deletes,
  * totally ordered per key by a sequence) onto a base snapshot: the
  * lakehouse MERGE/upsert primitive (Delta/Iceberg/Hudi's
  * copy-on-write semantics) that turns a replicated WAL into the next
  * table version. The reference's warehouse stage replaces whole
  * date-ranges ([[graft.merge.Merge]] implements that posture); CDC
  * apply is the row-granular counterpart once the feed carries
  * per-record mutations.
  *
  * Scale posture — latest-wins WITHOUT a per-key sort:
  *
  *  1. LOG COMPACTION: `max_by(payload-struct, seq)` per key — ONE
  *     partial-agg shuffle. The map-side combiner already reduces each
  *     partition to one candidate per key, so network traffic is
  *     ≤ |distinct keys touched|, independent of log depth. (The
  *     window-function alternative sorts every key group; `max_by` is
  *     the associative-monoid form of the same answer. The ORACLE uses
  *     the window form — an independent formulation.)
  *  2. APPLY: full-outer join base ⟗ compacted deltas on the key —
  *     base rows without changes pass through, changed keys take the
  *     delta payload, keys whose LATEST op is a tombstone drop (a late
  *     tombstone beats earlier upserts — and an upsert AFTER a
  *     tombstone resurrects the key, both decided by the same max_by).
  *     At 100 TB both sides bucket by the key, and the delta side is
  *     typically orders-of-magnitude smaller → AQE picks a broadcast
  *     or co-located join; no global operation anywhere.
  *
  * Sequence ties are resolved by a total tie-break folded INTO the
  * sequence struct (seq, op) — deterministic replay beats engine
  * nondeterminism. */
object CdcApply {

  /** Apply `changes(key, seq, tie, op, value)` (op ∈ {U, D}) onto
    * `base(key, value)`: surviving rows (key, value, src) where src
    * marks provenance ('base' untouched | 'cdc' upserted). */
  def applyCdc(base: DataFrame, changes: DataFrame): DataFrame = {
    val latest = changes.groupBy("key").agg(
      max_by(struct(col("op"), col("value")),
        struct(col("seq"), col("tie"))).as("last"))
      .select(col("key"), col("last.op").as("op"),
        col("last.value").as("cval"))
    base.join(latest, Seq("key"), "full_outer")
      .filter(col("op").isNull || col("op") === "U")
      .select(col("key"),
        when(col("op") === "U", col("cval")).otherwise(col("value"))
          .as("value"),
        when(col("op") === "U", lit("cdc")).otherwise(lit("base"))
          .as("src"))
  }

  /** Driver query: the customer balance table after applying the order
    * stream as a CDC log — each order upserts its customer's balance to
    * its total price (cents-exact), 5-LOW orders are tombstones;
    * per-key order is (o_orderdate, o_orderkey). */
  def qCdcApply(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "customer").select(
      col("c_custkey").as("key"),
      round(col("c_acctbal") * 100).cast("long").as("value"))
    val changes = Tables(spark, dir, "orders").select(
      col("o_custkey").as("key"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("seq"),
      col("o_orderkey").as("tie"),
      when(col("o_orderpriority") === "5-LOW", "D").otherwise("U")
        .as("op"),
      round(col("o_totalprice") * 100).cast("long").as("value"))
    applyCdc(base, changes)
      .select(col("key").as("c_custkey"), col("value").as("balance_cents"),
        col("src"))
  }

  /** Window-form oracle: rank changes per key, apply rank 1. */
  val qCdcApplySql: String =
    """WITH base AS (
      |  SELECT c_custkey AS key,
      |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS value
      |  FROM customer
      |), chg AS (
      |  SELECT o_custkey AS key,
      |    CASE WHEN o_orderpriority = '5-LOW' THEN 'D' ELSE 'U' END AS op,
      |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS value,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
      |  FROM orders
      |), latest AS (SELECT key, op, value FROM chg WHERE rk = 1)
      |SELECT COALESCE(b.key, l.key) AS c_custkey,
      |  CASE WHEN l.op = 'U' THEN l.value ELSE b.value END AS balance_cents,
      |  CASE WHEN l.op = 'U' THEN 'cdc' ELSE 'base' END AS src
      |FROM base b FULL OUTER JOIN latest l ON b.key = l.key
      |WHERE l.op IS NULL OR l.op = 'U'""".stripMargin
}
