package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Right-to-be-forgotten cascade — the deletion operator a warehouse
  * needs for GDPR/CCPA erasure requests: given a deletion-request set
  * over the user identity space, purge the user roots AND every fact row
  * reachable from them, emit a per-table audit, and leave zero orphans
  * (no surviving child row referencing a purged parent).
  *
  * Cascade over the testdata star schema:
  *  - `customer`: the request roots themselves;
  *  - `orders`: o_custkey ∈ requests — deleted by PREDICATE, not join:
  *    the request set is derivable per row (md5 coin on the key), so the
  *    orders purge is a map-only filter at any scale;
  *  - `lineitem`: no customer key on the line — the one genuine cascade
  *    join: LEFT SEMI/ANTI against the deleted order keys, co-partitioned
  *    on orderkey (one shuffle, the fact-fact join posture);
  *  - `events`: user_id ∈ requests — map-only predicate again.
  *
  * The demo request set is "md5(key) starts with '0'" (~1/16 of users —
  * the engine's portable coin); a deployment passes its own request
  * table and the lineitem leg's semi-join shape is unchanged, while the
  * orders/events legs become broadcast semi-joins against the (always
  * comparatively tiny) request set.
  *
  * [[qForgetAudit]] is the oracle-checked face: per-table
  * (rows_before, rows_deleted, rows_after) — exact integer counts, four
  * partial-agg scans plus the one semi-join. [[purgeTo]] actually
  * rewrites the four tables plus a tombstone manifest (the erasure
  * PROOF: which keys, per table, were purged — what an auditor asks
  * for); ForgetSpec replays the audit against the written dirs and
  * asserts the zero-orphan postcondition on them. */
object Forget {

  /** The demo deletion-request predicate: md5 first-hex-digit == '0'. */
  def requested(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 1) === "0"

  private def auditRow(name: String, df: DataFrame,
                       del: Column): DataFrame =
    df.agg(count(lit(1)).as("rows_before"),
        sum(when(del, 1L).otherwise(0L)).as("rows_deleted"))
      .select(lit(name).as("table_name"), col("rows_before"),
        col("rows_deleted"),
        (col("rows_before") - col("rows_deleted")).as("rows_after"))

  /** Per-table cascade audit. Row order is irrelevant (driver compare
    * sorts); all counts are exact integers. */
  def qForgetAudit(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val events = Tables(spark, dir, "events")
    val delOrders = orders.filter(requested(col("o_custkey")))
      .select(col("o_orderkey"))
    val liDel = li.select(col("l_orderkey"))
      .join(delOrders, col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .agg(count(lit(1)).as("rows_deleted"))
    val liRow = li.agg(count(lit(1)).as("rows_before"))
      .crossJoin(liDel)
      .select(lit("lineitem").as("table_name"), col("rows_before"),
        col("rows_deleted"),
        (col("rows_before") - col("rows_deleted")).as("rows_after"))
    auditRow("customer", cust, requested(col("c_custkey")))
      .unionByName(auditRow("orders", orders, requested(col("o_custkey"))))
      .unionByName(liRow)
      .unionByName(auditRow("events", events, requested(col("user_id"))))
  }

  val qForgetAuditSql: String =
    """WITH delo AS (
      |  SELECT o_orderkey FROM orders
      |  WHERE substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) = '0')
      |SELECT 'customer' AS table_name, COUNT(*) AS rows_before,
      |  CAST(SUM(CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) = '0'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS rows_deleted,
      |  COUNT(*) - CAST(SUM(CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)),
      |      1, 1) = '0' THEN 1 ELSE 0 END) AS BIGINT) AS rows_after
      |FROM customer
      |UNION ALL
      |SELECT 'orders', COUNT(*),
      |  CAST(SUM(CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) = '0'
      |      THEN 1 ELSE 0 END) AS BIGINT),
      |  COUNT(*) - CAST(SUM(CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)),
      |      1, 1) = '0' THEN 1 ELSE 0 END) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'lineitem', COUNT(*),
      |  CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM delo)
      |      THEN 1 ELSE 0 END) AS BIGINT),
      |  COUNT(*) - CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey
      |      FROM delo) THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'events', COUNT(*),
      |  CAST(SUM(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) = '0'
      |      THEN 1 ELSE 0 END) AS BIGINT),
      |  COUNT(*) - CAST(SUM(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)),
      |      1, 1) = '0' THEN 1 ELSE 0 END) AS BIGINT)
      |FROM events""".stripMargin

  /** Execute the cascade: write purged copies of the four tables plus a
    * `tombstones` manifest (table_name, key) — the per-table erasure
    * proof. Purged tables go to `outDir` (the Merge atomic-rewrite
    * posture applies when outDir == the source in production; here the
    * driver testdata is read-only, so specs pass a scratch dir). */
  def purgeTo(spark: SparkSession, dir: String, outDir: String): Unit = {
    val cust = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val events = Tables(spark, dir, "events")
    val delOrders = orders.filter(requested(col("o_custkey")))
      .select(col("o_orderkey"))

    cust.filter(!requested(col("c_custkey")))
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    orders.filter(!requested(col("o_custkey")))
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    li.join(delOrders, col("l_orderkey") === col("o_orderkey"),
        "left_anti")
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    events.filter(!requested(col("user_id")))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    cust.filter(requested(col("c_custkey")))
      .select(lit("customer").as("table_name"),
        col("c_custkey").cast("long").as("key"))
      .unionByName(orders.filter(requested(col("o_custkey")))
        .select(lit("orders").as("table_name"),
          col("o_orderkey").cast("long").as("key")))
      .unionByName(events.filter(requested(col("user_id")))
        .select(lit("events").as("table_name"),
          col("event_id").cast("long").as("key")))
      .write.mode("overwrite").parquet(s"$outDir/tombstones.parquet")
  }
}
