package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sorts / limits / set ops (SURVEY.md §2.6) and the remaining scalar
  * functions (F8 base64) as oracle-checked queries. */
object SetSortOps {

  /** O4 — top-k (`README.md:56` pattern). Unique tiebreak keeps the
    * result deterministic across engines. Spark plans this as
    * TakeOrderedAndProject: per-partition top-10 heaps, then a 10-row
    * driver merge — no global sort, scale-safe. */
  def qTopk(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  val qTopkSql: String =
    """SELECT * FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** U1 — UNION ALL of two homogeneous selections (the merge's union
    * shape, `config.py:195-196`), name-resolved via unionByName. */
  def qUnion(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val cols = Seq(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    orders.filter(col("o_orderpriority") === "1-URGENT").select(cols: _*)
      .unionByName(
        orders.filter(col("o_orderpriority") === "2-HIGH").select(cols: _*))
  }

  val qUnionSql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      |WHERE o_orderpriority = '1-URGENT'
      |UNION ALL
      |SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      |WHERE o_orderpriority = '2-HIGH'""".stripMargin

  /** F8/S10 — base64 message payload decode (reference `config.py:55-57`
    * decodes Pub/Sub payloads): encode-then-decode roundtrip over a real
    * string column using the built-in codegen'd expressions. */
  def qBase64(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select(
      col("event_id"),
      base64(col("event_type").cast("binary")).as("encoded"),
      unbase64(base64(col("event_type").cast("binary")))
        .cast("string").as("decoded"))

  val qBase64Sql: String =
    """SELECT event_id,
      |  base64(CAST(event_type AS BLOB)) AS encoded,
      |  CAST(from_base64(base64(CAST(event_type AS BLOB))) AS VARCHAR)
      |    AS decoded
      |FROM events""".stripMargin

  /** Anti join — customers with no order since 1998. Spark's left_anti
    * plans as a broadcast/shuffled hash anti join: the probe side
    * streams, the build side holds only join keys — the right shape for
    * "rows with no match" at any scale (vs the NOT IN subquery
    * formulation, which null-semantics aside degenerates without
    * decorrelation). */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val recent = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
    cust.join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')""".stripMargin
}
