package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.merge.Merge

/** A2/S7 merge semantics as an oracle-checked query: simulate an update
  * batch (all 1997+ orders, with corrected totals) merged into the full
  * base table. The overlap region must come out with the STAGING values —
  * proving replace-on-overlap (ST4), not blind append. */
object MergeOps {

  def qMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "orders")
    val staging = base
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .withColumn("o_totalprice", col("o_totalprice") * 1.1)
    Merge.merge(base, staging, "o_orderdate")
  }

  val qMergeSql: String =
    """WITH staging AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |         o_totalprice * 1.1 AS o_totalprice,
      |         o_orderdate, o_orderpriority
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
      |SELECT * FROM orders
      |WHERE o_orderdate < (SELECT MIN(o_orderdate) FROM staging)
      |UNION ALL
      |SELECT * FROM staging
      |ORDER BY o_orderdate""".stripMargin
}
