package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** LEAKAGE-FREE TARGET ENCODING (Micci-Barreca 2001, SIGKDD Expl. —
  * the mean-target categorical encoder every tabular-ML pipeline
  * ships) in its leave-one-out + m-prior form:
  *
  *   enc(row) = (Σy_cat − y_row + m·ȳ_global) / (n_cat − 1 + m)
  *
  * Subtracting the row's OWN target before averaging is what makes the
  * feature trainable: naive per-category means leak the label into the
  * feature (a category seen once encodes its own target exactly — the
  * classic target-leakage bug); the m-weighted global prior shrinks
  * rare categories toward the corpus mean instead of letting a 2-row
  * category swing to 0/1. Two features demonstrate both cardinality
  * regimes on one scan: o_custkey (high-cardinality, ~10 rows/cat —
  * smoothing and LOO both load-bearing) and o_orderpriority (5 values,
  * prior nearly inert). Target: order fulfilled (o_orderstatus='F').
  *
  * DETERMINISM: category and global sufficient statistics are exact
  * integers; the encoding is one fixed-shape double expression
  * (add/mul/div — IEEE correctly-rounded, identical cross-engine),
  * micro-quantized per row. No libm at all.
  *
  * SCALE: one scan → per-category partial agg (map-side combine),
  * joined back on the category key (linear shuffle; the bounded
  * priority table and the 1-row global ride broadcasts). Nothing is
  * quadratic; nothing sorts. */
object TargetEncode {

  /** Prior pseudo-count m — exact decimal literal on both sides. */
  val priorM = "20.0"

  def encode(orders: DataFrame): DataFrame = {
    val base = orders.select(
      col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
      (col("o_orderstatus") === "F").cast(LongType).as("y"))
    val byCust = base.groupBy("o_custkey")
      .agg(sum("y").as("sy_c"), count(lit(1)).as("n_c"))
    val byPrio = base.groupBy("o_orderpriority")
      .agg(sum("y").as("sy_p"), count(lit(1)).as("n_p"))
    val glob = base.agg(sum("y").as("sy"), count(lit(1)).as("n"))
    def enc(sy: String, nc: String): String =
      s"""cast(round(1000000.0 * ((cast($sy - y as double)
         | + $priorM * (cast(sy as double) / cast(n as double)))
         | / (cast($nc - 1 as double) + $priorM))) as bigint)"""
        .stripMargin.replace("\n", "")
    base.join(byCust, Seq("o_custkey"))
      .join(broadcast(byPrio), Seq("o_orderpriority"))
      .crossJoin(broadcast(glob))
      .selectExpr("o_orderkey", "o_custkey", "o_orderpriority",
        "cast(y as int) as y",
        enc("sy_c", "n_c") + " as enc_cust_micro",
        enc("sy_p", "n_p") + " as enc_prio_micro")
  }

  def qTargetEncode(spark: SparkSession, dir: String): DataFrame =
    encode(Tables(spark, dir, "orders"))

  val qTargetEncodeSql: String = {
    def enc(sy: String, nc: String): String =
      s"""CAST(round(1000000.0 * ((CAST($sy - y AS DOUBLE)
         |      + $priorM * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
         |      / (CAST($nc - 1 AS DOUBLE) + $priorM))) AS BIGINT)"""
        .stripMargin
    s"""WITH base AS MATERIALIZED (
       |  SELECT o_orderkey, o_custkey, o_orderpriority,
       |    CAST(o_orderstatus = 'F' AS BIGINT) AS y
       |  FROM orders),
       |by_cust AS MATERIALIZED (
       |  SELECT o_custkey, SUM(y) AS sy_c, COUNT(*) AS n_c
       |  FROM base GROUP BY 1),
       |by_prio AS MATERIALIZED (
       |  SELECT o_orderpriority, SUM(y) AS sy_p, COUNT(*) AS n_p
       |  FROM base GROUP BY 1),
       |gstat AS MATERIALIZED (
       |  SELECT SUM(y) AS sy, COUNT(*) AS n FROM base)
       |SELECT o_orderkey, o_custkey, o_orderpriority,
       |  CAST(y AS INTEGER) AS y,
       |  ${enc("sy_c", "n_c")} AS enc_cust_micro,
       |  ${enc("sy_p", "n_p")} AS enc_prio_micro
       |FROM base
       |JOIN by_cust USING (o_custkey)
       |JOIN by_prio USING (o_orderpriority), gstat""".stripMargin
  }
}
