package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-ORDER (Morton) clustering key — multi-dimensional data layout for
  * scan pruning: interleaving the bits of two join/filter dimensions
  * gives a 1-D sort key under which ranges of EITHER dimension map to
  * a bounded number of key ranges, so sorting (or range-sharding)
  * files by z-value lets min/max footer statistics prune scans on both
  * columns at once — the layout technique behind Delta/Iceberg
  * `ZORDER BY`, expressed as a plain codegen'd integer expression (the
  * classic magic-mask bit spread, no UDF).
  *
  * The query emits the z-value of (l_partkey, l_suppkey) low 16 bits
  * plus the derived 256-way range shard — the write-side partitioner a
  * deployment would `repartitionByRange` on before writing parquet.
  * Map-only; the oracle replays the identical bit arithmetic, so the
  * whole key derivation is hash-checked. */
object ZOrder {

  /** Bit-spread of a 16-bit value across the even bits of 32
    * (x → x₁₅0x₁₄0…x₀), as an expression string: the standard
    * mask-and-shift doubling ladder. `shl` abstracts shift syntax —
    * Spark SQL spells it `shiftleft(e, n)`, DuckDB `(e << n)`. */
  private def spread(v: String, shl: (String, Int) => String): String =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
      (1, 0x55555555L))
      .foldLeft(v) { case (e, (s, mask)) =>
        s"(($e | ${shl(e, s)}) & $mask)"
      }

  /** Full z-value expression over two 16-bit dims, engine-agnostic. */
  private def zExpr(a: String, b: String,
                    shl: (String, Int) => String): String =
    s"(${spread(a, shl)} | ${shl(spread(b, shl), 1)})"

  private val aCol = "(CAST(l_partkey % 65536 AS BIGINT))"
  private val bCol = "(CAST(l_suppkey % 65536 AS BIGINT))"

  /** 256 range shards over the 32-bit z space: 2³² / 256 = 2²⁴. */
  private val shardDiv = 16777216L

  def qZorder(spark: SparkSession, dir: String): DataFrame = {
    val z = zExpr(aCol, bCol, (e, n) => s"shiftleft($e, $n)")
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        expr(z).as("zval"))
      .withColumn("shard", expr(s"zval div $shardDiv").cast("int"))
  }

  val qZorderSql: String = {
    val z = zExpr(aCol, bCol, (e, n) => s"($e << $n)")
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  $z AS zval,
       |  CAST($z // $shardDiv AS INTEGER) AS shard
       |FROM lineitem""".stripMargin
  }
}
