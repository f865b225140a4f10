package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** PAIRWISE CORRELATION MATRIX over lineitem's numeric measures — the
  * standard EDA/feature-screening primitive (which measures co-move;
  * which are redundant as model features; does discount actually bite
  * into price). Spark ships `corr`, but a float-mean two-pass (or
  * Welford fold) is order-dependent — not oracle-portable — so the
  * engine computes the six Pearson coefficients from EXACT sufficient
  * statistics instead:
  *
  *  - each 2-decimal measure is scaled to integer centi-units
  *    (round(x·100) as BIGINT — [[Aggregates.dsum]]'s convention);
  *  - ONE partial-agg scan accumulates n, Σc per column and Σc·c' per
  *    pair (products computed in long — ≤1e14 — and summed in
  *    DECIMAL(38,0) / HUGEINT, exact in both engines at any corpus
  *    size);
  *  - r = (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) evaluates in
  *    doubles from those exact integers — identical trees, identical
  *    bits. Scale factors cancel in r, so centi-units change nothing
  *    semantically.
  *
  * Plan: one scan, 15 aggregate expressions, ten 0-D results carved
  * into the 6-row matrix by an inline stack — the [[DataQuality]]
  * wide-agg shape. At 100 TB this is the canonical map-side-combine
  * aggregate: shuffle is one row per partition. */
object CorrMatrix {

  private val cols = Seq("l_quantity", "l_extendedprice", "l_discount",
    "l_tax")

  private def centi(c: String): Column =
    round(col(c) * 100.0).cast(LongType)

  /** The 6 pairwise Pearson correlations: (col_x, col_y, n, r). */
  def qCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
        cols.map(c => sum(centi(c)).as(s"s_$c")) ++
        cols.map(c =>
          sum((centi(c) * centi(c)).cast(DecimalType(38, 0)))
            .as(s"ss_$c")) ++
        pairs.map { case (x, y) =>
          sum((centi(x) * centi(y)).cast(DecimalType(38, 0)))
            .as(s"sp_${x}_$y")
        }
    val wide = li.agg(aggs.head, aggs.tail: _*)
    val arms = pairs.map { case (x, y) =>
      s"'$x', '$y', n, " +
        s"(cast(n as double) * cast(sp_${x}_$y as double) - " +
        s"cast(s_$x as double) * cast(s_$y as double)) / " +
        s"sqrt((cast(n as double) * cast(ss_$x as double) - " +
        s"cast(s_$x as double) * cast(s_$x as double)) * " +
        s"(cast(n as double) * cast(ss_$y as double) - " +
        s"cast(s_$y as double) * cast(s_$y as double)))"
    }
    wide.selectExpr(s"stack(${pairs.length}, ${arms.mkString(", ")})")
      .toDF("col_x", "col_y", "n", "r")
  }

  val qCorrMatrixSql: String = {
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    def c(name: String) = s"CAST(ROUND($name * 100.0) AS BIGINT)"
    val sums =
      cols.map(x => s"CAST(SUM(${c(x)}) AS BIGINT) AS s_$x") ++
      cols.map(x => s"SUM(CAST(${c(x)} * ${c(x)} AS HUGEINT)) AS ss_$x") ++
      pairs.map { case (x, y) =>
        s"SUM(CAST(${c(x)} * ${c(y)} AS HUGEINT)) AS sp_${x}_$y"
      }
    val arms = pairs.map { case (x, y) =>
      s"""SELECT '$x' AS col_x, '$y' AS col_y, n,
         |  (CAST(n AS DOUBLE) * CAST(sp_${x}_$y AS DOUBLE)
         |     - CAST(s_$x AS DOUBLE) * CAST(s_$y AS DOUBLE))
         |  / sqrt((CAST(n AS DOUBLE) * CAST(ss_$x AS DOUBLE)
         |            - CAST(s_$x AS DOUBLE) * CAST(s_$x AS DOUBLE))
         |         * (CAST(n AS DOUBLE) * CAST(ss_$y AS DOUBLE)
         |            - CAST(s_$y AS DOUBLE) * CAST(s_$y AS DOUBLE)))
         |    AS r
         |FROM wide""".stripMargin
    }
    s"""WITH wide AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    ${sums.mkString(",\n    ")}
       |  FROM lineitem)
       |${arms.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
