package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ODDS RATIO / RELATIVE RISK (Cornfield 1951; the 2×2 epidemiology
  * readout) for the conversion experiment — the MULTIPLICATIVE
  * effect framing the additive lift readouts (ab_test, bayes_ab)
  * don't give, with the Woolf log-OR interval:
  *
  *   OR = (a·d) / (b·c),   RR = (a/(a+b)) / (c/(c+d)),
  *   CI = exp(ln OR ± z·sqrt(1/a + 1/b + 1/c + 1/d))
  *
  * over the cells a = treated converters, b = treated
  * non-converters, c/d the control row.
  *
  * DETERMINISM. Cells are exact integers off the shared
  * [[AbTest.perUserArm]] scan; ln OR is computed from the exact
  * integer cross products a·d and b·c in DECIMAL(38,0)/HUGEINT (so
  * the products survive 100 TB user counts) and enters ONE
  * fully-double-cast expression per output ([[BayesAb]] posture).
  * Zero cells surface as or_defined = false with the cells visible —
  * never a Haldane fudge applied silently.
  *
  * SCALE. One scan → per-user agg → ONE 4-cell aggregate row. */
object OddsRatio {

  def oddsRatio(events: DataFrame): DataFrame =
    oddsFromPerUser(AbTest.perUserArm(events))

  private def lnOr: String =
    """ln(cast(a as double) * cast(d as double)
      | / (cast(b as double) * cast(c as double)))"""
      .stripMargin.replace("\n", " ")

  private def halfWidth: String =
    """1.959964 * sqrt(1.0 / cast(a as double) + 1.0 / cast(b as double)
      | + 1.0 / cast(c as double) + 1.0 / cast(d as double))"""
      .stripMargin.replace("\n", " ")

  /** Readout from any (arm, purchases) per-user frame (streaming-store
    * entry): (a, b, c, d, or_defined, or_micro, rr_micro,
    * or_lo_micro, or_hi_micro, significant). */
  def oddsFromPerUser(pu: DataFrame): DataFrame =
    pu.agg(
        sum(when(col("arm") === 1 && col("purchases") >= AbTest.convMin,
          1L).otherwise(0L)).as("a"),
        sum(when(col("arm") === 1 && col("purchases") < AbTest.convMin,
          1L).otherwise(0L)).as("b"),
        sum(when(col("arm") === 0 && col("purchases") >= AbTest.convMin,
          1L).otherwise(0L)).as("c"),
        sum(when(col("arm") === 0 && col("purchases") < AbTest.convMin,
          1L).otherwise(0L)).as("d"))
      .selectExpr("a", "b", "c", "d",
        "a > 0 and b > 0 and c > 0 and d > 0 as or_defined",
        s"""case when a = 0 or b = 0 or c = 0 or d = 0 then 0 else
           |cast(round(1000000.0 * cast(a as double) * cast(d as double)
           |  / (cast(b as double) * cast(c as double))) as bigint) end
           |as or_micro""".stripMargin.replace("\n", " "),
        """case when a + b = 0 or c = 0 then 0 else
          |cast(round(1000000.0
          |  * (cast(a as double) / (cast(a as double) + b))
          |  / (cast(c as double) / (cast(c as double) + d))) as bigint)
          |end as rr_micro""".stripMargin.replace("\n", " "),
        s"""case when a = 0 or b = 0 or c = 0 or d = 0 then 0 else
           |cast(round(1000000.0 * exp($lnOr - $halfWidth)) as bigint)
           |end as or_lo_micro""".stripMargin.replace("\n", " "),
        s"""case when a = 0 or b = 0 or c = 0 or d = 0 then 0 else
           |cast(round(1000000.0 * exp($lnOr + $halfWidth)) as bigint)
           |end as or_hi_micro""".stripMargin.replace("\n", " "))
      .withColumn("significant",
        col("or_defined") &&
          (col("or_lo_micro") > 1000000L || col("or_hi_micro") < 1000000L))

  def qOddsRatio(spark: SparkSession, dir: String): DataFrame =
    oddsRatio(Tables(spark, dir, "events"))

  val qOddsRatioSql: String = {
    val m = AbTest.convMin
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS purchases,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS arm
       |  FROM events GROUP BY user_id),
       |cells AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN arm = 1 AND purchases >= $m THEN 1
       |      ELSE 0 END) AS BIGINT) AS a,
       |    CAST(SUM(CASE WHEN arm = 1 AND purchases < $m THEN 1
       |      ELSE 0 END) AS BIGINT) AS b,
       |    CAST(SUM(CASE WHEN arm = 0 AND purchases >= $m THEN 1
       |      ELSE 0 END) AS BIGINT) AS c,
       |    CAST(SUM(CASE WHEN arm = 0 AND purchases < $m THEN 1
       |      ELSE 0 END) AS BIGINT) AS d
       |  FROM pu),
       |o AS (
       |  SELECT a, b, c, d,
       |    a > 0 AND b > 0 AND c > 0 AND d > 0 AS or_defined,
       |    CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN 0 ELSE
       |      CAST(ROUND(1000000.0 * CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
       |        / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))) AS BIGINT) END
       |      AS or_micro,
       |    CASE WHEN a + b = 0 OR c = 0 THEN 0 ELSE
       |      CAST(ROUND(1000000.0
       |        * (CAST(a AS DOUBLE) / (CAST(a AS DOUBLE) + b))
       |        / (CAST(c AS DOUBLE) / (CAST(c AS DOUBLE) + d)))
       |        AS BIGINT) END AS rr_micro,
       |    CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN 0 ELSE
       |      CAST(ROUND(1000000.0 * exp($lnOr - $halfWidth)) AS BIGINT)
       |      END AS or_lo_micro,
       |    CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN 0 ELSE
       |      CAST(ROUND(1000000.0 * exp($lnOr + $halfWidth)) AS BIGINT)
       |      END AS or_hi_micro
       |  FROM cells)
       |SELECT *,
       |  or_defined AND (or_lo_micro > 1000000 OR or_hi_micro < 1000000)
       |    AS significant
       |FROM o""".stripMargin
  }
}
