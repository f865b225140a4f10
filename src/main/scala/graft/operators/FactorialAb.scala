package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** 2×2 FACTORIAL EXPERIMENT (Fisher 1935; the "two features shipped
  * at once" readout): derive a SECOND independent coin from a
  * disjoint md5 nibble of the user id, split users into the four
  * cells, and report both main effects and the INTERACTION contrast
  *
  *   int = (m₁₁ − m₁₀) − (m₀₁ − m₀₀)
  *
  * with its z against the four-cell pooled standard error — the
  * question a pair of parallel A/B readouts structurally cannot
  * answer ("do the features help each other or cancel?").
  *
  * DETERMINISM. The second coin reads md5 hex digit 16 (digits 1–15
  * are [[AbTest.armOf]]'s coin — disjoint bits, independent by the
  * md5 avalanche); per-cell n/Σ/Σ² are exact integers in
  * DECIMAL(38,0)/HUGEINT; the contrasts and z are fully-double-cast
  * shared-text expressions over twelve exact integers. Any empty
  * cell pins every contrast to 0 with the counts visible.
  *
  * SCALE. One scan → per-user agg → ONE 4-cell aggregate row. */
object FactorialAb {

  /** Second coin: md5 hex digit 16 of the user id, mod 2. */
  def armBOf(user: Column): Column =
    conv(substring(md5(user.cast(StringType).cast(BinaryType)), 16, 1),
      16, 10).cast(LongType) % 2

  private val cells = Seq("00", "01", "10", "11")

  private def m(c: String) =
    s"(cast(s_$c as double) / cast(n_$c as double))"
  private def vOverN(c: String) =
    s"""((cast(ss_$c as double) / cast(n_$c as double)
       | - ${m(c)} * ${m(c)}) / (cast(n_$c as double) - 1.0))"""
      .stripMargin.replace("\n", " ")
  private def guard: String =
    cells.map(c => s"n_$c <= 1").mkString(" or ")
  private def micro(x: String): String =
    s"cast(round(1000000.0 * ($x)) as bigint)"

  private def aEffect =
    s"(${m("11")} + ${m("10")}) / 2.0 - (${m("01")} + ${m("00")}) / 2.0"
  private def bEffect =
    s"(${m("11")} + ${m("01")}) / 2.0 - (${m("10")} + ${m("00")}) / 2.0"
  private def interaction =
    s"(${m("11")} - ${m("10")}) - (${m("01")} - ${m("00")})"
  private def zInt =
    s"""($interaction) / sqrt(${cells.map(vOverN).mkString(" + ")})"""

  def factorialAb(events: DataFrame): DataFrame =
    factorialFromPerUser(events.groupBy("user_id").agg(
        sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100.0) as bigint)")).otherwise(0L))
          .as("cents"))
      .withColumn("a", AbTest.armOf(col("user_id")))
      .withColumn("b", armBOf(col("user_id"))))

  /** The readout from any (a, b, cents) per-user frame. */
  def factorialFromPerUser(pu: DataFrame): DataFrame = {
    val aggs = cells.flatMap { c =>
      val (a, b) = (c(0).asDigit, c(1).asDigit)
      Seq(
        sum(when(col("a") === a && col("b") === b, 1L).otherwise(0L))
          .as(s"n_$c"),
        sum(when(col("a") === a && col("b") === b, col("cents"))
          .otherwise(0L)).cast(DecimalType(38, 0)).as(s"s_$c"),
        sum(when(col("a") === a && col("b") === b,
          col("cents").cast(DecimalType(38, 0)) * col("cents"))
          .otherwise(lit(0).cast(DecimalType(38, 0)))).as(s"ss_$c"))
    }
    pu.agg(aggs.head, aggs.tail: _*)
      .selectExpr(Seq("n_00", "n_01", "n_10", "n_11") ++ Seq(
        s"case when $guard then 0 else ${micro(aEffect)} end"
          + " as a_effect_micro",
        s"case when $guard then 0 else ${micro(bEffect)} end"
          + " as b_effect_micro",
        s"case when $guard then 0 else ${micro(interaction)} end"
          + " as int_micro",
        s"case when $guard then 0 else ${micro(zInt)} end"
          + " as z_int_micro"): _*)
      .withColumn("interaction_sig",
        abs(col("z_int_micro")) >= AbTest.zCritMicro)
  }

  def qFactorialAb(spark: SparkSession, dir: String): DataFrame =
    factorialAb(Tables(spark, dir, "events"))

  val qFactorialAbSql: String = {
    val cellSql = cells.flatMap { c =>
      val (a, b) = (c(0).asDigit, c(1).asDigit)
      Seq(
        s"""CAST(SUM(CASE WHEN a = $a AND b = $b THEN 1 ELSE 0 END)
           | AS BIGINT) AS n_$c""".stripMargin.replace("\n", " "),
        s"""SUM(CASE WHEN a = $a AND b = $b THEN CAST(cents AS HUGEINT)
           | ELSE 0 END) AS s_$c""".stripMargin.replace("\n", " "),
        s"""SUM(CASE WHEN a = $a AND b = $b
           | THEN CAST(cents AS HUGEINT) * cents
           | ELSE 0 END) AS ss_$c""".stripMargin.replace("\n", " "))
    }.mkString(",\n       |    ")
    s"""WITH pu AS MATERIALIZED (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END)
       |      AS cents,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
       |      AS UBIGINT) AS BIGINT) % 2 AS a,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 16, 1)
       |      AS UBIGINT) AS BIGINT) % 2 AS b
       |  FROM events GROUP BY user_id),
       |agg AS (
       |  SELECT
       |    $cellSql
       |  FROM pu)
       |SELECT n_00, n_01, n_10, n_11,
       |  CASE WHEN $guard THEN 0 ELSE ${micro(aEffect)} END
       |    AS a_effect_micro,
       |  CASE WHEN $guard THEN 0 ELSE ${micro(bEffect)} END
       |    AS b_effect_micro,
       |  CASE WHEN $guard THEN 0 ELSE ${micro(interaction)} END
       |    AS int_micro,
       |  CASE WHEN $guard THEN 0 ELSE ${micro(zInt)} END
       |    AS z_int_micro,
       |  ABS(CASE WHEN $guard THEN 0 ELSE ${micro(zInt)} END)
       |    >= ${AbTest.zCritMicro} AS interaction_sig
       |FROM agg""".stripMargin
  }
}
