package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** CUMULATIVE GAINS / LIFT CURVE — the model-consumer's view of the
  * quality scorer the calibration family grades from the model's
  * side: rank documents by the KN score, cut into deciles, and ask
  * "if I keep only the top d/10, what fraction of the truly-good
  * documents do I capture, and at what lift over random?"
  *
  *   gain(d) = cumPos(d) / totalPos,
  *   lift(d) = (cumPos(d)·totalN) / (cumN(d)·totalPos).
  *
  * The decile where lift crosses 1 is where the scorer stops adding
  * value — the keep-budget number a curation plan reads off directly
  * (where [[IsotonicCal]] answers "is the probability honest" and
  * [[graft.ext.CorpusOps.qClassifierEval]] "is the ranking right").
  *
  * DETERMINISM. Ranks are the scalable two-level row number with
  * doc_id tie-break; decile = the exact ntile identity
  * (rn−1)·10 div n + 1; counts are exact integers; gain/lift are
  * cross-multiplied integers entering one rounded double each.
  *
  * SCALE. The scoring join is [[KneserNey]]'s memoized-model scan;
  * one global row number (two-level, never single-partition), a
  * 10-row decile table, bounded windows after. */
object GainsCurve {

  def gainsCurve(sl: DataFrame): DataFrame = {
    val n = sl.count()
    val ranked = graft.operators.RowNumbering.withGlobalRowNumber(
      sl.select(col("doc_id"), col("s"), col("y")),
      Seq(col("s").desc, col("doc_id").asc), "rn")
    val deciles = ranked
      .selectExpr("y", s"(rn - 1) * 10 div ${math.max(n, 1L)} + 1"
        + " as decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_d"), sum(col("y").cast("bigint")).as("pos_d"))
    val cum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = deciles.agg(sum("n_d").as("tn"), sum("pos_d").as("tp"))
    deciles.crossJoin(broadcast(tot))
      .withColumn("cum_n", sum(col("n_d")).over(cum))
      .withColumn("cum_pos", sum(col("pos_d")).over(cum))
      .selectExpr("decile", "n_d", "pos_d", "cum_n", "cum_pos",
        """case when tp = 0 then 0 else
          |cast(round(1000000.0 * cast(cum_pos as double)
          |  / cast(tp as double)) as bigint) end as gain_micro"""
          .stripMargin.replace("\n", " "),
        """case when tp = 0 or cum_n = 0 then 0 else
          |cast(round(1000000.0 * cast(cum_pos as double)
          |  * cast(tn as double)
          |  / (cast(cum_n as double) * cast(tp as double)))
          | as bigint) end as lift_micro"""
          .stripMargin.replace("\n", " "))
      .orderBy("decile")
  }

  def qGainsCurve(spark: SparkSession, dir: String): DataFrame =
    gainsCurve(IsotonicCal.scoredLabeled(spark, dir))

  val qGainsCurveSql: String =
    s"""WITH ${IsotonicCal.slCtes},
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sl),
       |ranked AS (
       |  SELECT y, row_number() OVER (ORDER BY s DESC, doc_id ASC)
       |    AS rn FROM sl),
       |deciles AS (
       |  SELECT (rn - 1) * 10 // (SELECT GREATEST(n, 1) FROM nn) + 1
       |      AS decile,
       |    CAST(COUNT(*) AS BIGINT) AS n_d,
       |    CAST(SUM(y) AS BIGINT) AS pos_d
       |  FROM ranked GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_d) AS BIGINT) AS tn,
       |    CAST(SUM(pos_d) AS BIGINT) AS tp FROM deciles),
       |curve AS (
       |  SELECT decile, n_d, pos_d,
       |    CAST(SUM(n_d) OVER w AS BIGINT) AS cum_n,
       |    CAST(SUM(pos_d) OVER w AS BIGINT) AS cum_pos, tn, tp
       |  FROM deciles, tot
       |  WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
       |SELECT decile, n_d, pos_d, cum_n, cum_pos,
       |  CASE WHEN tp = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(cum_pos AS DOUBLE)
       |      / CAST(tp AS DOUBLE)) AS BIGINT) END AS gain_micro,
       |  CASE WHEN tp = 0 OR cum_n = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(cum_pos AS DOUBLE)
       |      * CAST(tn AS DOUBLE)
       |      / (CAST(cum_n AS DOUBLE) * CAST(tp AS DOUBLE)))
       |      AS BIGINT) END AS lift_micro
       |FROM curve
       |ORDER BY decile""".stripMargin
}
