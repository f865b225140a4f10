package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** SIMPSON DIVERSITY OF THE SOURCE MIX (Simpson 1949; Hunter-Gaston
  * in its unbiased form) — the concentration lens on corpus
  * composition the entropy readouts don't give exactly: per language,
  * the probability two documents drawn WITHOUT replacement come from
  * different sources,
  *
  *   D = 1 − Σ_s n_s·(n_s−1) / (N·(N−1)),
  *
  * and its inverse-Simpson effective source count 1/(1−D)… here the
  * standard "effective number of sources" 1/Σp² reported from the
  * same sums. A language whose D collapses is being fed by one
  * source — the mixture-plan red flag ([[graft.ext.SourceAblation]]
  * says WHICH source; this says HOW concentrated).
  *
  * DETERMINISM. Σ n(n−1) and N(N−1) are EXACT integers (the
  * [[graft.operators.Lorenz]] cross-multiplication posture, carried
  * in DECIMAL(38,0)/HUGEINT); D is one integer-ratio rounding and
  * the effective count one double division of exact integers.
  *
  * SCALE. One (lang, source) partial agg — grid bounded both ways —
  * then grid-sized sums. */
object SimpsonDiversity {

  /** Per-language: (lang, n_docs, n_sources, d_micro,
    * eff_sources_micro). */
  def simpsonDiversity(docs: DataFrame): DataFrame =
    docs.groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .groupBy("lang").agg(
        sum("n").as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum(col("n").cast(DecimalType(38, 0)) * (col("n") - 1L))
          .as("pair_mass"),
        sum(col("n").cast(DecimalType(38, 0)) * col("n")).as("sq_mass"))
      .selectExpr("lang", "n_docs", "n_sources",
        """case when n_docs <= 1 then 0 else
          |cast(round(1000000.0 * (1.0 - cast(pair_mass as double)
          |  / (cast(n_docs as double) * (cast(n_docs as double) - 1.0))))
          | as bigint) end as d_micro""".stripMargin.replace("\n", " "),
        """case when sq_mass = 0 then 0 else
          |cast(round(1000000.0 * cast(n_docs as double)
          |  * cast(n_docs as double) / cast(sq_mass as double))
          | as bigint) end as eff_sources_micro"""
          .stripMargin.replace("\n", " "))
      .orderBy("lang")

  def qSimpsonDiversity(spark: SparkSession, dir: String): DataFrame =
    simpsonDiversity(Tables(spark, dir, "documents"))

  val qSimpsonDiversitySql: String =
    """WITH grid AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2),
      |agg AS (
      |  SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs,
      |    CAST(COUNT(*) AS BIGINT) AS n_sources,
      |    SUM(CAST(n AS HUGEINT) * (n - 1)) AS pair_mass,
      |    SUM(CAST(n AS HUGEINT) * n) AS sq_mass
      |  FROM grid GROUP BY lang)
      |SELECT lang, n_docs, n_sources,
      |  CASE WHEN n_docs <= 1 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * (1.0 - CAST(pair_mass AS DOUBLE)
      |      / (CAST(n_docs AS DOUBLE) * (CAST(n_docs AS DOUBLE) - 1.0))))
      |      AS BIGINT) END AS d_micro,
      |  CASE WHEN sq_mass = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * CAST(n_docs AS DOUBLE)
      |      * CAST(n_docs AS DOUBLE) / CAST(sq_mass AS DOUBLE))
      |      AS BIGINT) END AS eff_sources_micro
      |FROM agg
      |ORDER BY lang""".stripMargin
}
