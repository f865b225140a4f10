package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** ZIPF-LAW FIT of the corpus vocabulary (Zipf 1949) — the power-law
  * diagnostic every corpus card quotes: regress ln(freq) on ln(rank)
  * over the word-frequency table; natural language sits near slope
  * −1, and a corpus whose slope drifts far from its baseline has
  * changed character (boilerplate floods flatten it, template spam
  * steepens it). Reported: slope, intercept, and R² of the log-log
  * fit, plus the vocabulary size.
  *
  * DETERMINISM. Both regressors are libm logs, so each is quantized
  * ONCE to integer micronats on its own bounded domain (ln(rank) over
  * ranks, ln(freq) over counts — the [[CorpusOps]] lm_score
  * convention); the five OLS sufficient statistics are then exact
  * DECIMAL(38,0) sums of integer products (the
  * [[graft.operators.CorrMatrix]] shape) and slope/intercept/R² are
  * mirrored double expressions of them.
  *
  * SCALE. One tokenize scan → the vocabulary table (type-bounded);
  * ONE two-level global row number for ranks; a 1-row integer
  * aggregate. */
object Zipf {

  /** One row: (v, slope_micro, intercept_micro, r2_micro). */
  def zipfFit(docs: DataFrame): DataFrame = {
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
    val ranked = graft.operators.RowNumbering.withGlobalRowNumber(
      vocab, Seq(col("f").desc, col("w").asc), "r")
    def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    val pts = ranked.select(
      expr("cast(round(ln(cast(r as double)) * 1000000.0) as bigint)")
        .as("x"),
      expr("cast(round(ln(cast(f as double)) * 1000000.0) as bigint)")
        .as("y"))
    val suff = pts.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(d38(col("x")) * col("x")).as("sxx"),
      sum(d38(col("y")) * col("y")).as("syy"),
      sum(d38(col("x")) * col("y")).as("sxy"))
    suff.selectExpr("n as v",
        "n * sxx - sx * cast(sx as decimal(38,0)) as vx",
        "n * syy - sy * cast(sy as decimal(38,0)) as vy",
        "n * sxy - sx * cast(sy as decimal(38,0)) as cxy",
        "sx", "sy", "n")
      .selectExpr("cast(v as bigint) as v",
        """case when vx = 0 then 0L else
          | cast(round(1000000.0 * cast(cxy as double) / cast(vx as double))
          |   as bigint) end as slope_micro"""
          .stripMargin.replace("\n", " "),
        """case when vx = 0 then 0L else
          | cast(round((cast(sy as double) - (cast(cxy as double)
          |     / cast(vx as double)) * sx) / n) as bigint) end
          | as intercept_micro""".stripMargin.replace("\n", " "),
        """case when vx = 0 or vy = 0 then 0L else
          | cast(round(1000000.0 * cast(cxy as double) * cast(cxy as double)
          |   / (cast(vx as double) * cast(vy as double))) as bigint) end
          | as r2_micro""".stripMargin.replace("\n", " "))
  }

  def qZipf(spark: SparkSession, dir: String): DataFrame =
    zipfFit(Tables(spark, dir, "documents"))

  val qZipfSql: String =
    """WITH vocab AS MATERIALIZED (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> '' GROUP BY w),
      |ranked AS (
      |  SELECT f, row_number() OVER (ORDER BY f DESC, w ASC) AS r
      |  FROM vocab),
      |pts AS (
      |  SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT)
      |      AS x,
      |    CAST(round(ln(CAST(f AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
      |  FROM ranked),
      |suff AS (
      |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      |  FROM pts),
      |derived AS (
      |  SELECT n, sx, sy,
      |    n * sxx - sx * sx AS vx,
      |    n * syy - sy * sy AS vy,
      |    n * sxy - sx * sy AS cxy
      |  FROM suff)
      |SELECT CAST(n AS BIGINT) AS v,
      |  CASE WHEN vx = 0 THEN 0 ELSE
      |    CAST(round(1000000.0 * CAST(cxy AS DOUBLE) / CAST(vx AS DOUBLE))
      |      AS BIGINT) END AS slope_micro,
      |  CASE WHEN vx = 0 THEN 0 ELSE
      |    CAST(round((CAST(sy AS DOUBLE) - (CAST(cxy AS DOUBLE)
      |        / CAST(vx AS DOUBLE)) * sx) / n) AS BIGINT) END
      |    AS intercept_micro,
      |  CASE WHEN vx = 0 OR vy = 0 THEN 0 ELSE
      |    CAST(round(1000000.0 * CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE)
      |      / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE))) AS BIGINT) END
      |    AS r2_micro
      |FROM derived""".stripMargin
}
