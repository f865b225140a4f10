package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** EFFECTIVE SAMPLE SIZE OF IMPORTANCE WEIGHTS (Kong 1992; the
  * Kish/IS diagnostic) for the DSIR resampler — the number that says
  * whether importance weighting is ABOUT to collapse: when a few
  * documents carry most of exp(logw), a weighted estimate behaves
  * like a sample of
  *
  *   ESS = (Σ w)² / Σ w²
  *
  * documents, not n. ESS/n near 1 means benign weights; near 0 means
  * the [[CorpusOps.dsirResampleWith]] draw is effectively sampling a
  * handful of documents and the target/corpus mismatch is too large.
  *
  * DETERMINISM. Log-weights are [[CorpusOps.qDsirWeights]]' exact
  * micronat integers; each document's weight is max-normalized and
  * micro-quantized PER TERM (w_q = round(1e6·exp((logw − max)/1e6)) —
  * an integer, the [[graft.operators.KaplanMeier]] convention), so
  * both power sums are integer sums in DECIMAL(38,0)/HUGEINT and the
  * ESS is one double division. The quantized estimator is stated —
  * weights below ~1e−6 of the max round to zero mass, which is
  * precisely the collapse the readout exists to flag.
  *
  * SCALE. One pass over the |docs|-row weight table (the DSIR model
  * itself is memoized per session+dir) → 1 row. */
object Ess {

  /** 1-row readout from any (logw_micro) frame: (n_docs,
    * max_logw_micro, ess_micro, ess_frac_micro, collapsed). */
  def essFromWeights(wIn: DataFrame): DataFrame = {
    // the weight table feeds the 1-row max AND the quantize pass —
    // materialize once so the DSIR scoring join is paid once
    val (w, _) = graft.util.Checkpoints.checkpointTracked(wIn)
    val mx = w.agg(max(col("logw_micro")).as("mx"))
    w.crossJoin(broadcast(mx))
      .select(expr("""cast(round(1000000.0
                     | * exp((cast(logw_micro as double) - mx) / 1e6))
                     | as bigint)""".stripMargin.replace("\n", " "))
        .as("wq"), col("mx"))
      .groupBy("mx")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("wq").cast(DecimalType(38, 0))).as("s1"),
        sum((col("wq") * col("wq")).cast(DecimalType(38, 0))).as("s2"))
      .selectExpr("n_docs", "mx as max_logw_micro",
        """case when s2 = 0 then 0 else
          |cast(round(1000000.0 * cast(s1 as double) * cast(s1 as double)
          |  / cast(s2 as double)) as bigint) end as ess_micro"""
          .stripMargin.replace("\n", " "),
        """case when s2 = 0 or n_docs = 0 then 0 else
          |cast(round(1000000.0 * cast(s1 as double) * cast(s1 as double)
          |  / cast(s2 as double) / cast(n_docs as double)) as bigint)
          |end as ess_frac_micro""".stripMargin.replace("\n", " "))
      .withColumn("collapsed", col("ess_frac_micro") < 100000L)
  }

  def qEss(spark: SparkSession, dir: String): DataFrame = {
    val model = graft.util.SessionCache.memoize(spark, "dsir", dir) {
      CorpusOps.trainDsir(Tables(spark, dir, "documents"))
    }
    essFromWeights(CorpusOps.dsirWeightsWith(
      Tables(spark, dir, "documents"), model))
  }

  val qEssSql: String =
    s"""WITH dw AS MATERIALIZED (${CorpusOps.qDsirWeightsSql}),
       |mx AS (SELECT MAX(logw_micro) AS mx FROM dw),
       |wq AS (
       |  SELECT CAST(ROUND(1000000.0
       |      * exp((CAST(logw_micro AS DOUBLE) - mx) / 1e6)) AS BIGINT)
       |      AS wq, mx
       |  FROM dw, mx),
       |agg AS (
       |  SELECT mx, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    SUM(CAST(wq AS HUGEINT)) AS s1,
       |    SUM(CAST(wq AS HUGEINT) * wq) AS s2
       |  FROM wq GROUP BY mx)
       |SELECT n_docs, mx AS max_logw_micro,
       |  CASE WHEN s2 = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
       |      / CAST(s2 AS DOUBLE)) AS BIGINT) END AS ess_micro,
       |  CASE WHEN s2 = 0 OR n_docs = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
       |      / CAST(s2 AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS BIGINT)
       |    END AS ess_frac_micro,
       |  (CASE WHEN s2 = 0 OR n_docs = 0 THEN 0 ELSE
       |    CAST(ROUND(1000000.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
       |      / CAST(s2 AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS BIGINT)
       |    END) < 100000 AS collapsed
       |FROM agg""".stripMargin
}
