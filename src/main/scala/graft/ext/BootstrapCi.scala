package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** BOOTSTRAP CONFIDENCE INTERVALS for the retrieval eval panel — the
  * statistical-rigor step between "the metric moved" and "the metric
  * moved beyond query-sampling noise" (Efron 1979; the standard IR
  * practice for small query panels, e.g. TREC's paired bootstrap):
  * resample the [[RetrievalEval.evalQueries]]-query panel WITH
  * replacement B times, recompute the panel total per resample, and
  * report nearest-rank percentile bounds of the resample distribution.
  *
  * Determinism: resampling is SEEDED — draw (b, i) selects query
  * md5-coin(b, i) mod |panel| (the repo's seeded-sampler convention),
  * so the oracle replays every draw. Per-query metrics are quantized
  * to micro units BEFORE panel summation (round(metric·10⁶) BIGINT),
  * so every resample total is an exact integer sum — engine-identical
  * regardless of SUM order, the BM25-lesson posture — and ALL output
  * columns are integers.
  *
  * Plan shape: the panel is the memoizable 8-row metrics table; draws
  * are a generated B×k table (bounded: 1600 rows) broadcast-joined to
  * the panel; stats are windows over B-row groups. Nothing here
  * scales with the corpus — the corpus-sized work is inside
  * [[RetrievalEval.qRetrievalMetrics]], paid once. */
object BootstrapCi {

  /** Resamples. Nearest-rank picks at B=200: lo=5 (2.5%), med=100,
    * hi=195 (97.5%). */
  val bootB = 200
  val salt = "graft-boot"

  private def rankPick(p: Double): Int = math.ceil(p * bootB).toInt

  /** CI rows over a (q_id, metric..., ...) panel: one row per metric,
    * (metric, observed_micro, lo_micro, med_micro, hi_micro). */
  def bootstrapCi(panel: DataFrame, metricCols: Seq[String]): DataFrame = {
    val spark = panel.sparkSession
    // the panel would be evaluated three times below (count, draws
    // join, observed row): collect its BOUNDED rows once (a query
    // panel is 8–10⁴ rows — driver metadata, the IVF-centroid
    // contract) and rebuild a local frame, so the corpus-scale eval
    // inside it runs once and nothing is checkpoint-pinned
    val microPlan = panel.select(
      (col("q_id") +: metricCols.map(c =>
        round(col(c) * 1e6).cast(LongType).as(s"${c}_micro"))): _*)
    val microRows = microPlan.collect()
    val micro = spark.createDataFrame(
      java.util.Arrays.asList(microRows: _*), microPlan.schema)
    val nq = microRows.length.toLong
    val draws = spark.range(bootB).select(col("id").as("b"))
      .select(col("b"), explode(sequence(lit(0L), lit(nq - 1))).as("i"))
      .select(col("b"),
        (conv(substring(md5(concat(lit(salt + ":"),
          col("b").cast("string"), lit(":"),
          col("i").cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast(LongType) % nq).as("q_id"))
    val totCols = metricCols.map(c => sum(col(s"${c}_micro")).as(c))
    val tots = draws.join(broadcast(micro), "q_id")
      .groupBy("b").agg(totCols.head, totCols.tail: _*)
    val stacked = tots.selectExpr("b",
      s"stack(${metricCols.size}, " + metricCols.map(c => s"'$c', $c")
        .mkString(", ") + ") as (metric, tot)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("metric").orderBy(col("tot").asc, col("b").asc)
    val picks = stacked.withColumn("r", row_number().over(w))
      .groupBy("metric").agg(
        max(when(col("r") === rankPick(0.025), col("tot"))).as("lo_micro"),
        max(when(col("r") === rankPick(0.5), col("tot"))).as("med_micro"),
        max(when(col("r") === rankPick(0.975), col("tot"))).as("hi_micro"))
    val obs = micro.agg(
      metricCols.map(c => sum(col(s"${c}_micro")).as(c)).head,
      metricCols.map(c => sum(col(s"${c}_micro")).as(c)).tail: _*)
      .selectExpr(s"stack(${metricCols.size}, " +
        metricCols.map(c => s"'$c', $c").mkString(", ") +
        ") as (metric, observed_micro)")
    obs.join(picks, "metric")
      .select("metric", "observed_micro", "lo_micro", "med_micro",
        "hi_micro")
      .orderBy("metric")
  }

  /** Driver query: CI over the LSH-serving eval panel's three
    * metrics. The panel build (the corpus-sized leg) is exactly
    * [[RetrievalEval.qRetrievalMetrics]]. */
  def qBootstrapCi(spark: SparkSession, dir: String): DataFrame =
    bootstrapCi(RetrievalEval.qRetrievalMetrics(spark, dir),
      Seq("recall_at_k", "mrr", "ndcg"))

  val qBootstrapCiSql: String = {
    val metricCols = Seq("recall_at_k", "mrr", "ndcg")
    val micros = metricCols.map(c =>
      s"CAST(round($c * 1000000.0) AS BIGINT) AS ${c}_micro").mkString(",\n    ")
    val sums = metricCols.map(c =>
      s"CAST(SUM(${c}_micro) AS BIGINT) AS $c").mkString(",\n    ")
    val stackLegs = metricCols.map(c =>
      s"SELECT b, '$c' AS metric, $c AS tot FROM tots").mkString(
      "\n  UNION ALL\n  ")
    val obsLegs = metricCols.map(c =>
      s"SELECT '$c' AS metric, $c AS observed_micro FROM obs0").mkString(
      "\n  UNION ALL\n  ")
    s"""WITH panel AS MATERIALIZED (
      |${RetrievalEval.qRetrievalMetricsSql.linesIterator
           .map("  " + _).mkString("\n")}
      |),
      |micro AS MATERIALIZED (
      |  SELECT q_id,
      |    $micros
      |  FROM panel),
      |nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM micro),
      |draws AS MATERIALIZED (
      |  SELECT b, CAST(('0x' || substr(md5('$salt:' || CAST(b AS VARCHAR)
      |      || ':' || CAST(i AS VARCHAR)), 1, 8)) AS UBIGINT)
      |      % (SELECT n FROM nq) AS q_id
      |  FROM UNNEST(generate_series(0, ${bootB - 1})) AS tb(b),
      |    LATERAL (SELECT UNNEST(generate_series(0,
      |      (SELECT n FROM nq) - 1)) AS i) ti),
      |tots AS MATERIALIZED (
      |  SELECT d.b,
      |    $sums
      |  FROM draws d JOIN micro m USING (q_id) GROUP BY d.b),
      |stacked AS (
      |  $stackLegs),
      |ranked AS (
      |  SELECT metric, tot,
      |    ROW_NUMBER() OVER (PARTITION BY metric
      |      ORDER BY tot ASC, b ASC) AS r
      |  FROM stacked),
      |picks AS (
      |  SELECT metric,
      |    MAX(CASE WHEN r = ${rankPick(0.025)} THEN tot END) AS lo_micro,
      |    MAX(CASE WHEN r = ${rankPick(0.5)} THEN tot END) AS med_micro,
      |    MAX(CASE WHEN r = ${rankPick(0.975)} THEN tot END) AS hi_micro
      |  FROM ranked GROUP BY metric),
      |obs0 AS (
      |  SELECT
      |    $sums
      |  FROM micro),
      |obs AS (
      |  $obsLegs)
      |SELECT o.metric, o.observed_micro, p.lo_micro, p.med_micro,
      |  p.hi_micro
      |FROM obs o JOIN picks p USING (metric)
      |ORDER BY o.metric""".stripMargin
  }
}
