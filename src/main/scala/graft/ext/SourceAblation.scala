package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** LEAVE-ONE-OUT SOURCE ABLATION — the cheapest honest answer to
  * "which source is dragging corpus quality down?": for each source
  * s, the quality-gate pass rate of the corpus WITHOUT s versus the
  * full corpus (the data-ablation counterpart of per-source report
  * cards; cf. the source-mixture ablations in the Pile/RefinedWeb/
  * Dolma reports). A source with delta > 0 improves the corpus by its
  * removal — the signal a mixture planner acts on before any
  * expensive training ablation.
  *
  * The quality gate is [[TextOps.qQualityFilter]]'s three-predicate
  * gate (length / punctuation / stopword), re-used as a 0/1 flag so
  * every rate is EXACT INTEGER arithmetic: rate = 10⁶·pass div n,
  * loo = 10⁶·(P − pass_s) div (N − n_s), delta = loo − overall.
  *
  * SCALE SHAPE. ONE map-only scoring scan → |sources| (n, pass) rows;
  * totals broadcast back as a 1-row crossJoin. Degenerate guard: a
  * corpus that IS one source reports loo = 0 with ablatable = false
  * rather than a division by zero. */
object SourceAblation {

  /** Per-source LOO table from any (source, pass) frame (pass ∈
    * {0, 1}). */
  def sourceAblation(flags: DataFrame): DataFrame = {
    val per = flags.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("pass").as("n_pass"))
    val tot = per.agg(sum("n_docs").as("nn"), sum("n_pass").as("pp"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        expr("(1000000L * n_pass) div n_docs").as("pass_rate_micro"),
        expr("""case when nn - n_docs = 0 then 0L else
                | (1000000L * (pp - n_pass)) div (nn - n_docs) end"""
          .stripMargin.replace("\n", " ")).as("loo_rate_micro"),
        expr("""case when nn - n_docs = 0 then 0L else
                | (1000000L * (pp - n_pass)) div (nn - n_docs)
                | - (1000000L * pp) div nn end"""
          .stripMargin.replace("\n", " ")).as("delta_micro"),
        (col("nn") - col("n_docs") > 0L).as("ablatable"))
      .orderBy("source")
  }

  /** The shared gate flag: TextOps' quality predicates as 0/1. */
  def gateFlags(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    docs.select(col("source"),
      (length(col("text")) >= 100 &&
        (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
          greatest(length(col("text")), lit(1))) <= 0.3 &&
        (size(filter(t, x => x.isInCollection(TextOps.stopwords)))
          .cast("double") / size(t)) >= 0.01)
        .cast("long").as("pass"))
  }

  def qSourceAblation(spark: SparkSession, dir: String): DataFrame =
    sourceAblation(gateFlags(Tables(spark, dir, "documents")))

  val qSourceAblationSql: String =
    """WITH flags AS (
      |  SELECT source,
      |    CAST(length(text) >= 100
      |      AND CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |          / greatest(length(text), 1) <= 0.3
      |      AND CAST(len(list_filter(string_split(text, ' '),
      |            x -> x IN ('the', 'a', 'of', 'and', 'to')))
      |          AS DOUBLE) / len(string_split(text, ' ')) >= 0.01
      |      AS BIGINT) AS pass
      |  FROM documents),
      |per AS MATERIALIZED (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(pass) AS BIGINT) AS n_pass
      |  FROM flags GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
      |    CAST(SUM(n_pass) AS BIGINT) AS pp FROM per)
      |SELECT source, n_docs,
      |  (1000000 * n_pass) // n_docs AS pass_rate_micro,
      |  CASE WHEN nn - n_docs = 0 THEN 0 ELSE
      |    (1000000 * (pp - n_pass)) // (nn - n_docs) END AS loo_rate_micro,
      |  CASE WHEN nn - n_docs = 0 THEN 0 ELSE
      |    (1000000 * (pp - n_pass)) // (nn - n_docs)
      |    - (1000000 * pp) // nn END AS delta_micro,
      |  nn - n_docs > 0 AS ablatable
      |FROM per CROSS JOIN tot
      |ORDER BY source""".stripMargin
}
