package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CCNET PERPLEXITY BUCKETS (Wenzek et al. 2020, "CCNet: Extracting
  * high-quality monolingual datasets from web crawl data") — the
  * curation split that shipped the data behind most open LMs: score
  * every document with a language model and cut the corpus into
  * HEAD / MIDDLE / TAIL perplexity terciles, so downstream mixing can
  * oversample the head and audit the tail rather than hard-filtering.
  * Here the scorer is the Kneser-Ney LM ([[KneserNey]], the stronger
  * head of the corpus-LM family) on the integer per-bigram average,
  * and the tercile boundaries are EXACT order statistics via the
  * two-phase distributed selection (the q_score_threshold machinery —
  * no global sort at any corpus size; CCNet itself computes the cuts
  * on a sample, this computes them exactly).
  *
  * Output: one row per bucket — population, token mass, and the
  * bucket's score range — the mixing plan's input table.
  *
  * DETERMINISM. Scores are integers off the memoized KN model; the
  * two cut points are exact k-th order statistics (k = ⌈n/3⌉, ⌈2n/3⌉
  * of the DESCENDING naturalness order, tie-insensitive, mirrored by
  * row_number in the oracle); bucket stats are integer sums. Docs
  * with zero bigrams are unscorable and reported as their own
  * `unscored` bucket — dropped silently nowhere. */
object CcnetBuckets {

  def qCcnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val scored0 = KneserNey.qKneserNey(spark, dir)
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
        "doc_id")
    val (scored, release) = graft.util.Checkpoints.checkpointTracked(
      scored0.selectExpr("doc_id", "n_tokens", "n_bigrams",
        "case when n_bigrams > 0 then -(kn_nll_micro div n_bigrams) end"
          + " as score"))
    try {
      val weighted = scored.filter(col("score").isNotNull)
        .groupBy("score").agg(count(lit(1)).as("c"))
      val n = CorpusOps.totalWeight(weighted, col("c"))
      // head = top ⌈n/3⌉ by naturalness; middle = next; tail = rest
      val (cut1, _) = CorpusOps.kthLargestWeighted(
        weighted, "score", col("c"), (n + 2) / 3)
      val (cut2, _) = CorpusOps.kthLargestWeighted(
        weighted, "score", col("c"), (2 * n + 2) / 3)
      scored
        .withColumn("bucket",
          when(col("score").isNull, "unscored")
            .when(col("score") >= cut1, "head")
            .when(col("score") >= cut2, "middle")
            .otherwise("tail"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("n_tokens"),
          min("score").as("min_score"),
          max("score").as("max_score"))
        .orderBy("bucket")
        .localCheckpoint() // outlives the released score checkpoint
    } finally release()
  }

  /** Oracle: the shared KN CTEs, the same ⌈n/3⌉/⌈2n/3⌉ descending
    * order statistics via row_number, the same bucket CASE. */
  val qCcnetBucketsSql: String =
    s"""WITH ${KneserNey.knScoreCtes},
      |sc2 AS MATERIALIZED (
      |  SELECT t.doc_id, len(t.t) AS n_tokens,
      |    COALESCE(s.n_bigrams, 0) AS n_bigrams,
      |    CASE WHEN COALESCE(s.n_bigrams, 0) > 0
      |      THEN -(s.kn_nll_micro // s.n_bigrams) END AS score
      |  FROM toks t LEFT JOIN scored s USING (doc_id)),
      |kk AS (
      |  SELECT COUNT(*) AS n FROM sc2 WHERE score IS NOT NULL),
      |cuts AS (
      |  SELECT
      |    MAX(CASE WHEN rn = (kk.n + 2) // 3 THEN score END) AS cut1,
      |    MAX(CASE WHEN rn = (2 * kk.n + 2) // 3 THEN score END) AS cut2
      |  FROM (SELECT score,
      |          row_number() OVER (ORDER BY score DESC) AS rn
      |        FROM sc2 WHERE score IS NOT NULL), kk
      |  GROUP BY kk.n)
      |SELECT
      |  CASE WHEN score IS NULL THEN 'unscored'
      |    WHEN score >= cuts.cut1 THEN 'head'
      |    WHEN score >= cuts.cut2 THEN 'middle'
      |    ELSE 'tail' END AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(MIN(score) AS BIGINT) AS min_score,
      |  CAST(MAX(score) AS BIGINT) AS max_score
      |FROM sc2, cuts
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
