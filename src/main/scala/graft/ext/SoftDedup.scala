package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SOFT DEDUPLICATION — reweight duplicates instead of dropping them
  * (the D4/DataComp-era alternative to hard dedup: removal changes
  * the distribution, reweighting preserves it while neutralizing the
  * gradient-level over-count; cf. SlimPajama/Muennighoff 2023's
  * repeated-data analyses). Every document in a duplicate cluster of
  * size s gets weight 1/s: the cluster's TOTAL weight is one
  * document, so an epoch over the weighted corpus sees each unique
  * text exactly once in expectation — without discarding provenance
  * (each copy keeps its own source/lang metadata row).
  *
  * Output, one row per document: (doc_id, cluster_sz,
  * weight_micro = 10⁶ div s, tokens, eff_tokens_micro = tokens·10⁶
  * div s) — the `eff_tokens` column is what a token-budget mixture
  * plan should count instead of raw tokens.
  *
  * SCALE SHAPE. One scan → (key, size) cluster histogram (the
  * [[Dedup.qDedupExact]] fingerprint), one broadcast-or-shuffle join
  * back to re-annotate rows; never a pair join. Weights are exact
  * integer divisions. */
object SoftDedup {

  /** Per-doc weights from any (doc_id, key, tokens) frame. */
  def softWeights(docs: DataFrame): DataFrame = {
    val clusters = docs.groupBy("key")
      .agg(count(lit(1)).as("cluster_sz"))
    docs.join(clusters, Seq("key"))
      .select(col("doc_id"), col("cluster_sz"),
        expr("1000000L div cluster_sz").as("weight_micro"),
        col("tokens"),
        expr("(tokens * 1000000L) div cluster_sz")
          .as("eff_tokens_micro"))
      .orderBy("doc_id")
  }

  /** Driver query: exact-duplicate clusters by the 40-char text
    * fingerprint (the [[Dedup.qDedupExact]] key), whitespace token
    * counts. */
  def qSoftDedup(spark: SparkSession, dir: String): DataFrame =
    softWeights(Tables(spark, dir, "documents")
      .select(col("doc_id"),
        substring(col("text"), 1, 40).as("key"),
        size(split(col("text"), " ")).cast("long").as("tokens")))

  val qSoftDedupSql: String =
    """WITH d AS MATERIALIZED (
      |  SELECT doc_id, substr(text, 1, 40) AS key,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |  FROM documents),
      |c AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS cluster_sz
      |  FROM d GROUP BY key)
      |SELECT doc_id, cluster_sz,
      |  1000000 // cluster_sz AS weight_micro, tokens,
      |  (tokens * 1000000) // cluster_sz AS eff_tokens_micro
      |FROM d JOIN c USING (key)
      |ORDER BY doc_id""".stripMargin
}
