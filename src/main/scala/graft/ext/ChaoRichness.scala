package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** VOCABULARY RICHNESS & UNSEEN MASS (Chao 1984; Good 1953) — the
  * "how much vocabulary haven't we seen yet" readout that turns the
  * observed type counts into an asymptote, per source:
  *
  *   Chao1 = V + f₁·(f₁−1) / (2·(f₂+1))   (bias-corrected),
  *   P₀    = f₁ / N                        (Good-Turing unseen mass),
  *
  * with V the observed vocabulary, f₁ the hapax legomena (words seen
  * once), f₂ the dis legomena, N the token count. Chao1 says how
  * many types a source is heading toward (the saturation answer
  * Heaps' law fits as a curve, from one snapshot); P₀ says what
  * probability mass the NEXT token has of being a brand-new word —
  * the coverage number a sampling plan needs.
  *
  * DETERMINISM. V/f₁/f₂/N are exact integers off one tokenize scan +
  * one (source, word) partial agg; both estimates are single rounded
  * divisions of exact integers.
  *
  * SCALE. The (source, word) agg is vocab-bounded per source
  * (Heaps-saturating); the frequency-of-frequencies fold is
  * grid-sized. The ideal two-shuffle shape. */
object ChaoRichness {

  /** The per-(source, word) count table — a SUM monoid, so the
    * streaming [[graft.streaming.TextStatsStore]] serves the same
    * readout live from its merged deltas. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("source", "w").agg(count(lit(1)).as("c"))

  /** Per-source richness: (source, n_tokens, vocab, f1, f2,
    * chao1_micro, unseen_mass_micro). */
  def chaoRichness(docs: DataFrame): DataFrame =
    chaoFromWordCounts(wordCounts(docs))

  /** The readout from any (source, w, c) count table. */
  def chaoFromWordCounts(wc: DataFrame): DataFrame =
    wc.groupBy("source").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .selectExpr("source", "n_tokens", "vocab", "f1", "f2",
        """cast(round(1000000.0 * (cast(vocab as double)
          | + cast(f1 as double) * (cast(f1 as double) - 1.0)
          |   / (2.0 * (cast(f2 as double) + 1.0)))) as bigint)
          | as chao1_micro""".stripMargin.replace("\n", " "),
        """case when n_tokens = 0 then 0 else
          |cast(round(1000000.0 * cast(f1 as double)
          |  / cast(n_tokens as double)) as bigint) end
          |as unseen_mass_micro""".stripMargin.replace("\n", " "))
      .orderBy("source")

  def qChaoRichness(spark: SparkSession, dir: String): DataFrame =
    chaoRichness(Tables(spark, dir, "documents"))

  val qChaoRichnessSql: String =
    """WITH toks AS (
      |  SELECT source, UNNEST(string_split(text, ' ')) AS w
      |  FROM documents),
      |wc AS (
      |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM toks WHERE w <> '' GROUP BY 1, 2),
      |agg AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS vocab,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      |  FROM wc GROUP BY source)
      |SELECT source, n_tokens, vocab, f1, f2,
      |  CAST(ROUND(1000000.0 * (CAST(vocab AS DOUBLE)
      |    + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
      |      / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)))) AS BIGINT)
      |    AS chao1_micro,
      |  CASE WHEN n_tokens = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * CAST(f1 AS DOUBLE)
      |      / CAST(n_tokens AS DOUBLE)) AS BIGINT) END
      |    AS unseen_mass_micro
      |FROM agg
      |ORDER BY source""".stripMargin
}
