package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** READABILITY PROFILE (Flesch 1948; Kincaid et al. 1975) — the
  * grade-level lens the curation suite's length/punct/stopword gates
  * don't give: per source, the Flesch Reading Ease and
  * Flesch-Kincaid grade computed from exact corpus counts
  *
  *   FRE  = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
  *   FKGL = 0.39·(W/S) + 11.8·(Y/W) − 15.59
  *
  * with W = words (the corpus' single-space tokenization,
  * [[TextOps.qTextStats]] convention), S = sentences (runs of
  * [.!?], floored at 1 per document so a fragment can't divide by
  * zero), Y = syllables under the standard VOWEL-GROUP heuristic
  * (runs of [aeiouy] in the lowercased text — the deterministic
  * stand-in every readability library uses when no pronunciation
  * dictionary is available; stated, not hidden).
  *
  * DETERMINISM. W/S/Y are exact integer counts summed per source;
  * both scores are single double expressions over the integer sums
  * (micro-quantized), never per-document float averages — no
  * summation-order channel at all.
  *
  * SCALE. ONE map-only documents scan → per-source partial agg
  * (|sources| rows). The ideal linear shape. */
object Readability {

  /** Per-source readability table over any (source, text) frame:
    * (source, n_docs, n_words, n_sentences, n_syllables,
    *  flesch_micro, fk_grade_micro). */
  def readability(docs: DataFrame): DataFrame =
    readabilityFromCounts(perDocCounts(docs)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("w").as("n_words"), sum("s").as("n_sentences"),
        sum("y").as("n_syllables")))

  /** Per-document exact counts — all SUM monoids per source, so the
    * streaming [[graft.streaming.TextStatsStore]] serves the same
    * readout live. */
  def perDocCounts(docs: DataFrame): DataFrame =
    docs.select(col("source"),
      size(split(col("text"), " ")).cast("bigint").as("w"),
      greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
        .cast("bigint"), lit(1L)).as("s"),
      size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
        .cast("bigint").as("y"))

  /** The scores from any (source, n_docs, n_words, n_sentences,
    * n_syllables) sum table. */
  def readabilityFromCounts(ps: DataFrame): DataFrame =
    ps.selectExpr("source", "n_docs", "n_words", "n_sentences",
        "n_syllables",
        """cast(round(1000000.0 * (206.835
          | - 1.015 * (cast(n_words as double) / n_sentences)
          | - 84.6 * (cast(n_syllables as double) / n_words)))
          | as bigint) as flesch_micro""".stripMargin.replace("\n", " "),
        """cast(round(1000000.0 * (0.39
          | * (cast(n_words as double) / n_sentences)
          | + 11.8 * (cast(n_syllables as double) / n_words) - 15.59))
          | as bigint) as fk_grade_micro""".stripMargin.replace("\n", " "))
      .orderBy("source")

  def qReadability(spark: SparkSession, dir: String): DataFrame =
    readability(Tables(spark, dir, "documents"))

  val qReadabilitySql: String =
    """WITH per_doc AS MATERIALIZED (
      |  SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
      |    GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
      |      AS BIGINT), 1) AS s,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT) AS y
      |  FROM documents),
      |agg AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(w) AS BIGINT) AS n_words,
      |    CAST(SUM(s) AS BIGINT) AS n_sentences,
      |    CAST(SUM(y) AS BIGINT) AS n_syllables
      |  FROM per_doc GROUP BY source)
      |SELECT source, n_docs, n_words, n_sentences, n_syllables,
      |  CAST(ROUND(1000000.0 * (206.835
      |    - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
      |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)))
      |    AS BIGINT) AS flesch_micro,
      |  CAST(ROUND(1000000.0 * (0.39
      |    * (CAST(n_words AS DOUBLE) / n_sentences)
      |    + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59))
      |    AS BIGINT) AS fk_grade_micro
      |FROM agg
      |ORDER BY source""".stripMargin
}
