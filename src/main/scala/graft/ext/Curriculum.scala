package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.operators.RowNumbering

/** CURRICULUM SCHEDULE — the ordering stage between curation and the
  * training loop (Bengio et al. 2009; the easy→hard presentation
  * order curriculum-trained LLM runs use): rank every document by a
  * DIFFICULTY score, cut the ranking into [[nPhases]] equal phases
  * (phase 0 = easiest quarter, served first), and deterministically
  * shard WITHIN each phase (ordered phases, shuffled within — the
  * standard recipe: curriculum order across phases, i.i.d. mixing
  * inside one).
  *
  * Difficulty is the bigram-LM perplexity proxy the curation stack
  * already maintains ([[CorpusOps.lmScore]]'s integer micronats):
  * diff_micro = nll_micro div n_bigrams — average per-bigram negative
  * log-likelihood, integer division so the score, the ranking and
  * every downstream value stay exact integers. Documents with no
  * bigrams (< 2 words) score 0 → easiest phase, documented. Phase
  * cut: phase = ((rank−1)·K) div n over the (diff, doc_id)-ordered
  * global row number — exact equal-count quartiles, no percentile
  * approximation. Shard: md5-coin(doc_id) mod [[nShards]].
  *
  * Plan shape: scoring is [[CorpusOps.lmScoreWith]]'s broadcast-model
  * join (the corpus-sized leg, memoized per dir); the global rank is
  * [[RowNumbering.withGlobalRowNumber]] — the range-partitioned sort +
  * offset pass, NO single-partition window at any n; everything after
  * is map-only integer math. */
object Curriculum {

  val nPhases = 4L
  val nShards = 8L
  val salt = "graft-curr"

  /** Schedule over a scored (doc_id, n_bigrams, nll_micro) table. */
  def schedule(scored: DataFrame): DataFrame = {
    val diff = scored.select(col("doc_id"), col("n_bigrams"),
      when(col("n_bigrams") > 0,
        expr("nll_micro div n_bigrams").cast(LongType))
        .otherwise(0L).as("diff_micro"))
    val ranked = RowNumbering.withGlobalRowNumber(diff,
      Seq(col("diff_micro").asc, col("doc_id").asc), "rank")
    val n = ranked.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .select(col("doc_id"), col("n_bigrams"), col("diff_micro"),
        col("rank").cast(LongType).as("rank"),
        expr(s"((rank - 1) * $nPhases) div n").cast(LongType).as("phase"),
        (conv(substring(md5(concat(lit(salt + ":"),
          col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast(LongType) % nShards).as("shard"))
  }

  def qCurriculum(spark: SparkSession, dir: String): DataFrame =
    schedule(CorpusOps.qLmScore(spark, dir)
      .select("doc_id", "n_bigrams", "nll_micro"))

  val qCurriculumSql: String =
    s"""WITH lm AS MATERIALIZED (
      |${CorpusOps.qLmScoreSql.linesIterator.map("  " + _).mkString("\n")}
      |),
      |diff AS (
      |  SELECT doc_id, n_bigrams,
      |    CASE WHEN n_bigrams > 0
      |      THEN CAST(nll_micro // n_bigrams AS BIGINT)
      |      ELSE CAST(0 AS BIGINT) END AS diff_micro
      |  FROM lm),
      |ranked AS (
      |  SELECT doc_id, n_bigrams, diff_micro,
      |    CAST(ROW_NUMBER() OVER (ORDER BY diff_micro ASC, doc_id ASC)
      |      AS BIGINT) AS rank,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n
      |  FROM diff)
      |SELECT doc_id, n_bigrams, diff_micro, rank,
      |  CAST((rank - 1) * $nPhases // n AS BIGINT) AS phase,
      |  CAST(CAST(('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR)),
      |    1, 8)) AS UBIGINT) % $nShards AS BIGINT) AS shard
      |FROM ranked""".stripMargin
}
