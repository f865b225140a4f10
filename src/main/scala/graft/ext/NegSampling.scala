package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}
import graft.Tables

/** NEGATIVE-SAMPLING TABLE (Mikolov et al. 2013, arXiv:1310.4546
  * §2.2) — the unigram distribution raised to 3/4, served as an
  * inverse-CDF lookup: the table every word2vec/contrastive training
  * run draws its negatives from ([[Dedup.qContrastivePairs]] mines
  * HARD negatives; this is the complementary RANDOM-negative stream).
  *
  * Determinism, cross-engine: the 3/4 power is computed as
  * sqrt(c·sqrt(c)) — IEEE-754 sqrt is CORRECTLY ROUNDED in both
  * engines, unlike libm pow, so the micro-quantized weights are
  * bit-identical by construction, not just to 12 digits. Draw
  * positions are md5 coins mod the total mass (the engine's seeded-
  * randomness convention) and resolve to words by a range join on
  * cumulative-mass bands, so the drawn multiset is a pure function of
  * the corpus.
  *
  * Scale shape: unigram counting is one explode + partial-agg
  * shuffle; the sampling vocabulary is capped at [[negVocab]] BY
  * DESIGN (production word2vec caps its table the same way — rare
  * words are negatives ~never anyway), so the prefix-sum window runs
  * over a bounded table that travels BROADCAST to the range join; the
  * draw stream is arbitrarily distributed (here a generated sequence,
  * in production the per-anchor demand of a training shard). Nothing
  * but the two corpus scans touches corpus-sized data. */
object NegSampling {

  /** Sampling-table vocabulary cap (top words by count, word
    * tiebreak — [[CorpusOps.vocab]]'s order). */
  val negVocab = 1000
  /** Deterministic draws emitted by the driver query. */
  val negDraws = 500

  private def toks: Column =
    filter(split(col("text"), " "), w => w =!= "")

  /** The ^(3/4) sampling weight in micro units — sqrt(c·sqrt(c)). */
  private def w34Micro(c: Column): Column =
    round(sqrt(c.cast("double") * sqrt(c.cast("double"))) * 1e6)
      .cast(LongType)

  /** The bounded sampling table with cumulative-mass bands, plus
    * `draws` deterministic md5 draws resolved to words by the
    * inverse-CDF range join: (d, word, c, u_micro). */
  def negativeSample(docs: DataFrame, draws: Int = negDraws): DataFrame = {
    val vocab = docs.select(explode(toks).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word")).limit(negVocab)
      .withColumn("w_micro", w34Micro(col("c")))
    // single-partition window over ≤negVocab rows — bounded by design
    val win = org.apache.spark.sql.expressions.Window
      .orderBy("word")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val banded = vocab
      .withColumn("cum_hi", sum("w_micro").over(win))
      .withColumn("cum_lo", col("cum_hi") - col("w_micro"))
    val total = banded.agg(max("cum_hi").as("mass"))
    val drawRows = docs.sparkSession.range(1)
      .select(explode(sequence(lit(0), lit(draws - 1))).as("d0"))
      .crossJoin(broadcast(total))
      .select(col("d0").cast(LongType).as("d"),
        (conv(substring(md5(concat(lit("neg:"), col("d0").cast("string"))
          .cast(BinaryType)), 1, 15), 16, 10).cast(LongType)
          % col("mass")).as("u_micro"))
    drawRows.join(broadcast(banded),
        col("u_micro") >= col("cum_lo") && col("u_micro") < col("cum_hi"))
      .select(col("d"), col("word"), col("c"), col("u_micro"))
  }

  def qNegativeSample(spark: SparkSession, dir: String): DataFrame =
    negativeSample(Tables(spark, dir, "documents"))

  val qNegativeSampleSql: String =
    s"""WITH toks AS (
      |  SELECT list_filter(string_split(text, ' '), w -> w <> '') AS t
      |  FROM documents),
      |uni AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT unnest(t) AS word FROM toks) GROUP BY 1),
      |vocab AS (
      |  SELECT word, c,
      |    CAST(round(sqrt(CAST(c AS DOUBLE) * sqrt(CAST(c AS DOUBLE)))
      |      * 1000000.0) AS BIGINT) AS w_micro
      |  FROM uni ORDER BY c DESC, word LIMIT $negVocab),
      |banded AS (
      |  SELECT word, c, w_micro,
      |    CAST(SUM(w_micro) OVER (ORDER BY word
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_hi
      |  FROM vocab),
      |total AS (SELECT MAX(cum_hi) AS mass FROM banded),
      |draws AS (
      |  SELECT CAST(d AS BIGINT) AS d,
      |    CAST(CAST('0x' || substr(md5('neg:' || CAST(d AS VARCHAR)),
      |      1, 15) AS UBIGINT) AS BIGINT) % mass AS u_micro
      |  FROM UNNEST(generate_series(0, ${negDraws - 1})) AS t(d), total)
      |SELECT d, word, c, u_micro
      |FROM draws JOIN banded
      |  ON u_micro >= cum_hi - w_micro AND u_micro < cum_hi""".stripMargin
}
