package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.HeavyHitters

/** PMI COLLOCATION MINING — which word pairs co-occur far more than
  * chance (Church & Hanks 1990): the corpus-linguistics complement to
  * raw frequency. [[HeavyHitters]] finds the COMMON bigrams; PMI finds
  * the BOUND ones ("los angeles", not "of the") — the phrase-detection
  * pass tokenizer pipelines (word2vec's phrase pass, subword corpus
  * prep) run before training.
  *
  * PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) over bigram/unigram models.
  * The ratio is assembled from INTEGER counts as
  * (B·N₁²)/(N₂·Uₐ·U_b) with each factor cast to double before
  * multiplication — every count is exact in double far beyond these
  * magnitudes, both engines evaluate the identical expression tree,
  * and one `ln` at the end keeps the float surface to a single
  * bit-reproducible call (the q_tfidf contract).
  *
  * Plan: one tokenization feeds the unigram and bigram partial aggs;
  * the unigram model joins the bigram table TWICE — both joins are on
  * the word key and the unigram side is vocabulary-sized (broadcast at
  * any corpus scale: vocabularies grow log-ish, corpora don't care).
  * The min-count filter (B ≥ [[pmiMinCount]]) runs before the joins —
  * the classic noise floor, and it bounds the output. */
object Collocations {

  val pmiMinCount = 5L

  /** (w1, w2, b, pmi) for every bigram with count ≥ minCount. */
  def pmi(docs: DataFrame, minCount: Long = pmiMinCount): DataFrame = {
    val toks = docs.select(expr(
      "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')").as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("u"))
    val n1 = uni.agg(sum(col("u")).as("n1"))
    val big = toks.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("b"))
    val n2 = big.agg(sum(col("b")).as("n2"))
    big.filter(col("b") >= minCount)
      .join(broadcast(uni.select(col("w").as("w1"), col("u").as("u1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("u").as("u2"))), "w2")
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .withColumn("pmi", log(
        (col("b").cast("double") * col("n1").cast("double")
          * col("n1").cast("double")) /
          (col("n2").cast("double") * col("u1").cast("double")
            * col("u2").cast("double"))))
      .select("w1", "w2", "b", "pmi")
  }

  def qPmi(spark: SparkSession, dir: String): DataFrame =
    pmi(Tables(spark, dir, "documents"))

  val qPmiSql: String =
    s"""WITH toks AS (
      |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                     t -> t <> '') AS ts
      |  FROM documents),
      |uni AS (
      |  SELECT unnest(ts) AS w FROM toks),
      |u AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS u FROM uni GROUP BY 1),
      |n1 AS (SELECT CAST(SUM(u) AS BIGINT) AS n1 FROM u),
      |bigr AS (
      |  SELECT unnest([{'w1': ts[i], 'w2': ts[i + 1]}
      |                 for i in generate_series(1, len(ts) - 1)],
      |                recursive := true)
      |  FROM toks),
      |b AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS b
      |      FROM bigr GROUP BY 1, 2),
      |n2 AS (SELECT CAST(SUM(b) AS BIGINT) AS n2 FROM b)
      |SELECT b.w1, b.w2, b.b,
      |  ln((CAST(b.b AS DOUBLE) * CAST(n1.n1 AS DOUBLE)
      |        * CAST(n1.n1 AS DOUBLE))
      |     / (CAST(n2.n2 AS DOUBLE) * CAST(u1.u AS DOUBLE)
      |        * CAST(u2.u AS DOUBLE))) AS pmi
      |FROM b
      |JOIN u u1 ON u1.w = b.w1
      |JOIN u u2 ON u2.w = b.w2
      |CROSS JOIN n1 CROSS JOIN n2
      |WHERE b.b >= $pmiMinCount""".stripMargin
}
