package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CORPUS METADATA QA — two cheap one-pass readouts a curation team
  * runs before trusting the corpus' own labels:
  *
  *  - [[qLangConfusion]]: the confusion matrix between the DECLARED
  *    language column and the n-gram language-ID prediction
  *    ([[TextOps.qLangId]]) — declared metadata is the single most
  *    common lie in scraped corpora, and the confusion matrix is the
  *    standard audit (each cell with its share of the declared
  *    language's mass, so a mislabeled-source row reads directly).
  *  - [[qWordEntropy]]: per-document unigram Shannon entropy — the
  *    distributional repetition signal that complements
  *    [[TextOps.qRepRatio]]'s positional one (a doc alternating two
  *    phrases has LOW entropy but also low bigram-repeat ratio only
  *    if phrases are long; entropy catches degenerate vocabulary
  *    regardless of arrangement). Gopher's repetition rules and
  *    CCNet's perplexity buckets both proxy this; entropy is the
  *    model-free version.
  *
  * DETERMINISM. Confusion cells are exact counts; shares are one
  * mirrored double division each. Entropy follows the suite's
  * per-term quantization convention ([[KneserNey]]): each (doc, word)
  * term is ONE round(1e6 · (c/n)·ln(n/c)) and the per-doc value is
  * the exact integer sum of terms — engine-portable because both
  * sides quantize BEFORE summing.
  *
  * SCALE. Confusion: the map-only lang-ID scan + a ≤|langs|²-cell
  * partial agg + a broadcast ≤|langs|-row marginal join. Entropy: one
  * explode → (doc, word) partial-agg shuffle (the vocab/tfidf shape),
  * one per-doc partial agg, a doc-keyed join — linear, no windows. */
object CorpusQa {

  def qLangConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = TextOps.qLangId(spark, dir)
      .groupBy("lang_declared", "lang_predicted")
      .agg(count(lit(1)).as("n_docs"))
    val marg = cells.groupBy("lang_declared")
      .agg(sum(col("n_docs")).as("n_declared"))
    cells.join(broadcast(marg), Seq("lang_declared"))
      .selectExpr("lang_declared", "lang_predicted", "n_docs",
        """cast(round(1000000.0 * cast(n_docs as double)
          | / cast(n_declared as double)) as bigint)
          | as declared_share_micro""".stripMargin.replace("\n", " "))
  }

  val qLangConfusionSql: String =
    s"""WITH base AS (${TextOps.qLangIdSql.replace("\n", "\n  ")}),
      |cells AS (
      |  SELECT lang_declared, lang_predicted,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM base GROUP BY 1, 2),
      |marg AS (
      |  SELECT lang_declared, SUM(n_docs) AS n_declared
      |  FROM cells GROUP BY 1)
      |SELECT c.lang_declared, c.lang_predicted, c.n_docs,
      |  CAST(ROUND(1000000.0 * CAST(c.n_docs AS DOUBLE)
      |    / CAST(m.n_declared AS DOUBLE)) AS BIGINT)
      |    AS declared_share_micro
      |FROM cells c JOIN marg m ON m.lang_declared = c.lang_declared"""
      .stripMargin

  def qWordEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("doc_id").agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_types"))
    counts.join(totals, Seq("doc_id"))
      .selectExpr("doc_id", "n_tokens", "n_types",
        """cast(round(1000000.0
          | * (cast(c as double) / cast(n_tokens as double))
          | * ln(cast(n_tokens as double) / cast(c as double)))
          | as bigint) as t""".stripMargin.replace("\n", " "))
      .groupBy("doc_id", "n_tokens", "n_types")
      .agg(sum(col("t")).as("entropy_micro"))
  }

  val qWordEntropySql: String =
    """WITH counts AS (
      |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  WHERE w <> '' GROUP BY doc_id, w),
      |totals AS (
      |  SELECT doc_id, SUM(c) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_types
      |  FROM counts GROUP BY doc_id)
      |SELECT c.doc_id,
      |  CAST(t.n_tokens AS BIGINT) AS n_tokens, t.n_types,
      |  CAST(SUM(CAST(ROUND(1000000.0
      |    * (CAST(c.c AS DOUBLE) / CAST(t.n_tokens AS DOUBLE))
      |    * ln(CAST(t.n_tokens AS DOUBLE) / CAST(c.c AS DOUBLE)))
      |    AS BIGINT)) AS BIGINT) AS entropy_micro
      |FROM counts c JOIN totals t ON t.doc_id = c.doc_id
      |GROUP BY c.doc_id, t.n_tokens, t.n_types""".stripMargin
}
