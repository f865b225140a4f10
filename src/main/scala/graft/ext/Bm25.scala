package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** BM25 RANKED RETRIEVAL — the standard probabilistic relevance score
  * (Robertson/Sparck-Jones, the Lucene/Elasticsearch default) over the
  * documents corpus: tf saturation (k₁) + document-length
  * normalization (b) on top of the idf weighting [[TextOps.qTfIdf]]
  * already provides. The quality-filter counterpart for RETRIEVAL:
  * given a term query, score every matching document.
  *
  * Plan shape — everything the score needs reduces to three bounded
  * side-tables joined INTO the per-(doc, term) tf stream:
  *
  *  - tf: tokenize → FILTER TO QUERY TERMS BEFORE AGGREGATING (the
  *    selective predicate runs in the same codegen stage as the
  *    explode, so the groupBy shuffles only query-term hits, not the
  *    corpus vocabulary);
  *  - doc length: one partial-agg scan (doc_id keyed — co-partitioned
  *    with tf's doc_id for the final join);
  *  - df per query term and (N, avglen): ≤|query| + 1 rows, broadcast.
  *
  * One corpus tokenization feeding two partial aggregations, one
  * broadcast join, one doc-keyed join, and a per-doc sum of ≤|query|
  * term scores — no global sort (callers top-k with
  * TakeOrderedAndProject, [[graft.operators.SetSortOps.qTopk]]'s
  * posture). Lucene's k₁ = 1.2, b = 0.75; idf is the +1 form (never
  * negative). The ORACLE recomputes the formula in DuckDB with the
  * identical evaluation shape, so doubles agree to the driver's 12
  * significant digits. */
object Bm25 {

  val k1 = 1.2
  val b = 0.75
  /** The fixed retrieval query (terms of a plan-shaped search). */
  val queryTerms: Seq[String] = Seq("hash", "join", "filter")

  /** BM25 scores of every document matching ≥1 query term:
    * (doc_id, n_hits, score). */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"))
        .as("term"))
    val dlen = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(toks.agg(count(lit(1)).as("toktotal")))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .join(dlen, "doc_id")
      .withColumn("avgdl",
        col("toktotal").cast("double") / col("n").cast("double"))
      .withColumn("idf", log(
        (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .withColumn("s",
        // 2.2 as a SOURCE literal, not k1+1.0: the compile-time sum
        // 1.2+1.0 lands a half-ulp from double(2.2) and the oracle's
        // parser takes double(2.2) — same-literal-on-both-sides is the
        // float-determinism contract everywhere in this engine
        col("idf") * (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy("doc_id")
      // the per-doc score folds its ≤|query| term scores IN TERM ORDER
      // (sorted-list fold, not SUM): an unordered double SUM is
      // partial-agg-order-dependent at the BIT level, and downstream
      // RANKINGS over the score ([[Rrf]]) flip on exactly those bits
      // even though the 12-digit value compare passes — measured as a
      // run-to-run rank swap at an equal-to-12-digits tie
      .agg(count(lit(1)).as("n_hits"),
        aggregate(array_sort(collect_list(struct(col("term"), col("s")))),
          lit(0.0), (acc, x) => acc + x.getField("s")).as("score"))
  }

  def qBm25(spark: SparkSession, dir: String): DataFrame =
    bm25(Tables(spark, dir, "documents"), queryTerms)

  val qBm25Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                       t -> t <> '')) AS term
      |  FROM documents
      |), dlen AS (
      |  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
      |  WHERE term IN ('hash', 'join', 'filter') GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
      |), stats AS (
      |  SELECT (SELECT COUNT(*) FROM documents) AS n,
      |         (SELECT COUNT(*) FROM toks) AS toktotal
      |), scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    ln((CAST(s.n AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
      |         / (CAST(f.df AS DOUBLE) + 0.5) + 1.0)
      |      * (CAST(tf.tf AS DOUBLE) * 2.2)
      |      / (CAST(tf.tf AS DOUBLE)
      |         + 1.2 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE)
      |                  / (CAST(s.toktotal AS DOUBLE)
      |                     / CAST(s.n AS DOUBLE)))) AS s
      |  FROM tf JOIN dfreq f USING (term)
      |  CROSS JOIN stats s
      |  JOIN dlen d ON d.doc_id = tf.doc_id
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
      |       list_reduce(list_prepend(0.0, list(s ORDER BY term)),
      |                   (acc, x) -> acc + x) AS score
      |FROM scored GROUP BY doc_id""".stripMargin
}
