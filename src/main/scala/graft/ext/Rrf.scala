package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** HYBRID RETRIEVAL FUSION (reciprocal-rank fusion, Cormack & Clarke
  * SIGIR 2009) — the standard LLM-pipeline pattern for combining a
  * LEXICAL ranker ([[Bm25]]) with a DENSE ranker (embedding cosine,
  * [[Similarity.qAnnCosineById]]'s value table) without score
  * calibration: each ranker contributes 1/(k + rank) and the fused
  * score is their sum, so only ORDER matters — BM25's unbounded
  * log-scale scores and cosine's [−1, 1] never have to be normalized
  * against each other. k = 60 is the paper's (and Elasticsearch's)
  * default; a document absent from one list simply contributes 0 from
  * it.
  *
  * Scale shape — the production RRF contract is to fuse BOUNDED
  * candidate lists, never global ranks: each ranker ends in top-K
  * (TakeOrderedAndProject — parallel partial top-K heaps, no global
  * sort), and everything after runs on ≤ 2·K rows. The in-list rank
  * is a window over an already-collected K-row list — bounded
  * metadata, the same posture as every top-k serving query here; at
  * 100 TB the two candidate generators are the scale story (BM25's
  * filtered tf stream, ANN's bucketed index) and the fusion stays
  * constant-size. Ties inside a list break by doc id, so both engines
  * rank identically off the bit-identical scores the q_bm25 /
  * q_ann_cosine_by_id oracles already pin.
  *
  * The documents and embeddings tables share the id space
  * (doc_id = vec_id, the corpus' embedding column stored columnar),
  * so the fused key is the document id. */
object Rrf {

  /** RRF smoothing constant (Cormack & Clarke 2009, §2). */
  val rrfK = 60
  /** Per-ranker candidate-list size. */
  val candK = 100
  /** Fused top-k returned. */
  val topK = 20

  /** Rank a bounded candidate list: top-[[candK]] by (micro-score
    * desc, id asc), then the in-list 1-based rank. The unpartitioned
    * window runs AFTER the limit, on ≤ [[candK]] rows — bounded, not
    * the global-window trap.
    *
    * RANKING KEY = round(score·10⁶) as an integer (the LM-score
    * "integer micronats" move): ranking a raw double amplifies
    * cross-engine 1-ulp differences — BM25's ln() can differ in the
    * last bits between JVM and libm, and two DIFFERENT docs whose
    * scores agree to 12 digits then swap ranks (measured: one rank
    * flip at an equal-to-12-digits near-tie). Micro-quantization
    * collapses sub-1e-6 gaps into an exact integer tie broken by id
    * on BOTH engines; a flip now needs two scores straddling a
    * rounding boundary within ~1e-13 — probability ~1e-7 per
    * near-tie instead of ~certainty. Rank granularity 1e-6 is far
    * below any meaningful relevance gap. */
  private def rankList(scored: DataFrame, idCol: String,
                       scoreCol: String): DataFrame = {
    val micro = round(col(scoreCol) * 1e6).cast("bigint")
    val top = scored.orderBy(micro.desc, col(idCol).asc)
      .limit(candK)
    top.withColumn("rank", row_number().over(
        Window.orderBy(micro.desc, col(idCol).asc)))
      .select(col(idCol).as("id"), col("rank"))
  }

  /** Fuse a lexical and a dense candidate list (any two (id, rank)
    * frames) into the RRF top-[[topK]]:
    * (doc_id, rrf_score, lex_rank, dense_rank) — absent-from-list
    * ranks surface as −1 (never NULL: keeps the column integer-typed
    * in both engines). */
  def fuse(lex: DataFrame, dense: DataFrame): DataFrame =
    lex.withColumnRenamed("rank", "lex_rank")
      .join(dense.withColumnRenamed("rank", "dense_rank"), Seq("id"),
        "full_outer")
      .select(col("id").as("doc_id"),
        // fixed two-term sum, each term 1/(k+rank) in double — the
        // same expression tree the oracle builds, so doubles agree
        (coalesce(lit(1.0) / (lit(rrfK).cast("double") +
            col("lex_rank").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK).cast("double") +
            col("dense_rank").cast("double")), lit(0.0))).as("rrf_score"),
        coalesce(col("lex_rank"), lit(-1)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(-1)).as("dense_rank"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(topK)

  /** Public composition over two SCORED frames — the entry the
    * streaming hybrid path uses: `lexScored(doc_id, …, score)` (e.g.
    * [[graft.streaming.Bm25Store.bm25View]]) and
    * `denseScored(vec_id, cosine)`. */
  def rrf(lexScored: DataFrame, denseScored: DataFrame): DataFrame =
    fuse(rankList(lexScored, "doc_id", "score"),
      rankList(denseScored, "vec_id", "cosine"))

  /** Driver query: BM25 over [[Bm25.queryTerms]] fused with cosine
    * against query vector 0 — the hybrid search one retrieval request
    * actually runs. */
  def qRrfFusion(spark: SparkSession, dir: String): DataFrame =
    rrf(Bm25.bm25(Tables(spark, dir, "documents"), Bm25.queryTerms),
      Similarity.qAnnCosineById(spark, dir))

  /** Both rankers' oracles replayed verbatim (qBm25Sql /
    * qAnnCosineByIdSql as subqueries), ranked with the same tie-break,
    * fused with the same two-term expression. */
  val qRrfFusionSql: String =
    s"""WITH lexs AS MATERIALIZED (
      |  ${Bm25.qBm25Sql.replace("\n", "\n  ")}),
      |denses AS MATERIALIZED (
      |  ${Similarity.qAnnCosineByIdSql.replace("\n", "\n  ")}),
      |lex AS (
      |  SELECT doc_id AS id,
      |    CAST(ROW_NUMBER() OVER (
      |      ORDER BY CAST(ROUND(score * 1000000.0) AS BIGINT) DESC,
      |        doc_id ASC) AS INTEGER) AS lex_rank
      |  FROM (SELECT * FROM lexs
      |        ORDER BY CAST(ROUND(score * 1000000.0) AS BIGINT) DESC,
      |          doc_id ASC
      |        LIMIT $candK)),
      |dense AS (
      |  SELECT vec_id AS id,
      |    CAST(ROW_NUMBER() OVER (
      |      ORDER BY CAST(ROUND(cosine * 1000000.0) AS BIGINT) DESC,
      |        vec_id ASC) AS INTEGER) AS dense_rank
      |  FROM (SELECT * FROM denses
      |        ORDER BY CAST(ROUND(cosine * 1000000.0) AS BIGINT) DESC,
      |          vec_id ASC
      |        LIMIT $candK))
      |SELECT CAST(COALESCE(l.id, d.id) AS BIGINT) AS doc_id,
      |  COALESCE(1.0 / (CAST($rrfK AS DOUBLE) + CAST(l.lex_rank AS DOUBLE)),
      |    0.0) +
      |  COALESCE(1.0 / (CAST($rrfK AS DOUBLE) + CAST(d.dense_rank AS DOUBLE)),
      |    0.0) AS rrf_score,
      |  CAST(COALESCE(l.lex_rank, -1) AS INTEGER) AS lex_rank,
      |  CAST(COALESCE(d.dense_rank, -1) AS INTEGER) AS dense_rank
      |FROM lex l FULL OUTER JOIN dense d ON l.id = d.id
      |ORDER BY rrf_score DESC, doc_id ASC
      |LIMIT $topK""".stripMargin
}
