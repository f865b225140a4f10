package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** MAXIMAL MARGINAL RELEVANCE rerank (Carbonell & Goldstein 1998) —
  * the diversification stage between retrieval and serving: from the
  * top-`nCand` relevance candidates, greedily build a `k`-list where
  * each pick maximizes
  *
  *   MMR(d) = λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)
  *
  * penalizing redundancy against the already-selected set S — the
  * anti-clustering complement to [[Rrf]]'s fusion (RRF merges rankers,
  * MMR spreads the merged head). λ = 0.7 held as the integer pair
  * (7, 3) over decimicro scores: rel and sim are Spark-rounded to
  * micro units first, so the greedy argmax compares
  * 7·rel_micro − 3·max_sim_micro — integers end to end, and the
  * 10-round unrolled oracle replays the identical selection (ties
  * break toward the smaller vec_id, the float-rank convention).
  *
  * Plan shape: relevance is the corpus-wide exact-cosine scan +
  * TakeOrderedAndProject top-`nCand` (all distributed); the candidate
  * pair matrix is `nCand`² = 400 rows of codegen'd dots (distributed,
  * then driver-collected — bounded rerank-head metadata, the same
  * contract as the IVF centroid probe: EVERY production serving stack
  * reranks its candidate head on one node because the head is
  * constant-sized). The driver does only INTEGER comparisons — no
  * float is computed outside Spark, so the collected micro scores are
  * bit-identical to what the oracle derives. At 100 TB nothing
  * changes: the scan is the ANN index's job ([[SqAnn]]/IVF feed the
  * same rerank), and the head stays 20 rows. */
object Mmr {

  val nCand = 20
  val k = 10
  /** λ = 0.7 as (numerator, complement) over a ×10 scale. */
  val lamNum = 7L
  val lamComp = 3L

  /** Greedy MMR over collected integer scores. `rels`: candidate →
    * rel_micro; `sims`: (a, b) → sim_micro. Returns (rank, vec_id,
    * rel_micro, mmr_deci) in selection order. */
  def greedy(rels: Seq[(Long, Long)],
             sims: Map[(Long, Long), Long]): Seq[(Int, Long, Long, Long)] = {
    val rel = rels.toMap
    var remaining = rels.map(_._1).toSet
    var selected = Vector.empty[Long]
    val out = Vector.newBuilder[(Int, Long, Long, Long)]
    var rank = 1
    while (selected.size < k && remaining.nonEmpty) {
      val scored = remaining.toSeq.map { d =>
        val pen =
          if (selected.isEmpty) 0L
          else selected.map(s => sims((d, s))).max
        val score =
          if (selected.isEmpty) lamNum * rel(d)
          else lamNum * rel(d) - lamComp * pen
        (d, score)
      }
      val (pick, score) = scored.minBy { case (d, s) => (-s, d) }
      out += ((rank, pick, rel(pick), score))
      selected :+= pick
      remaining -= pick
      rank += 1
    }
    out.result()
  }

  /** Driver query: MMR-diversified top-10 for query vec 0 over the
    * exact-cosine top-20.
    *
    * DRIVER BOUND (the bounded-collect convention): the candidate
    * similarity matrix below is a crossJoin + collect of nCand² − nCand
    * pairs — ~380 rows at nCand = 20. MMR reranking is always over a
    * first-stage SHORTLIST; keep nCand in the 10²–10³ range (10⁶ pairs
    * ≈ the collect ceiling). Diversifying a larger pool is a different
    * operator — cluster first ([[KMeansOps]]) or pre-bucket by IVF
    * cell, then MMR within the shortlist. */
  def qMmrRerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables(spark, dir, "embeddings")
    // releasable checkpoint (20 rows, reused by both collects below —
    // a raw localCheckpoint would pin dead blocks per call, the
    // Bm25Store leak class)
    val (cand, release) = graft.util.Checkpoints.checkpointTracked(
      Similarity.qAnnCosineById(spark, dir)
        .orderBy(col("cosine").desc, col("vec_id").asc).limit(nCand)
        .join(emb, Seq("vec_id"))
        .select(col("vec_id"),
          round(col("cosine") * 1e6).cast(LongType).as("rel_micro"),
          col("embedding")))
    val (rels, sims) =
      try {
        val rels = cand.select("vec_id", "rel_micro").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)
        val a = cand.select(col("vec_id").as("a"), col("embedding").as("ea"))
        val b = cand.select(col("vec_id").as("b"), col("embedding").as("eb"))
        val sims = a.crossJoin(broadcast(b)).filter(col("a") =!= col("b"))
          .select(col("a"), col("b"),
            round(Similarity.dot(col("ea"), col("eb")) * 1e6)
              .cast(LongType).as("sim_micro"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        (rels, sims)
      } finally release()
    greedy(rels, sims)
      .toDF("rank", "vec_id", "rel_micro", "mmr_deci")
      .select(col("rank").cast(LongType), col("vec_id"), col("rel_micro"),
        col("mmr_deci"))
  }

  val qMmrRerankSql: String = {
    val rounds = (2 to k).map { r =>
      s"""sel$r AS MATERIALIZED (
        |  SELECT c.vec_id, CAST($r AS BIGINT) AS rank, c.rel_micro,
        |    $lamNum * c.rel_micro - $lamComp * (
        |      SELECT MAX(p.sim_micro) FROM pair p
        |      JOIN acc${r - 1} s ON p.b = s.vec_id
        |      WHERE p.a = c.vec_id) AS mmr_deci
        |  FROM cand c
        |  WHERE c.vec_id NOT IN (SELECT vec_id FROM acc${r - 1})
        |  ORDER BY mmr_deci DESC, c.vec_id ASC LIMIT 1),
        |acc$r AS MATERIALIZED (
        |  SELECT * FROM acc${r - 1} UNION ALL SELECT * FROM sel$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (
      |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |cos AS MATERIALIZED (
      |  SELECT vec_id,
      |    list_sum(list_transform(list_zip(embedding, qv),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS cosine
      |  FROM embeddings, q),
      |cand AS MATERIALIZED (
      |  SELECT c.vec_id,
      |    CAST(round(c.cosine * 1000000.0) AS BIGINT) AS rel_micro,
      |    e.embedding
      |  FROM cos c JOIN embeddings e USING (vec_id)
      |  ORDER BY c.cosine DESC, c.vec_id ASC LIMIT $nCand),
      |pair AS MATERIALIZED (
      |  SELECT a.vec_id AS a, b.vec_id AS b,
      |    CAST(round(list_sum(list_transform(
      |      list_zip(a.embedding, b.embedding),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |      * 1000000.0) AS BIGINT) AS sim_micro
      |  FROM cand a, cand b WHERE a.vec_id <> b.vec_id),
      |sel1 AS MATERIALIZED (
      |  SELECT vec_id, CAST(1 AS BIGINT) AS rank, rel_micro,
      |    $lamNum * rel_micro AS mmr_deci
      |  FROM cand ORDER BY rel_micro DESC, vec_id ASC LIMIT 1),
      |acc1 AS MATERIALIZED (SELECT * FROM sel1),
      |$rounds
      |SELECT rank, vec_id, rel_micro, mmr_deci FROM acc$k
      |ORDER BY rank""".stripMargin
  }
}
