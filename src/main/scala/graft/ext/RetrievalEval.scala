package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** RETRIEVAL EVALUATION (recall@k / MRR / nDCG@k) — the measurement
  * loop every ANN deployment runs before trading exactness for speed:
  * score the APPROXIMATE server's top-k lists against exact
  * brute-force truth over a panel of query vectors, per query. The
  * retrieval family's closing piece: [[Bm25]] and [[Similarity]]
  * produce rankings, [[Rrf]] fuses them, this GRADES them.
  *
  * Evaluated system: the deterministic sign-bit LSH path
  * ([[Similarity.qAnnLshDet]]'s bucket + Hamming-1 probe shell),
  * generalized from one query to a query panel — deterministic on
  * both engines, so the whole eval (lists INCLUDED) is hash-checked,
  * not just spot-sampled. Truth: exact cosine top-k per query.
  *
  * Metrics per query (binary relevance = membership in the exact
  * top-k; |truth| = k always, so denominators are constants):
  *  - recall@k  = |served ∩ truth| / k
  *  - MRR       = 1 / (served rank of the first true hit); 0 if none
  *  - nDCG@k    = Σ_{hits} 1/ln(rank+1) / Σ_{i=1..k} 1/ln(i+1)
  *    (log base cancels in the ratio; ln on both engines keeps the
  *    expression trees identical — the [[Bm25]] float posture)
  *
  * Scale shape: the query panel is BOUNDED (|Q| rows, broadcast); the
  * corpus pays one map-only scoring pass per arm; per-query top-k is
  * a (q_id)-partitioned rank window — Spark's WindowGroupLimit pushes
  * the k-filter into per-partition heaps, so no global sort and no
  * corpus-sized window state. Everything after the two top-k's runs
  * on ≤ 2·|Q|·k rows. At 100 TB the truth arm is the expensive one
  * (that is WHY deployments sample a query panel to eval, then serve
  * from the index) — the eval's cost model is the honest one. */
object RetrievalEval {

  /** Served/truth list depth. */
  val evalK = 10
  /** Query panel: the first [[evalQueries]] vector ids. */
  val evalQueries = 8

  private def bits = Similarity.annLshDetBits

  private def signBucket(emb: Column): Column = (0 until bits)
    .map(j => when(element_at(emb, j + 1) >= 0, 1 << j).otherwise(0))
    .reduce(_ + _).cast("int")

  private def hamming(a: Column, b: Column): Column = (0 until bits)
    .map(j => when(shiftright(a, j).bitwiseAND(1) =!=
      shiftright(b, j).bitwiseAND(1), 1).otherwise(0))
    .reduce(_ + _)

  /** Per-query metrics: (q_id, n_served, recall_at_k, mrr, ndcg). */
  def qRetrievalMetrics(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding")).as("bucket"))
    val queries = corpus.filter(col("vec_id") < evalQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("bucket").as("qb"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    // truth arm: exact cosine top-k per query (map-only scoring pass +
    // WindowGroupLimit per-partition heaps)
    val truth = corpus.crossJoin(broadcast(queries))
      .select(col("q_id"), col("vec_id"),
        Similarity.dot(col("embedding"), col("qv")).as("cosine"))
      .withColumn("t_rank", row_number().over(w))
      .filter(col("t_rank") <= evalK)
      .select("q_id", "vec_id", "t_rank")
    // served arm: the LSH path — home bucket + Hamming-1 shell only
    val served = corpus.crossJoin(broadcast(queries))
      .filter(hamming(col("bucket"), col("qb")) <= 1)
      .select(col("q_id"), col("vec_id"),
        Similarity.dot(col("embedding"), col("qv")).as("cosine"))
      .withColumn("s_rank", row_number().over(w))
      .filter(col("s_rank") <= evalK)
      .select("q_id", "vec_id", "s_rank")
    // constant ideal DCG: Σ_{i=1..k} 1/ln(i+1) — same literal fold on
    // both engines (built as a SQL expression, not a Scala constant,
    // so the double is produced by the same engine arithmetic)
    val idcg = (1 to evalK)
      .map(i => lit(1.0) / log(lit(i + 1).cast("double")))
      .reduce(_ + _)
    served.join(truth, Seq("q_id", "vec_id"), "full_outer")
      .groupBy("q_id")
      .agg(
        sum(when(col("s_rank").isNotNull, 1L).otherwise(0L)).as("n_served"),
        (sum(when(col("s_rank").isNotNull && col("t_rank").isNotNull, 1L)
          .otherwise(0L)).cast("double") / lit(evalK).cast("double"))
          .as("recall_at_k"),
        coalesce(lit(1.0) /
          min(when(col("t_rank").isNotNull, col("s_rank")))
            .cast("double"), lit(0.0)).as("mrr"),
        (sum(when(col("t_rank").isNotNull && col("s_rank").isNotNull,
            lit(1.0) / log((col("s_rank") + 1).cast("double")))
          .otherwise(lit(0.0))) / idcg).as("ndcg"))
      .select(col("q_id"), col("n_served"), col("recall_at_k"),
        col("mrr"), col("ndcg"))
  }

  /** Full ANSI replay: both arms' rank windows, the outer join, and
    * the same metric expressions. */
  val qRetrievalMetricsSql: String = {
    val bucketExpr = (0 until bits)
      .map(j => s"(CASE WHEN embedding[${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    val hammingExpr = (0 until bits)
      .map(j => s"(CASE WHEN (c.bucket >> $j) & 1 <> (q.qb >> $j) & 1 " +
        "THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val idcg = (1 to evalK)
      .map(i => s"1.0 / ln(CAST(${i + 1} AS DOUBLE))").mkString(" + ")
    s"""WITH c AS MATERIALIZED (
      |  SELECT vec_id, embedding, CAST($bucketExpr AS INTEGER) AS bucket
      |  FROM embeddings),
      |q AS MATERIALIZED (
      |  SELECT vec_id AS q_id, embedding AS qv, bucket AS qb
      |  FROM c WHERE vec_id < $evalQueries),
      |scored AS MATERIALIZED (
      |  SELECT q.q_id, c.vec_id,
      |    list_sum(list_transform(list_zip(c.embedding, q.qv),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS cosine,
      |    $hammingExpr AS hd
      |  FROM c, q),
      |truth AS MATERIALIZED (
      |  SELECT q_id, vec_id, t_rank FROM (
      |    SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY cosine DESC, vec_id ASC) AS t_rank
      |    FROM scored) WHERE t_rank <= $evalK),
      |served AS MATERIALIZED (
      |  SELECT q_id, vec_id, s_rank FROM (
      |    SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY cosine DESC, vec_id ASC) AS s_rank
      |    FROM scored WHERE hd <= 1) WHERE s_rank <= $evalK)
      |SELECT COALESCE(s.q_id, t.q_id) AS q_id,
      |  CAST(SUM(CASE WHEN s.s_rank IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_served,
      |  CAST(SUM(CASE WHEN s.s_rank IS NOT NULL AND t.t_rank IS NOT NULL
      |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST($evalK AS DOUBLE)
      |    AS recall_at_k,
      |  COALESCE(1.0 / CAST(MIN(CASE WHEN t.t_rank IS NOT NULL
      |      THEN s.s_rank END) AS DOUBLE), 0.0) AS mrr,
      |  SUM(CASE WHEN t.t_rank IS NOT NULL AND s.s_rank IS NOT NULL
      |      THEN 1.0 / ln(CAST(s.s_rank + 1 AS DOUBLE)) ELSE 0.0 END)
      |    / ($idcg) AS ndcg
      |FROM served s
      |FULL OUTER JOIN truth t ON s.q_id = t.q_id AND s.vec_id = t.vec_id
      |GROUP BY 1""".stripMargin
  }
}
