package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** SCALAR-QUANTIZED ANN (SQ8) — the third compression point on the
  * ANN family's memory/recall dial, between raw floats (q_ann_brute:
  * 4 bytes/dim) and product quantization (q_ann_pq: ½ bit/dim
  * amortized): one byte per dimension, the FAISS `SQ8` / Lucene
  * scalar-quantizer design. Per-dimension affine grid
  *
  *   code_i = clamp(⌊(x_i − mn_i)/(mx_i − mn_i) · 255⌋, 0, 255)
  *   x̂_i   = mn_i + (code_i + ½)·(mx_i − mn_i)/255
  *
  * with (mn, mx) the corpus-wide per-dimension extremes, and
  * ASYMMETRIC scoring (the full-precision query against reconstructed
  * vectors — the ADC trick that keeps query-side precision free).
  *
  * Unlike the trained/seeded variants (rows-only checks), SQ8 is a
  * PURE FUNCTION of the corpus: min/max are exact, the grid is
  * closed-form, and scoring is made engine-exact by quantizing EACH
  * TERM x̂_i·q_i to integer micro-units before summation — 64 BIGINTs
  * sum commutatively, so DuckDB's unordered SUM and Spark's ordered
  * fold agree bit-for-bit and the whole query (fit + encode + score +
  * top-k + recall audit) hash-checks against the oracle. The ≤32-micro
  * per-score rounding drift is inside the quantizer's own error budget
  * by three orders of magnitude.
  *
  * Plan shape: the FIT is one scan partial-agg to 2·d doubles
  * (driver-held bounded metadata, memoized per (session, corpus) like
  * the IVF index); SERVING is map-only — the grid constants embed in
  * the expression tree as literals, scoring never shuffles, and
  * TakeOrderedAndProject picks top-k. At 100 TB the codes are what a
  * deployment STORES ([[sqCodes]] — 8× smaller than floats, the scan
  * that replaces the raw-embedding scan); the fit stays one cheap
  * pass, re-run per index build exactly like the PQ codebook. */
object SqAnn {

  /** Per-dimension (mn, mx) grid, driver-held. */
  final case class SqGrid(mn: Array[Double], mx: Array[Double]) {
    def dims: Int = mn.length
  }

  /** One-scan fit: per-dimension corpus extremes. posexplode →
    * 64-group partial agg; the collect is 2·d doubles, the same
    * bounded-driver-metadata contract as the IVF centroid table. */
  def fitGrid(emb: DataFrame): SqGrid = {
    val rows = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .collect()
    val d = rows.length
    val mn = new Array[Double](d); val mx = new Array[Double](d)
    rows.foreach { r =>
      val p = r.getAs[Int]("pos")
      mn(p) = r.getAs[Double]("mn"); mx(p) = r.getAs[Double]("mx")
    }
    SqGrid(mn, mx)
  }

  private def litArr(a: Array[Double]): Column = array(a.map(lit): _*)

  /** The stored form: uint8 codes (as an int array — parquet stores
    * them byte-packed after dictionary/RLE) per vector. */
  def sqCodes(emb: DataFrame, g: SqGrid): DataFrame = {
    val mnA = litArr(g.mn); val mxA = litArr(g.mx)
    val codes = transform(sequence(lit(1), lit(g.dims)), i => {
      val x = element_at(col("embedding"), i).cast("double")
      val mn = element_at(mnA, i); val mx = element_at(mxA, i)
      when(mx === mn, 0L).otherwise(
        least(greatest(floor((x - mn) / (mx - mn) * 255.0), lit(0L)),
          lit(255L)))
    })
    emb.select(col("vec_id"), codes.as("codes"))
  }

  /** Integer-micro asymmetric score of every corpus vector against
    * `qv`: Σ_i round(x̂_i·q_i·10⁶) — map-only. */
  def sqScores(emb: DataFrame, qv: Column, g: SqGrid): DataFrame = {
    val mnA = litArr(g.mn); val mxA = litArr(g.mx)
    val terms = transform(sequence(lit(1), lit(g.dims)), i => {
      val x = element_at(col("embedding"), i).cast("double")
      val mn = element_at(mnA, i); val mx = element_at(mxA, i)
      val qi = element_at(qv, i).cast("double")
      val code = least(greatest(floor((x - mn) / (mx - mn) * 255.0),
        lit(0L)), lit(255L))
      val xhat = when(mx === mn, mn)
        .otherwise(mn + (code + 0.5) * ((mx - mn) / 255.0))
      round(xhat * qi * 1e6).cast(LongType)
    })
    emb.select(col("vec_id"),
      aggregate(terms, lit(0L), (acc, v) => acc + v).as("approx_micro"))
  }

  /** Driver query: SQ8 top-10 for vec 0, each row carrying its exact
    * cosine (value audit) and the family's recall_ok floor vs the
    * brute-force top-10 — all computed in-query, all in the oracle. */
  def qAnnSq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val g = graft.util.SessionCache.memoize(spark, "sq", dir) { fitGrid(emb) }
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val top = sqScores(emb.crossJoin(broadcast(q)), col("qv"), g)
      .orderBy(col("approx_micro").desc, col("vec_id").asc)
      .limit(10)
    val cosines = Similarity.qAnnCosineById(spark, dir)
    val brute = cosines
      .orderBy(col("cosine").desc, col("vec_id").asc).limit(10)
      .select(col("vec_id").as("bid"))
    val hits = top.join(broadcast(brute), col("vec_id") === col("bid"),
        "left_semi")
      .agg(count(lit(1)).as("hits"))
    top.join(cosines, Seq("vec_id"))
      .crossJoin(broadcast(hits))
      .select(col("vec_id"), col("approx_micro"), col("cosine"),
        (col("hits") >= Similarity.recallFloorHits).as("recall_ok"))
      .orderBy(col("approx_micro").desc, col("vec_id").asc)
  }

  val qAnnSqSql: String =
    """WITH q AS MATERIALIZED (
      |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |dims AS MATERIALIZED (
      |  SELECT ord, MIN(CAST(embedding[ord] AS DOUBLE)) AS mn,
      |    MAX(CAST(embedding[ord] AS DOUBLE)) AS mx
      |  FROM embeddings,
      |    UNNEST(generate_series(1, len(embedding))) AS u(ord)
      |  GROUP BY ord),
      |approx AS MATERIALIZED (
      |  SELECT e.vec_id,
      |    CAST(SUM(CAST(round((CASE WHEN d.mx = d.mn THEN d.mn
      |      ELSE d.mn + (LEAST(GREATEST(FLOOR(
      |          (CAST(e.embedding[u.ord] AS DOUBLE) - d.mn)
      |            / (d.mx - d.mn) * 255.0),
      |          0.0), 255.0) + 0.5) * ((d.mx - d.mn) / 255.0)
      |      END) * CAST(q.qv[u.ord] AS DOUBLE) * 1000000.0) AS BIGINT))
      |      AS BIGINT) AS approx_micro
      |  FROM embeddings e,
      |    UNNEST(generate_series(1, len(e.embedding))) AS u(ord)
      |  JOIN dims d ON d.ord = u.ord, q
      |  GROUP BY e.vec_id),
      |sq10 AS MATERIALIZED (
      |  SELECT vec_id, approx_micro FROM approx
      |  ORDER BY approx_micro DESC, vec_id ASC LIMIT 10),
      |cosines AS MATERIALIZED (
      |  SELECT vec_id,
      |    list_sum(list_transform(list_zip(embedding, qv),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS cosine
      |  FROM embeddings, q),
      |brute AS MATERIALIZED (
      |  SELECT vec_id FROM cosines ORDER BY cosine DESC, vec_id ASC
      |  LIMIT 10),
      |hits AS (SELECT COUNT(*) AS c FROM sq10 JOIN brute USING (vec_id))
      |SELECT s.vec_id, s.approx_micro, c.cosine,
      |  CAST(h.c >= 5 AS BOOLEAN) AS recall_ok
      |FROM sq10 s JOIN cosines c USING (vec_id), hits h
      |ORDER BY s.approx_micro DESC, s.vec_id ASC""".stripMargin
}
