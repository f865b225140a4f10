package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup — SEMANTIC deduplication over an embedding column
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", arXiv:2303.09540): cluster the
  * corpus with a k-means coarse quantizer, mine near-duplicate PAIRS
  * only within clusters (the O(n²) pairwise matrix restricted to
  * O(Σ cellsize²)), and keep ONE representative per duplicate group —
  * the member FARTHEST from its cluster centroid, the paper's policy
  * (edge points carry more training signal than cluster-core points).
  *
  * This is deliberately a composition of operators the engine already
  * ships: the k-means cells come from [[Similarity.buildIvfIndex]]
  * (shared, memoized per (session, corpus) — building an ANN index and
  * semantic dedup amortize the SAME quantizer, as in production), the
  * survivor choice is [[Dedup.resolveDuplicatesBy]] (score =
  * −centroid-cosine ⇒ keep farthest, ties broken by min vec_id), and
  * the verdict join is the same left_anti shape as every other resolve.
  *
  * Scale shape: the within-cell self-join keys on `cell` — each task
  * sees one cell's vectors, cost Σ c² bounded by the quantizer's k
  * (production sizes k ≈ √n so E[c] = √n and Σ c² ≈ n^1.5 ≪ n²; cells
  * beyond [[semDedupMaxCell]] are dropped from MINING with the same
  * documented recall trade as embedNearDup's bucket cap — a capped
  * cell's members are all KEPT, never silently dropped from the
  * corpus). Centroid cosines are one broadcast join against k rows.
  * The component contraction and survivor window run over the
  * duplicate-bounded subset only — the corpus is never shuffled.
  *
  * KMeans cell assignment is seeded but float-order-dependent →
  * rows-only driver check (same posture as q_ann_ivf); SemDedupSpec
  * proves the semantics on planted duplicate groups and the
  * no-surviving-pair invariant on the real corpus.
  */
object SemDedup {

  /** Cosine at or above which two embeddings are semantic duplicates.
    * The paper operates at ε ∈ [0.9, 0.99] on normalized embeddings. */
  val semDedupMinCos = 0.95

  /** Mining cap per cell: a cell larger than this is excluded from
    * pair mining (members kept). At the production k ≈ √n sizing a
    * cell this hot means the quantizer needs a larger k — the cap
    * turns that misconfiguration into bounded cost + stated recall
    * loss instead of an n² task. */
  val semDedupMaxCell = 10000

  /** The verdict table over (vec_id, embedding, cell) cell assignments
    * plus their (unit-normalized) centroids: one row per vector —
    *   vec_id, cell, cent_cos (cosine to own centroid), keep (1/0).
    * Exposed separately from [[qSemDedup]] so specs and library users
    * can run planted or hand-assigned clusterings through the exact
    * production path. */
  def semDedupFrom(cells: DataFrame, centroids: Array[Array[Double]],
                   minCos: Double = semDedupMinCos,
                   maxCell: Int = semDedupMaxCell): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    // unit-normalize centroids driver-side (k·d work) so cent_cos is a
    // true cosine against the already-normalized corpus vectors
    val centDf = centroids.zipWithIndex.map { case (c, i) =>
      val n = math.sqrt(c.map(x => x * x).sum) max 1e-12
      (i, c.map(x => (x / n).toFloat).toSeq)
    }.toSeq.toDF("cell", "centroid")
    val scored = cells
      .join(broadcast(centDf), Seq("cell"))
      .select(col("vec_id"), col("cell"), col("embedding"),
        Similarity.dot(col("embedding"), col("centroid")).as("cent_cos"))
    // mine pairs only inside cells small enough to square
    val cellSizes = cells.groupBy("cell").agg(count(lit(1)).as("cn"))
    val minable = scored
      .join(cellSizes.filter(col("cn") <= maxCell).select("cell"), Seq("cell"))
    val a = minable.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"))
    val b = minable.select(col("cell"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(Similarity.dot(col("ea"), col("eb")) >= minCos)
      .select(col("vec_a"), col("vec_b"))
    val kept = Dedup.resolveDuplicatesBy(
      scored.select(col("vec_id"), col("cell"), col("cent_cos")),
      pairs, score = -col("cent_cos"),
      idCol = "vec_id", srcCol = "vec_a", dstCol = "vec_b")
    scored.select(col("vec_id"), col("cell"), col("cent_cos"))
      .join(kept.select(col("vec_id"), lit(1).as("keep")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("cent_cos"),
        coalesce(col("keep"), lit(0)).as("keep"))
  }

  /** Quantizer size for a corpus of `n` vectors: k ≈ √n floors the
    * expected cell at √n, so within-cell mining is Σ c² ≈ n·√n — the
    * bound that keeps SemDeDup sub-quadratic at ANY corpus size. A
    * FIXED k is the scale trap here: cells grow linearly with the
    * corpus and the mining join quadratically. (Floor of 16 keeps tiny
    * corpora from degenerating to one-vector cells.) */
  def kForCorpus(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Driver query: SemDeDup verdict over the embeddings table, with
    * the quantizer sized [[kForCorpus]] (k ≈ √n — semantic dedup's
    * correctness at scale depends on k growing with the corpus, so it
    * sizes its own fit rather than inheriting the ANN index's k; a
    * deployment that picks one k for both can pass `idx.cells` to
    * [[semDedupFrom]] directly). Memoized per (session, corpus) like
    * every checkpointed artifact. Rows = corpus size always (a
    * verdict, not a pair list — this corpus plants no semantic dups,
    * and an empty pair table is itself a correct verdict). */
  def qSemDedup(spark: SparkSession, dir: String): DataFrame = {
    val idx = graft.util.SessionCache.memoize(spark, "semdedup", dir) {
      val n = graft.Tables(spark, dir, "embeddings").count()
      Similarity.buildIvfIndex(spark, dir, kForCorpus(n))
    }
    semDedupFrom(idx.cells, idx.centroids)
  }

  /** Sign-bit cell width for [[qSemDedupDet]]: 2⁸ = 256 cells. */
  val semDedupDetBits = 8

  /** Duplicate threshold for [[qSemDedupDet]] — deliberately below the
    * production [[semDedupMinCos]]: the synthetic corpus plants no
    * true semantic duplicates at 0.95, and a pairless run would leave
    * the contraction + survivor stages unexercised by the oracle. At
    * 0.4 the within-cell miner yields a handful of real pairs at every
    * test SF, so the HASH CHECK covers the whole verdict pipeline. */
  val semDedupDetMinCos = 0.4

  /** [[qSemDedup]] with a DETERMINISTIC quantizer — the move that made
    * q_ann_cosine_by_id the ANN family's value oracle, applied to the
    * whole SemDeDup pipeline: cells come from the SIGN BITS of the
    * first [[semDedupDetBits]] embedding components (a pure, seedless
    * function of the data that any SQL engine reproduces bit-for-bit),
    * and each cell's "centroid" is its sign pattern ±1/√bits over
    * those components (unit-norm by construction). Everything
    * downstream is [[semDedupFrom]] UNCHANGED — the same within-cell
    * mining, star contraction, and farthest-from-centroid survivor
    * policy the seeded-kmeans q_semdedup runs — so the driver
    * hash-checks the full verdict table (vec_id, cell, cent_cos, keep)
    * against [[qSemDedupDetSql]]'s replay, closing the gap that kept
    * q_semdedup rows-only. The k-means variant remains the production
    * quantizer (data-adaptive cells beat axis signs on recall); this
    * twin exists to pin the PIPELINE's semantics. */
  def qSemDedupDet(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables(spark, dir, "embeddings")
    val cellCol = (0 until semDedupDetBits)
      .map(j => when(element_at(col("embedding"), j + 1) >= 0, 1 << j)
        .otherwise(0))
      .reduce(_ + _)
    val cells = emb.select(col("vec_id"), col("embedding"),
      cellCol.cast("int").as("cell"))
    // centroid of cell c: component j < bits is ±1 by bit j of c, 0
    // beyond — semDedupFrom's driver-side normalization divides by
    // exactly sqrt(bits), the same correctly-rounded double DuckDB's
    // sqrt produces, so the float-cast centroids agree bit-for-bit
    val centroids = Array.tabulate(1 << semDedupDetBits) { c =>
      Array.tabulate(64) { j =>
        if (j < semDedupDetBits) { if (((c >> j) & 1) == 1) 1.0 else -1.0 }
        else 0.0
      }
    }
    semDedupFrom(cells, centroids, minCos = semDedupDetMinCos)
  }

  /** Full ANSI replay of [[qSemDedupDet]]: sign-bit cells, the ±1/√8
    * float centroid built per row from the cell id, the q_ann-proven
    * list_zip/list_sum dot (element-order left fold in double space —
    * matches the engine's native [[Similarity.dot]]), within-cell
    * pairs at the same threshold/cap, the recursive-CTE closure
    * (qDupClustersSql's edges/reach shape), and the (cent_cos asc,
    * vec_id) survivor window. */
  val qSemDedupDetSql: String = {
    val bits = semDedupDetBits
    val cellExpr = (0 until bits)
      .map(j => s"(CASE WHEN embedding[${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    val centroid =
      s"""[CAST(CASE WHEN j <= $bits THEN
         |    (CASE WHEN (cell >> (j-1)) & 1 = 1 THEN 1.0 ELSE -1.0 END)
         |      / sqrt($bits.0)
         |  ELSE 0.0 END AS FLOAT) for j in range(1, 65)]""".stripMargin
    s"""WITH RECURSIVE cells AS (
      |  SELECT vec_id, embedding, CAST($cellExpr AS INTEGER) AS cell
      |  FROM embeddings),
      |sized AS (
      |  SELECT cells.*, COUNT(*) OVER (PARTITION BY cell) AS cn
      |  FROM cells),
      |scored AS (
      |  SELECT vec_id, cell, cn, embedding,
      |    list_sum(list_transform(list_zip(embedding, $centroid),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS cent_cos
      |  FROM sized),
      |pairs AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      |  FROM scored a JOIN scored b
      |    ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE a.cn <= $semDedupMaxCell
      |    AND list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |        >= $semDedupDetMinCos),
      |edges AS (
      |  SELECT vec_a AS u, vec_b AS v FROM pairs
      |  UNION SELECT vec_b, vec_a FROM pairs),
      |reach AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |comp AS (
      |  SELECT u AS vec_id, LEAST(u, MIN(v)) AS component
      |  FROM reach GROUP BY u),
      |ranked AS (
      |  SELECT s.vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY c.component
      |                       ORDER BY s.cent_cos ASC, s.vec_id ASC) AS rk
      |  FROM scored s JOIN comp c ON s.vec_id = c.vec_id)
      |SELECT s.vec_id, s.cell, s.cent_cos,
      |  CAST(CASE WHEN r.vec_id IS NULL OR r.rk = 1 THEN 1 ELSE 0 END
      |    AS INTEGER) AS keep
      |FROM scored s LEFT JOIN ranked r ON s.vec_id = r.vec_id""".stripMargin
  }
}
