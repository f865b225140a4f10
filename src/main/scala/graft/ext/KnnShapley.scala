package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** EXACT KNN-SHAPLEY DATA VALUATION (Jia et al. 2019, "Efficient
  * task-specific data valuation for nearest neighbor algorithms",
  * PVLDB) — the one Shapley value with a closed form cheap enough to
  * run over a whole corpus: under the K-NN classification utility,
  * the Shapley value of training point α_j for one test point
  * (points sorted by distance, α_1 nearest) obeys the suffix
  * recursion
  *
  *   s(α_n) = 1[y_n = y] / n
  *   s(α_j) = s(α_{j+1}) + (1[y_j=y] − 1[y_{j+1}=y]) / max(j, K)
  *
  * — an O(n log n) EXACT computation of what generic Shapley needs
  * exponential evaluations for. Averaged over a probe set this is the
  * "which training examples help / hurt" readout data-curation loops
  * act on: strongly negative points are mislabeled-or-poisonous
  * candidates, the positive head is the core set.
  *
  * DETERMINISM. Similarity is the fold-order [[Similarity.dot]] (bit-
  * identical to DuckDB's list_sum — the q_ann_cosine_by_id contract),
  * so the per-probe distance RANKING is exactly reproducible
  * (vec_id tiebreak); each recursion increment is ONE mirrored
  * round(1e6·Δm/max(j,K)) with Δm ∈ {−1,0,1}, so the suffix sum and
  * the cross-probe total are integer micro-Shapley (quantize-then-
  * combine, the micronat convention).
  *
  * SCALE. Probe BUDGET is fixed (the knn_probe_ann_budget posture):
  * cost = |corpus| × |probes| scored pairs (map-only codegen dot off
  * a broadcast probe table), one per-PROBE-partitioned rank window
  * (never global), one per-probe suffix-sum window, one per-point
  * agg. Linear in the corpus at any scale. */
object KnnShapley {

  /** K of the KNN utility. */
  val shapK = 5

  /** Probe selection: vec_id ≡ 7 (mod 100) — a fixed ~1% budget. */
  val probeMod = 100L
  val probeRes = 7L

  /** Per-training-point total micro-Shapley over the probe set:
    * (vec_id, label, n_probes, shapley_sum_micro). `mod` selects the
    * probe set (vec_id ≡ [[probeRes]] mod `mod`): the driver query
    * fixes the RATE for the oracle; the documented 100 TB posture is a
    * fixed BUDGET — pass mod ≈ n/budget, exactly the
    * q_knn_probe_ann_budget convention, which is what ScaleCheck
    * times. */
  def knnShapley(emb: DataFrame, k: Int = shapK,
                 mod: Long = probeMod): DataFrame = {
    // residue reduced mod `mod` so a small COMPUTED budget mod (e.g.
    // ScaleCheck's max(1, n/80) on a tiny corpus, where mod ≤ probeRes)
    // still selects a non-empty probe set
    val probes = emb
      .filter(col("vec_id") % mod === probeRes % mod)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_vec"),
        col("label").as("p_label"))
    val scored = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("p_id")) // a point never values itself
      .select(col("p_id"), col("p_label"), col("vec_id"), col("label"),
        Similarity.dot(col("embedding"), col("p_vec")).as("cosine"))
    // nearest = highest cosine (unit-norm corpus); deterministic rank
    val ranked = scored
      .withColumn("j", row_number().over(Window.partitionBy("p_id")
        .orderBy(col("cosine").desc, col("vec_id").asc)))
      .withColumn("m", (col("label") === col("p_label")).cast("long"))
    // δ_j = round(1e6·(m_j − m_{j+1})/max(j,K)); δ_n = round(1e6·m_n/n)
    val w = Window.partitionBy("p_id").orderBy(col("j").asc)
    val wn = Window.partitionBy("p_id")
    val deltas = ranked
      .withColumn("m_next", lead(col("m"), 1).over(w))
      .withColumn("n_train", count(lit(1)).over(wn))
      .selectExpr("p_id", "vec_id", "label", "j",
        s"""case when m_next is null
           | then cast(round(1000000.0 * m / n_train) as bigint)
           | else cast(round(1000000.0 * (m - m_next)
           |   / greatest(j, $k)) as bigint) end as delta"""
          .stripMargin.replace("\n", " "))
    // s_j = Σ_{i ≥ j} δ_i: per-probe suffix sum (rank-descending window)
    val sfx = Window.partitionBy("p_id").orderBy(col("j").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("s_micro", sum(col("delta")).over(sfx))
      .groupBy("vec_id", "label")
      .agg(count(lit(1)).as("n_probes"),
        sum(col("s_micro")).as("shapley_sum_micro"))
  }

  def qKnnShapley(spark: SparkSession, dir: String): DataFrame =
    knnShapley(Tables(spark, dir, "embeddings"))

  val qKnnShapleySql: String =
    s"""WITH probes AS MATERIALIZED (
      |  SELECT vec_id AS p_id, embedding AS p_vec, label AS p_label
      |  FROM embeddings WHERE vec_id % $probeMod = $probeRes),
      |scored AS MATERIALIZED (
      |  SELECT p.p_id, p.p_label, e.vec_id, e.label,
      |    list_sum(list_transform(list_zip(e.embedding, p.p_vec),
      |      q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE))) AS cosine
      |  FROM embeddings e, probes p WHERE e.vec_id <> p.p_id),
      |ranked AS MATERIALIZED (
      |  SELECT p_id, vec_id, label,
      |    row_number() OVER (PARTITION BY p_id
      |      ORDER BY cosine DESC, vec_id ASC) AS j,
      |    CASE WHEN label = p_label THEN 1 ELSE 0 END AS m,
      |    COUNT(*) OVER (PARTITION BY p_id) AS n_train
      |  FROM scored),
      |deltas AS (
      |  SELECT p_id, vec_id, label, j,
      |    CASE WHEN lead(m) OVER (PARTITION BY p_id ORDER BY j) IS NULL
      |      THEN CAST(ROUND(1000000.0 * m / n_train) AS BIGINT)
      |      ELSE CAST(ROUND(1000000.0
      |        * (m - lead(m) OVER (PARTITION BY p_id ORDER BY j))
      |        / GREATEST(j, $shapK)) AS BIGINT) END AS delta
      |  FROM ranked),
      |svals AS (
      |  SELECT p_id, vec_id, label,
      |    SUM(delta) OVER (PARTITION BY p_id ORDER BY j DESC
      |      ROWS UNBOUNDED PRECEDING) AS s_micro
      |  FROM deltas)
      |SELECT vec_id, label, CAST(COUNT(*) AS BIGINT) AS n_probes,
      |  CAST(SUM(s_micro) AS BIGINT) AS shapley_sum_micro
      |FROM svals GROUP BY vec_id, label""".stripMargin
}
