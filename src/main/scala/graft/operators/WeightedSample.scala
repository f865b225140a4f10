package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** WEIGHTED SAMPLING WITHOUT REPLACEMENT, deterministically — the
  * missing member of the sampling family (hash/stratified/cluster/
  * temperature/DSIR): draw k items with inclusion odds proportional
  * to an integer weight, reproducibly, in one distributed pass.
  *
  * The textbook scheme (Efraimidis–Spirakis 2006, priority u^(1/w))
  * decides SELECTION by comparing floats from `pow`/`ln` — not
  * correctly-rounded in general, so the one-ulp engine disagreement
  * the oracle posture forbids would decide which ROWS survive. The
  * engine instead uses the replicated-min-hash equivalent: give item i
  * its wᵢ md5-Horner hashes (replica j hashes "id:j") and let its
  * priority be their MINIMUM — for uniform hashes, P(min of w beats
  * min of v) = w/(w+v), exactly the ES pairwise-odds property, and
  * successive minima give the same without-replacement process. Every
  * comparison is between exact 60-bit longs; the whole draw is
  * hash-replayable SQL.
  *
  * Scale shape: replication is `explode(sequence)` bounded by the
  * weight CAP (≤ maxWeight× row growth, map-only), the per-item min is
  * a partial agg, and the global top-k plans as
  * TakeOrderedAndProject — every partition keeps a k-heap, the driver
  * merges k-row slices; no global sort at any corpus size. Weights
  * exceeding the cap saturate (the docfreq-cap posture: bounded
  * worst-case cost, stated bias at the extreme tail rather than an
  * unbounded explode). */
object WeightedSample {

  val sampleK = 200
  val maxWeight = 8

  /** Deterministic weighted sample of k ids from `items(id, w)` —
    * (id, w, priority, pick_rank), rank 1..k by ascending min-hash. */
  def weightedSample(items: DataFrame, k: Int = sampleK): DataFrame = {
    val capped = items.select(col("id"),
      least(greatest(col("w"), lit(1L)), lit(maxWeight.toLong)).as("w"))
    val replicas = capped
      .select(col("id"), col("w"),
        explode(sequence(lit(0L), col("w") - 1L)).as("j"))
      .select(col("id"), col("w"),
        conv(substring(md5(concat_ws(":", col("id"), col("j"))
          .cast(BinaryType)), 1, 15), 16, 10).cast(LongType).as("h"))
    replicas.groupBy("id", "w").agg(min(col("h")).as("priority"))
      .orderBy(col("priority"), col("id")).limit(k)
      .withColumn("pick_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("priority"), col("id"))).cast(LongType))
  }

  /** Driver query: 200 documents drawn with odds ∝ length bucket
    * (1 + n_chars/500, capped) — the "prefer long documents" mixture
    * move, reproducible across runs and engines. */
  def qWeightedSample(spark: SparkSession, dir: String): DataFrame =
    weightedSample(Tables(spark, dir, "documents")
      .select(col("doc_id").as("id"),
        expr("1 + n_chars div 500").as("w")))
      .select(col("id").as("doc_id"), col("w"), col("priority"),
        col("pick_rank"))

  val qWeightedSampleSql: String =
    s"""WITH items AS (
       |  SELECT doc_id AS id,
       |    LEAST(GREATEST(1 + n_chars // 500, 1), $maxWeight) AS w
       |  FROM documents),
       |replicas AS (
       |  SELECT id, w,
       |    CAST(CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':' ||
       |      CAST(j AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT) AS h
       |  FROM items, UNNEST(generate_series(0, w - 1)) AS t(j)),
       |prio AS (
       |  SELECT id, CAST(MAX(w) AS BIGINT) AS w, MIN(h) AS priority
       |  FROM replicas GROUP BY id),
       |ranked AS (
       |  SELECT id, w, priority,
       |    ROW_NUMBER() OVER (ORDER BY priority, id) AS pick_rank
       |  FROM prio)
       |SELECT id AS doc_id, w, priority, CAST(pick_rank AS BIGINT)
       |  AS pick_rank
       |FROM ranked WHERE pick_rank <= $sampleK""".stripMargin
}
