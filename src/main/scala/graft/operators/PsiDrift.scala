package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** POPULATION STABILITY INDEX — the industry-standard NUMERIC-feature
  * drift score ([[MixDrift]]'s G-test covers the categorical side; PSI
  * is what model-monitoring dashboards actually alarm on for scores
  * and amounts):
  *
  *   PSI = Σ_buckets (p_cur − p_ref) · ln(p_cur / p_ref)
  *
  * over FIXED-WIDTH buckets of the feature, with add-one smoothing so
  * empty buckets stay finite (the convention that also makes the
  * ratio an exact-integer fraction: (c+1)/(n+B) with B the bucket
  * count). Every per-bucket term is quantized to BIGINT micronats
  * BEFORE summation, so the total is an integer sum of integers —
  * engine-identical by construction — and the alarm threshold
  * (0.1, the standard "moderate shift" line) compares integers.
  *
  * Determinism: the feature enters as exact integer CENTS
  * (round(x·100) — both engines round the same double the same way),
  * bucket ids are integer division, and the one ln per bucket
  * evaluates on a ratio assembled from longs cast to double with the
  * identical expression tree in both engines (the lm_score posture).
  *
  * Plan shape: ONE scan partial-aggs the corpus to the ≤2·B-row
  * (side, bucket) contingency table; the 10-bucket domain is generated
  * (so absent buckets exist with count 0), totals broadcast back, and
  * scoring is map-only over B rows. At 100 TB the shuffle carries
  * ≤2·B rows per partition — nothing scales with the corpus. */
object PsiDrift {

  /** Fixed bucket width in cents (50k currency units) and count —
    * covers [0, 500k), the o_totalprice domain; the last bucket
    * absorbs the tail. */
  val bucketCents = 5000000L
  val nBuckets = 10
  /** Reference/current split point. */
  val splitDate = "1998-07-01"
  /** Alarm line: PSI ≥ 0.1 in micro units. */
  val alarmMicro = 100000L

  /** The PSI bucket id of the `cents` column (integer division,
    * clamped into the last bucket). */
  def bucketOf: org.apache.spark.sql.Column =
    least(expr(s"cents div $bucketCents"), lit(nBuckets - 1L)).cast(LongType)

  /** PSI of `cur` vs `ref` from raw (side, cents) rows. */
  def psiDrift(feat: DataFrame): DataFrame =
    psiFromBucketCounts(feat
      .withColumn("bucket", bucketOf)
      .groupBy("bucket").agg(
        sum(when(col("side") === "ref", 1L).otherwise(0L)).as("c_ref"),
        sum(when(col("side") === "cur", 1L).otherwise(0L)).as("c_cur")))

  /** PSI from a PARTIAL per-bucket count table (bucket, c_ref, c_cur)
    * — rows may repeat per bucket (they are summed) and buckets may be
    * absent (densified to 0) — the entry point the streaming
    * [[graft.streaming.DriftStore]] serves its live score through,
    * since per-bucket counts are a sum monoid. */
  def psiFromBucketCounts(bucketCounts: DataFrame): DataFrame = {
    val spark = bucketCounts.sparkSession
    val counts = bucketCounts.groupBy("bucket")
      .agg(sum("c_ref").as("c_ref"), sum("c_cur").as("c_cur"))
    val dom = spark.range(1)
      .select(explode(sequence(lit(0L), lit(nBuckets - 1L))).as("bucket"))
    val byBucket = dom
      .join(broadcast(counts), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val tot = byBucket.agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
    val scored = byBucket.crossJoin(broadcast(tot))
      .withColumn("psi_micro",
        round((((col("c_cur") + 1).cast("double") /
                (col("n_cur") + nBuckets).cast("double")) -
               ((col("c_ref") + 1).cast("double") /
                (col("n_ref") + nBuckets).cast("double"))) *
          log(((col("c_cur") + 1).cast("double") *
               (col("n_ref") + nBuckets).cast("double")) /
              (((col("c_ref") + 1).cast("double") *
                (col("n_cur") + nBuckets).cast("double")))) * 1e6)
          .cast(LongType))
    val win = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    scored
      .withColumn("psi_total_micro", sum("psi_micro").over(win))
      .withColumn("drifted",
        (col("psi_total_micro") >= alarmMicro).cast("integer"))
      .select("bucket", "c_ref", "c_cur", "psi_micro",
        "psi_total_micro", "drifted")
  }

  /** Driver query: order-amount distribution, pre-[[splitDate]]
    * reference vs post-split current. */
  def qPsiDrift(spark: SparkSession, dir: String): DataFrame =
    psiDrift(Tables(spark, dir, "orders").select(
      when(col("o_orderdate") < lit(splitDate).cast("timestamp"), "ref")
        .otherwise("cur").as("side"),
      round(col("o_totalprice") * 100).cast(LongType).as("cents")))

  val qPsiDriftSql: String =
    s"""WITH feat AS (
      |  SELECT CASE WHEN o_orderdate < TIMESTAMP '$splitDate 00:00:00'
      |      THEN 'ref' ELSE 'cur' END AS side,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |counts AS (
      |  SELECT side, LEAST(cents // $bucketCents, ${nBuckets - 1})
      |      AS bucket, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM feat GROUP BY 1, 2),
      |dom AS (SELECT CAST(b AS BIGINT) AS bucket
      |        FROM UNNEST(generate_series(0, ${nBuckets - 1})) AS t(b)),
      |bybucket AS (
      |  SELECT bucket,
      |    COALESCE(r.c, 0) AS c_ref, COALESCE(u.c, 0) AS c_cur
      |  FROM dom
      |  LEFT JOIN (SELECT bucket AS rb, c FROM counts WHERE side = 'ref')
      |    r ON bucket = r.rb
      |  LEFT JOIN (SELECT bucket AS ub, c FROM counts WHERE side = 'cur')
      |    u ON bucket = u.ub),
      |tot AS (SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
      |               CAST(SUM(c_cur) AS BIGINT) AS n_cur FROM bybucket),
      |scored AS (
      |  SELECT bucket, c_ref, c_cur,
      |    CAST(round((
      |      (CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + $nBuckets AS DOUBLE))
      |      - (CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + $nBuckets AS DOUBLE))
      |    ) * ln(
      |      (CAST(c_cur + 1 AS DOUBLE) * CAST(n_ref + $nBuckets AS DOUBLE))
      |      / (CAST(c_ref + 1 AS DOUBLE) * CAST(n_cur + $nBuckets AS DOUBLE))
      |    ) * 1000000.0) AS BIGINT) AS psi_micro
      |  FROM bybucket, tot)
      |SELECT bucket, c_ref, c_cur, psi_micro,
      |  CAST(SUM(psi_micro) OVER () AS BIGINT) AS psi_total_micro,
      |  CAST(SUM(psi_micro) OVER () >= $alarmMicro AS INTEGER) AS drifted
      |FROM scored""".stripMargin
}
