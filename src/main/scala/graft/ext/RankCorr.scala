package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** WHOLE-LIST RANK AGREEMENT — exact Spearman's ρ and the normalized
  * Spearman footrule between the suite's two document-quality rankings
  * ([[Rbo]]'s KN-naturalness vs heuristic-stopword conjoint ranks).
  * [[Rbo]] answers "do the scorers agree about the HEAD of the list?"
  * (top-weighted, truncated); this operator answers the complementary
  * question "do they agree about the whole ordering?" — together they
  * separate "disagree everywhere" from "agree in the tail, fight over
  * the head", which is exactly the distinction a release gate needs
  * before swapping scorers.
  *
  * Both rankings are TOTAL orders (doc_id tiebreaks), so the tie-free
  * closed forms are exact, not approximations:
  *
  *   ρ = 1 − 6·Σd² / (n³ − n)            (Spearman 1904)
  *   F = 1 − 3·Σ|d| / (n² − 1)           (Diaconis & Graham 1977)
  *
  * with d = ra − rb per doc. Diaconis-Graham also bounds Kendall's τ
  * between these two (F ≤ relative τ distance ≤ 2F in their metric
  * form), so the pair brackets the pairwise-disagreement measure
  * without paying any pairwise computation.
  *
  * DETERMINISM. Ranks are exact integers from the scalable global row
  * number; Σd² and Σ|d| accumulate in DECIMAL(38,0)/HUGEINT (Σd² is
  * Θ(n³) mass — Long wraps near n ≈ 3·10⁶, far under a 100 TB corpus);
  * ρ and F are each ONE mirrored double expression over the exact
  * sums, identical operation order on both engines.
  *
  * SCALE. [[Rbo.qualityRanks]]'s two range-partitioned row numbers
  * (never a single-partition window), one doc_id equi-join, one
  * partial-agg scan to four sufficient statistics, arithmetic on the
  * 1-row result. */
object RankCorr {

  /** ρ and F from any (doc_id, ra, rb) conjoint rank table. */
  def spearmanFromRanks(ranks: DataFrame): DataFrame =
    ranks
      .select((col("ra") - col("rb")).as("d"))
      .agg(
        count(lit(1)).as("n_ranked"),
        sum(col("d").cast(DecimalType(38, 0)) * col("d")).as("d2"),
        sum(abs(col("d")).cast(DecimalType(38, 0))).as("ad"),
        coalesce(max(abs(col("d"))), lit(0L)).as("max_disp"))
      .selectExpr(
        "cast(n_ranked as bigint) as n_ranked",
        "max_disp",
        // n ≤ 1: both denominators vanish — a 1-doc (or empty) list
        // trivially agrees with itself, reported as exact 1.0
        """case when n_ranked <= 1 then 1000000L else
          | cast(round(1000000.0 - 6000000.0 * cast(d2 as double)
          |   / (cast(n_ranked as double) * cast(n_ranked as double)
          |        * cast(n_ranked as double)
          |      - cast(n_ranked as double))) as bigint)
          | end as rho_micro""".stripMargin.replace("\n", " "),
        """case when n_ranked <= 1 then 1000000L else
          | cast(round(1000000.0 - 3000000.0 * cast(ad as double)
          |   / (cast(n_ranked as double) * cast(n_ranked as double)
          |      - 1.0)) as bigint)
          | end as footrule_micro""".stripMargin.replace("\n", " "))

  def qSpearman(spark: SparkSession, dir: String): DataFrame =
    spearmanFromRanks(Rbo.qualityRanks(spark, dir))

  val qSpearmanSql: String =
    s"""WITH ${Rbo.qualityRanksCtes},
      |dd AS (
      |  SELECT ra.ra - rb.rb AS d
      |  FROM ra JOIN rb ON ra.doc_id = rb.doc_id),
      |s AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_ranked,
      |    SUM(CAST(d AS HUGEINT) * d) AS d2,
      |    SUM(CAST(ABS(d) AS HUGEINT)) AS ad,
      |    CAST(COALESCE(MAX(ABS(d)), 0) AS BIGINT) AS max_disp
      |  FROM dd)
      |SELECT n_ranked, max_disp,
      |  CASE WHEN n_ranked <= 1 THEN 1000000 ELSE
      |    CAST(ROUND(1000000.0 - 6000000.0 * CAST(d2 AS DOUBLE)
      |      / (CAST(n_ranked AS DOUBLE) * CAST(n_ranked AS DOUBLE)
      |           * CAST(n_ranked AS DOUBLE)
      |         - CAST(n_ranked AS DOUBLE))) AS BIGINT)
      |    END AS rho_micro,
      |  CASE WHEN n_ranked <= 1 THEN 1000000 ELSE
      |    CAST(ROUND(1000000.0 - 3000000.0 * CAST(ad AS DOUBLE)
      |      / (CAST(n_ranked AS DOUBLE) * CAST(n_ranked AS DOUBLE)
      |         - 1.0)) AS BIGINT)
      |    END AS footrule_micro
      |FROM s""".stripMargin
}
