package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** INTER-RATER AGREEMENT (Cohen's kappa, 1960) between two independent
  * document-quality raters — the release-governance readout that tells
  * a curation team whether its gates measure the same thing or
  * different things. Raw percent agreement is misleading when both
  * raters keep most docs (they agree by chance); kappa subtracts the
  * chance-agreement floor:
  *
  *   κ = (p_o − p_e) / (1 − p_e)
  *
  * with p_o the observed agreement rate and p_e the agreement expected
  * from the raters' marginal keep rates alone.
  *
  * The two raters compared are the suite's independent keep/drop
  * signals: rater A = the len/punct/stopword heuristic gate
  * ([[TextOps.qQualityFilter]]'s predicate), rater B = the Gopher-style
  * repetition rule (bigram repetition ratio ≤ [[repKeepMax]] — the
  * [[TextOps.qRepRatio]] signal as a gate). Low kappa between them is
  * the EVIDENCE that the two rules prune different failure modes and
  * both belong in the release gate; high kappa would say one is
  * redundant.
  *
  * DETERMINISM. The 2×2 confusion cells are exact integer counts of
  * engine-portable predicates (the repetition ratio is one
  * distinct-count / count division — bit-identical, the
  * [[TextOps.repRatioHof]] convention); p_o, p_e and κ are each ONE
  * mirrored round(1e6 · num/den) of exact-integer numerators and
  * denominators (κ's num = n·(agree) − Σ marginal products, den =
  * n² − Σ marginal products — both carried in DECIMAL(38,0)/HUGEINT so
  * n² survives 100 TB row counts).
  *
  * SCALE. One map-only scan (both gates are scan-speed predicates),
  * one 4-cell partial aggregate, arithmetic on the 1-row result.
  * Degenerate case surfaced, not hidden: when p_e = 1 (both raters
  * constant) κ is undefined — reported as kappa_micro = 0 with the
  * marginals present so the reader sees why. */
object RaterAgreement {

  /** Keep gate for rater B: bigram repetition ratio at most this (the
    * Gopher rule's "loops and boilerplate" direction). */
  val repKeepMax = 0.2

  /** Kappa from any frame with integer 0/1 columns `ra` (rater A keep)
    * and `rb` (rater B keep): one row — the 2×2 cells, both marginals,
    * and p_o / p_e / κ in micro units. Factored so the streaming twin
    * ([[graft.streaming.CalibrationStore]]) can serve it from the
    * absorbed 2×2 monoid. */
  def kappaFromVerdicts(v: DataFrame): DataFrame =
    kappaFromCells(cellsFromVerdicts(v))

  /** Pivot summed (ra, rb, c) verdict-count rows into the 1-row
    * (kk, kd, dk, dd) cell frame — the streaming store's read path
    * ([[graft.streaming.CalibrationStore]]); absent cells are 0. */
  def cellsFromCounts(counts: DataFrame): DataFrame =
    counts.agg(
      coalesce(sum(when(col("ra") === 1 && col("rb") === 1, col("c"))),
        lit(0L)).as("kk"),
      coalesce(sum(when(col("ra") === 1 && col("rb") === 0, col("c"))),
        lit(0L)).as("kd"),
      coalesce(sum(when(col("ra") === 0 && col("rb") === 1, col("c"))),
        lit(0L)).as("dk"),
      coalesce(sum(when(col("ra") === 0 && col("rb") === 0, col("c"))),
        lit(0L)).as("dd"))

  /** The κ arithmetic over a 1-row (kk, kd, dk, dd) cell frame. */
  def kappaFromCells(cells: DataFrame): DataFrame =
    cells
      .selectExpr("kk", "kd", "dk", "dd",
        "kk + kd + dk + dd as n",
        """cast(kk + kd as decimal(38,0)) * (kk + dk)
          | + cast(dk + dd as decimal(38,0)) * (kd + dd)
          | as pe_mass""".stripMargin.replace("\n", " "))
      .selectExpr(
        "n as n_docs", "kk as both_keep", "kd as a_only_keep",
        "dk as b_only_keep", "dd as both_drop",
        """case when n = 0 then 0L else
          | cast(round(1000000.0 * cast(kk + dd as double)
          |   / cast(n as double)) as bigint)
          | end as po_micro""".stripMargin.replace("\n", " "),
        """case when n = 0 then 0L else
          | cast(round(1000000.0 * cast(pe_mass as double)
          |   / (cast(n as double) * cast(n as double))) as bigint)
          | end as pe_micro""".stripMargin.replace("\n", " "),
        // κ = (n·agree − pe_mass) / (n² − pe_mass); the integer masses
        // are exact (decimal/HUGEINT) and enter ONE double expression
        // with identical operation order on both engines. den = 0 ⟺
        // p_e = 1 (constant raters) → reported 0, marginals explain it
        """case when cast(n as double) * cast(n as double)
          |   - cast(pe_mass as double) = 0.0 then 0L
          | else cast(round(1000000.0
          |   * (cast(n as double) * cast(kk + dd as double)
          |      - cast(pe_mass as double))
          |   / (cast(n as double) * cast(n as double)
          |      - cast(pe_mass as double)))
          |   as bigint) end as kappa_micro"""
          .stripMargin.replace("\n", " "))

  /** The two raters' verdicts, one scan, map-only. */
  def raterVerdicts(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    docs.select(
      ((length(col("text")) >= 100) &&
        (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
          greatest(length(col("text")), lit(1))) <= 0.3 &&
        (size(filter(t, x => x.isInCollection(TextOps.stopwords)))
          .cast("double") / size(t)) >= 0.01).cast("int").as("ra"),
      (TextOps.repRatioHof(col("text")) <= repKeepMax).cast("int").as("rb"))
  }

  /** The driver query: kappa between the heuristic quality gate and
    * the repetition-rule gate over every document. */
  def qRaterKappa(spark: SparkSession, dir: String): DataFrame =
    kappaFromVerdicts(raterVerdicts(Tables(spark, dir, "documents")))

  /** Shared verdict + 2×2-cell CTE text (both oracle queries replay
    * the identical gates and cells). */
  private val cellCteSql: String =
    s"""WITH v AS (
      |  SELECT
      |    CASE WHEN length(text) >= 100
      |      AND CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |          / greatest(length(text), 1) <= 0.3
      |      AND CAST(len(list_filter(string_split(text, ' '),
      |            x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |          / len(string_split(text, ' ')) >= 0.01
      |      THEN 1 ELSE 0 END AS ra,
      |    CASE WHEN (CASE WHEN len(b) > 0
      |        THEN 1.0 - CAST(len(list_distinct(b)) AS DOUBLE) / len(b)
      |        ELSE 0.0 END) <= $repKeepMax THEN 1 ELSE 0 END AS rb
      |  FROM (
      |    SELECT text,
      |      CASE WHEN len(t) >= 2
      |           THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
      |           ELSE [] END AS b
      |    FROM (SELECT text, string_split(text, ' ') AS t
      |          FROM documents))),
      |cm AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS kk,
      |    CAST(SUM(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS kd,
      |    CAST(SUM(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS dk,
      |    CAST(SUM(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS dd
      |  FROM v)""".stripMargin

  val qRaterKappaSql: String =
    s"""$cellCteSql,
      |m AS (
      |  SELECT kk, kd, dk, dd, kk + kd + dk + dd AS n,
      |    CAST(kk + kd AS HUGEINT) * (kk + dk)
      |      + CAST(dk + dd AS HUGEINT) * (kd + dd) AS pe_mass
      |  FROM cm)
      |SELECT n AS n_docs, kk AS both_keep, kd AS a_only_keep,
      |  dk AS b_only_keep, dd AS both_drop,
      |  CASE WHEN n = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * CAST(kk + dd AS DOUBLE)
      |      / CAST(n AS DOUBLE)) AS BIGINT) END AS po_micro,
      |  CASE WHEN n = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * CAST(pe_mass AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT)
      |    END AS pe_micro,
      |  CASE WHEN CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |      - CAST(pe_mass AS DOUBLE) = 0.0 THEN 0
      |  ELSE CAST(ROUND(1000000.0
      |    * (CAST(n AS DOUBLE) * CAST(kk + dd AS DOUBLE)
      |       - CAST(pe_mass AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |       - CAST(pe_mass AS DOUBLE)))
      |    AS BIGINT) END AS kappa_micro
      |FROM m""".stripMargin

  // ---------------------------------------------------------------
  // McNEMAR'S TEST (McNemar 1947) — the PAIRED significance question
  // kappa doesn't answer: the two gates disagree on kd + dk docs; is
  // the disagreement SYMMETRIC (both gates equally strict, just
  // different) or does one gate systematically keep more? Only the
  // discordant cells carry information:
  //   χ² = (kd − dk)² / (kd + dk),  1 dof.
  // ---------------------------------------------------------------

  /** The test over a 1-row (kk, kd, dk, dd) cell frame — same input
    * contract as [[kappaFromCells]], so the streaming
    * CalibrationStore twin serves it from the absorbed 2×2 monoid. */
  def mcnemarFromCells(cells: DataFrame): DataFrame =
    cells.selectExpr("kk + kd + dk + dd as n_docs",
        "kd as a_only_keep", "dk as b_only_keep",
        """case when kd + dk = 0 then 0L else
          | cast(round(1000000.0
          |   * cast((kd - dk) * cast(kd - dk as decimal(38,0))
          |       as double)
          |   / cast(kd + dk as double)) as bigint)
          | end as stat_micro""".stripMargin.replace("\n", " "))
      .withColumn("asymmetric",
        col("stat_micro") >= graft.operators.AbTest.chi2CritMicro)

  /** Driver query: McNemar between the same two gates as
    * [[qRaterKappa]] — one scan, one 4-cell aggregate. */
  def qMcnemar(spark: SparkSession, dir: String): DataFrame =
    mcnemarFromCells(cellsFromVerdicts(
      raterVerdicts(Tables(spark, dir, "documents"))))

  /** The 4-cell aggregate shared by both tests. */
  def cellsFromVerdicts(v: DataFrame): DataFrame =
    v.agg(
      sum((col("ra") === 1 && col("rb") === 1).cast("bigint")).as("kk"),
      sum((col("ra") === 1 && col("rb") === 0).cast("bigint")).as("kd"),
      sum((col("ra") === 0 && col("rb") === 1).cast("bigint")).as("dk"),
      sum((col("ra") === 0 && col("rb") === 0).cast("bigint")).as("dd"))

  val qMcnemarSql: String =
    s"""$cellCteSql
      |SELECT kk + kd + dk + dd AS n_docs,
      |  kd AS a_only_keep, dk AS b_only_keep,
      |  CASE WHEN kd + dk = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0
      |      * CAST((kd - dk) * CAST(kd - dk AS HUGEINT) AS DOUBLE)
      |      / CAST(kd + dk AS DOUBLE)) AS BIGINT) END AS stat_micro,
      |  (CASE WHEN kd + dk = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0
      |      * CAST((kd - dk) * CAST(kd - dk AS HUGEINT) AS DOUBLE)
      |      / CAST(kd + dk AS DOUBLE)) AS BIGINT) END)
      |    >= ${graft.operators.AbTest.chi2CritMicro} AS asymmetric
      |FROM cm""".stripMargin
}
