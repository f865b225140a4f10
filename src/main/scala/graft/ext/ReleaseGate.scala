package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** RELEASE GATE — the one-row sign-off artifact a dataset release
  * process actually blocks on (the "is this corpus shippable" twin of
  * [[TextOps.qDatasetCard]]'s descriptive card): four measured gates,
  * each an existing operator's statistic compared against an explicit
  * bar, plus the corpus Merkle fingerprint so the verdict is bound to
  * EXACTLY the bytes it certifies:
  *
  *  - PII: residual email/phone patterns AFTER the scrub must be 0
  *    (the scrub ran; this certifies it caught everything it defines);
  *  - DEDUP: exact-duplicate mass ≤ [[dupBarMicro]];
  *  - CONTAMINATION: fraction of eval-side docs with ≥ 80% shingle
  *    overlap against train ≤ [[contamBarMicro]] (the q_decontaminate
  *    drop criterion, read as a rate);
  *  - QUALITY: heuristic-gate pass rate ≥ [[qualityBarMicro]].
  *
  * `release_ok` is the AND — a CI step greps one boolean. Every gate
  * value is surfaced beside its verdict: an auditor needs the margin,
  * not just the light. All exact integers/mirrored divisions; one
  * corpus scan per gate (they share nothing but the table — at 100 TB
  * a release runs them as one pass group, each map-side-combined). */
object ReleaseGate {

  /** Exact-duplicate mass bar: ≤ 15%. */
  val dupBarMicro = 150000L
  /** Contaminated-eval-doc rate bar: ≤ 25%. */
  val contamBarMicro = 250000L
  /** Quality-gate pass-rate bar: ≥ 80%. */
  val qualityBarMicro = 800000L
  /** A doc counts as contaminated past this shingle-overlap level. */
  val contamDocLevel = 0.8

  def qReleaseGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // PII residual: patterns still present AFTER the standard scrub
    val pii = TextOps.qPiiScrub(spark, dir)
      .select(
        (regexp_count(col("scrubbed"), lit(TextOps.piiEmailRe))
          + regexp_count(col("scrubbed"), lit(TextOps.piiPhoneRe)))
          .cast("bigint").as("resid"))
      .agg(sum("resid").as("pii_residual"))
    val dup = docs.agg(
      count(lit(1)).as("n_docs"),
      count_distinct(md5(col("text").cast("binary"))).as("n_distinct"))
    val contam = Dedup.qContamFrac(spark, dir).agg(
      count(lit(1)).as("n_eval"),
      sum((col("contam_frac") >= contamDocLevel).cast("bigint"))
        .as("n_contam"))
    val quality = TextOps.qQualityFilter(spark, dir)
      .agg(count(lit(1)).as("n_quality"))
    val manifest = TextOps.qManifest(spark, dir).select("corpus_md5")
    dup.crossJoin(broadcast(pii)).crossJoin(broadcast(contam))
      .crossJoin(broadcast(quality)).crossJoin(broadcast(manifest))
      .selectExpr("n_docs", "pii_residual",
        """cast(round(1000000.0 * (n_docs - n_distinct) / n_docs)
          | as bigint) as dup_frac_micro""".stripMargin.replace("\n", " "),
        """case when n_eval = 0 then 0L else
          | cast(round(1000000.0 * n_contam / n_eval) as bigint) end
          | as contam_frac_micro""".stripMargin.replace("\n", " "),
        """cast(round(1000000.0 * n_quality / n_docs) as bigint)
          | as quality_kept_micro""".stripMargin.replace("\n", " "),
        "corpus_md5")
      .withColumn("gate_pii", col("pii_residual") === 0L)
      .withColumn("gate_dup", col("dup_frac_micro") <= dupBarMicro)
      .withColumn("gate_contam",
        col("contam_frac_micro") <= contamBarMicro)
      .withColumn("gate_quality",
        col("quality_kept_micro") >= qualityBarMicro)
      .withColumn("release_ok",
        col("gate_pii") && col("gate_dup") && col("gate_contam") &&
          col("gate_quality"))
  }

  val qReleaseGateSql: String =
    s"""WITH pii AS (
       |  SELECT CAST(SUM(
       |    len(regexp_extract_all(scrubbed, '${TextOps.piiEmailRe}'))
       |    + len(regexp_extract_all(scrubbed, '${TextOps.piiPhoneRe}')))
       |    AS BIGINT) AS pii_residual
       |  FROM (
       |${TextOps.qPiiScrubSql.linesIterator.map("    " + _).mkString("\n")}
       |  )),
       |dup AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct
       |  FROM documents),
       |contam AS (
       |  SELECT COUNT(*) AS n_eval,
       |    SUM(CASE WHEN contam_frac >= $contamDocLevel
       |      THEN 1 ELSE 0 END) AS n_contam
       |  FROM (
       |${Dedup.qContamFracSql.linesIterator.map("    " + _).mkString("\n")}
       |  )),
       |quality AS (
       |  SELECT COUNT(*) AS n_quality FROM (
       |${TextOps.qQualityFilterSql.linesIterator
           .map("    " + _).mkString("\n")}
       |  )),
       |manifest AS (
       |  SELECT corpus_md5 FROM (
       |${TextOps.qManifestSql.linesIterator.map("    " + _).mkString("\n")}
       |  )),
       |vals AS (
       |  SELECT dup.n_docs, pii.pii_residual,
       |    CAST(ROUND(1000000.0 * (dup.n_docs - dup.n_distinct)
       |      / dup.n_docs) AS BIGINT) AS dup_frac_micro,
       |    CASE WHEN contam.n_eval = 0 THEN 0 ELSE
       |      CAST(ROUND(1000000.0 * contam.n_contam / contam.n_eval)
       |        AS BIGINT) END AS contam_frac_micro,
       |    CAST(ROUND(1000000.0 * quality.n_quality / dup.n_docs)
       |      AS BIGINT) AS quality_kept_micro,
       |    manifest.corpus_md5
       |  FROM dup, pii, contam, quality, manifest)
       |SELECT *,
       |  pii_residual = 0 AS gate_pii,
       |  dup_frac_micro <= $dupBarMicro AS gate_dup,
       |  contam_frac_micro <= $contamBarMicro AS gate_contam,
       |  quality_kept_micro >= $qualityBarMicro AS gate_quality,
       |  pii_residual = 0 AND dup_frac_micro <= $dupBarMicro
       |    AND contam_frac_micro <= $contamBarMicro
       |    AND quality_kept_micro >= $qualityBarMicro AS release_ok
       |FROM vals""".stripMargin
}
