package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** RANK-BIASED OVERLAP (Webber, Moffat & Zobel 2010, TOIS) between two
  * document-quality rankings — the principled answer to "do my two
  * scorers agree?", and the reason it beats Kendall/Spearman for
  * curation work: RBO is TOP-WEIGHTED (disagreement about the head of
  * the ranking — the docs a release would actually keep or drop —
  * moves the score; disagreement deep in the tail doesn't), and it is
  * well-defined on the truncated prefixes a 100 TB corpus forces.
  *
  *   RBO = (1 − p) · Σ_{d≥1} p^{d−1} · |A_{1:d} ∩ B_{1:d}| / d
  *
  * Reported here is RBO_MIN at evaluation depth D: the sum truncated
  * at D, which LOWER-BOUNDS the full RBO, together with the exact
  * residual bound p^D (the maximum the unseen tail could add — Webber's
  * RBO_MIN/RES decomposition), so the readout is an honest interval,
  * not a point estimate with hidden truncation.
  *
  * The two rankings compared are the suite's independent quality
  * signals ([[QualityFusion]]'s KN-naturalness and heuristic-stopword
  * legs) over their conjoint universe (docs both can score: ≥ 1
  * bigram).
  *
  * DETERMINISM. Ranks are the scalable global row number with doc_id
  * tiebreaks (exact integers); the overlap profile X_d is exact
  * integer counting (a doc enters the intersection at depth
  * max(ra, rb) — X_d is the cumulative count of that bounded
  * histogram); each depth's term is ONE mirrored
  * round(1e12 · (1−p)·exp((d−1)·ln p) · X_d/d) — the ln/exp mirroring
  * convention ([[KneserNey]], [[graft.operators.Rmst]]) — summed as
  * integers, order-free.
  *
  * SCALE. Two two-level global row numbers (never a single-partition
  * window over data), one doc_id equi-join, then everything collapses
  * to the CONSTANT-size domain: rows with max(ra,rb) ≤ D (≤ 2D of
  * them), a D-row depth spine, one window over that constant spine,
  * one 1-row aggregate. Corpus growth touches only the two sorts. */
object Rbo {

  /** Webber's persistence: p = 0.98 ≈ "the evaluator's attention has
    * half-life ~34 ranks"; standard for corpus-scale lists. */
  val rboP = 0.98

  /** Evaluation depth D: residual p^D = 0.98^1000 ≈ 1.7e-9 — the
    * truncated tail can move the pico-quantized score by < 1700 units
    * out of 10^12, and the residual is REPORTED, not hidden. */
  val rboDepth = 1000

  /** RBO_MIN from any (doc_id, ra, rb) conjoint rank table: one row
    * (depth, n_ranked, overlap_at_depth, rbo_min_pico, tail_pico). */
  def rboFromRanks(ranks: DataFrame): DataFrame = {
    val spark = ranks.sparkSession
    val d = rboDepth
    // a doc joins the prefix intersection at depth max(ra, rb): the
    // overlap profile is the cumulative histogram of that integer
    val mcnt = ranks
      .select(greatest(col("ra"), col("rb")).as("m"))
      .filter(col("m") <= d)
      .groupBy("m").agg(count(lit(1)).as("c"))
    val spine = spark.range(1, d + 1).toDF("d")
    // window over the CONSTANT D-row spine, not over data
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = spine
      .join(mcnt, col("d") === col("m"), "left")
      .withColumn("x", sum(coalesce(col("c"), lit(0L))).over(w))
      .selectExpr("x",
        s"""cast(round(1000000000000.0 * (((1.0 - $rboP)
           | * exp((cast(d as double) - 1.0) * ln($rboP)))
           | * (cast(x as double) / cast(d as double)))) as bigint)
           | as t""".stripMargin.replace("\n", " "))
    val n = ranks.agg(count(lit(1)).as("n_ranked"))
    terms.agg(
        max(col("x")).as("overlap_at_depth"),
        sum(col("t")).as("rbo_min_pico"))
      .crossJoin(broadcast(n))
      .selectExpr(s"cast($d as bigint) as depth", "n_ranked",
        "overlap_at_depth", "rbo_min_pico",
        s"""cast(round(1000000000000.0
           | * exp(cast($d as double) * ln($rboP))) as bigint)
           | as tail_pico""".stripMargin.replace("\n", " "))
  }

  /** The conjoint (doc_id, ra, rb) table for the KN-vs-heuristic
    * comparison. */
  def qualityRanks(spark: SparkSession, dir: String): DataFrame = {
    val kn = KneserNey.qKneserNey(spark, dir)
      .filter(col("n_bigrams") > 0)
      .selectExpr("doc_id", "-(kn_nll_micro div n_bigrams) as s_kn")
    val t = split(col("text"), " ")
    val heur = Tables(spark, dir, "documents").select(col("doc_id"),
      (size(filter(t, x => x.isInCollection(TextOps.stopwords)))
        .cast("double") / size(t)).as("s_heur"))
    val uni = kn.join(heur, Seq("doc_id"))
    val ra = graft.operators.RowNumbering.withGlobalRowNumber(
      uni, Seq(col("s_kn").desc, col("doc_id").asc), "ra")
    graft.operators.RowNumbering.withGlobalRowNumber(
        ra, Seq(col("s_heur").desc, col("doc_id").asc), "rb")
      .select("doc_id", "ra", "rb")
  }

  def qRbo(spark: SparkSession, dir: String): DataFrame =
    rboFromRanks(qualityRanks(spark, dir))

  /** The shared DuckDB CTE prefix building the conjoint rank table —
    * ends with `ra` and `rb` CTEs keyed by doc_id ([[RankCorr]]'s
    * Spearman oracle composes the same prefix, so the two rank-
    * agreement measures are pinned to ONE ranking definition). */
  val qualityRanksCtes: String =
    s"""${KneserNey.knScoreCtes.replaceFirst("toks AS", "kn_toks AS")
          .replace("FROM toks", "FROM kn_toks")},
      |kn_s AS (
      |  SELECT doc_id, -(kn_nll_micro // n_bigrams) AS s_kn
      |  FROM scored WHERE n_bigrams > 0),
      |heur_s AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS s_heur
      |  FROM documents),
      |rbo_uni AS MATERIALIZED (
      |  SELECT k.doc_id, s_kn, s_heur
      |  FROM kn_s k JOIN heur_s h ON k.doc_id = h.doc_id),
      |ra AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY s_kn DESC, doc_id ASC) AS ra
      |  FROM rbo_uni),
      |rb AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY s_heur DESC, doc_id ASC) AS rb
      |  FROM rbo_uni)""".stripMargin

  val qRboSql: String =
    s"""WITH $qualityRanksCtes,
      |mc AS (
      |  SELECT m, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |    SELECT GREATEST(ra.ra, rb.rb) AS m
      |    FROM ra JOIN rb ON ra.doc_id = rb.doc_id)
      |  WHERE m <= $rboDepth GROUP BY m),
      |spine AS (
      |  SELECT CAST(u.d AS BIGINT) AS d
      |  FROM (SELECT unnest(generate_series(1, $rboDepth)) AS d) u),
      |xd AS (
      |  SELECT d, SUM(COALESCE(c, 0)) OVER (ORDER BY d
      |    ROWS UNBOUNDED PRECEDING) AS x
      |  FROM spine LEFT JOIN mc ON d = m),
      |rbo_terms AS (
      |  SELECT x, CAST(ROUND(1000000000000.0 * (((1.0 - $rboP)
      |    * exp((CAST(d AS DOUBLE) - 1.0) * ln($rboP)))
      |    * (CAST(x AS DOUBLE) / CAST(d AS DOUBLE)))) AS BIGINT) AS t
      |  FROM xd)
      |SELECT CAST($rboDepth AS BIGINT) AS depth,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM rbo_uni) AS n_ranked,
      |  CAST(MAX(x) AS BIGINT) AS overlap_at_depth,
      |  CAST(SUM(t) AS BIGINT) AS rbo_min_pico,
      |  CAST(ROUND(1000000000000.0
      |    * exp(CAST($rboDepth AS DOUBLE) * ln($rboP))) AS BIGINT)
      |    AS tail_pico
      |FROM rbo_terms""".stripMargin
}
