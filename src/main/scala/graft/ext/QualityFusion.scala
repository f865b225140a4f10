package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** QUALITY-SCORER ENSEMBLE via reciprocal-rank fusion — [[Rrf]]'s
  * retrieval trick applied to the curation problem: the repo now has
  * three INDEPENDENT document-quality signals (the trained hashed
  * classifier, the Kneser-Ney LM's naturalness, the heuristic
  * stopword profile), and rank fusion combines them without having to
  * calibrate their incomparable scales — exactly why Cormack & Clarke
  * 2009's k=60 form is the ensemble baseline that's hard to beat.
  * Docs the KN scorer cannot rank (zero bigrams) contribute nothing
  * for that leg ([[Rrf]]'s absent-from-list convention).
  *
  * DETERMINISM. Ranks come from [[graft.operators.RowNumbering]]'s
  * scalable global row number over mirrored sort keys (classifier
  * score and the integer KN score are exact; the stopword ratio is
  * one int/int division — bit-identical, so even the float ranking
  * replays); the fused score is the fixed-order sum of three
  * reciprocals, the [[Rrf]] float convention.
  *
  * SCALE. Three |docs|-row global rankings (two-level row number — no
  * single-partition window), three equi-joins back on doc_id, one
  * TakeOrdered head. */
object QualityFusion {

  val fuseK = 60
  val fuseTopN = 20

  private def ranked(df: DataFrame, name: String): DataFrame =
    graft.operators.RowNumbering.withGlobalRowNumber(df,
      Seq(col("s").desc, col("doc_id").asc), name)
      .select("doc_id", name)

  def qQualityFusion(spark: SparkSession, dir: String): DataFrame =
    rankedTriple(spark, dir)
      .select(col("doc_id"), col("r_clf"), col("r_kn"), col("r_heur"),
        (coalesce(lit(1.0) / (lit(fuseK).cast("double")
            + col("r_clf").cast("double")), lit(0.0))
          + coalesce(lit(1.0) / (lit(fuseK).cast("double")
            + col("r_kn").cast("double")), lit(0.0))
          + coalesce(lit(1.0) / (lit(fuseK).cast("double")
            + col("r_heur").cast("double")), lit(0.0))).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(fuseTopN)

  /** The three rank tables (shared by RRF and the Borda twin). */
  private[ext] def rankedTriple(spark: SparkSession,
                                dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val clf = ranked(CorpusOps.qClassifierInfer(spark, dir)
      .select(col("doc_id"), col("score").as("s")), "r_clf")
    val kn = ranked(KneserNey.qKneserNey(spark, dir)
      .filter(col("n_bigrams") > 0)
      .selectExpr("doc_id", "-(kn_nll_micro div n_bigrams) as s"), "r_kn")
    val t = split(col("text"), " ")
    val heur = ranked(docs.select(col("doc_id"),
      (size(filter(t, x => x.isInCollection(TextOps.stopwords)))
        .cast("double") / size(t)).as("s")), "r_heur")
    docs.select("doc_id")
      .join(clf, Seq("doc_id"), "left")
      .join(kn, Seq("doc_id"), "left")
      .join(heur, Seq("doc_id"), "left")
  }

  // ---------------------------------------------------------------
  // BORDA-COUNT FUSION (Borda 1781; de Borda rank aggregation) — the
  // pure-INTEGER counterpart to the RRF float sum: each scorer gives
  // a ranked doc n − r points (unranked → 0), the fused order is the
  // point sum. Where RRF emphasizes agreement near the top (the 1/k
  // falloff), Borda weighs the whole list linearly — a different,
  // classic aggregation the release pipeline can cross-check RRF
  // against. Zero float anywhere.
  // ---------------------------------------------------------------

  def qBordaFusion(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val n = docs.count()
    rankedTriple(spark, dir)
      .select(col("doc_id"), col("r_clf"), col("r_kn"), col("r_heur"),
        (coalesce(lit(n) - col("r_clf"), lit(-1L)) + 1L +
          coalesce(lit(n) - col("r_kn"), lit(-1L)) + 1L +
          coalesce(lit(n) - col("r_heur"), lit(-1L)) + 1L)
          .as("borda"))
      .orderBy(col("borda").desc, col("doc_id").asc)
      .limit(fuseTopN)
  }

  /** The rank-CTE chain shared by both fusion oracles. */
  private lazy val rankCtesSql: String = {
    val wT = s"w${CorpusOps.classifierTrainRounds}"
    s"""${CorpusOps.classifierTrainCtes},
      |clf_score AS MATERIALIZED (
      |  SELECT f.doc_id, SUM(f.cnt * COALESCE(w.wgt, 0)) AS s
      |  FROM feats f LEFT JOIN $wT w USING (bucket) GROUP BY 1),
      |clf_rank AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC)
      |    AS r_clf
      |  FROM clf_score),
      |${KneserNey.knScoreCtes.replaceFirst("toks AS", "kn_toks AS")
         .replace("FROM toks", "FROM kn_toks")},
      |kn_rank AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC)
      |    AS r_kn
      |  FROM (SELECT doc_id, -(kn_nll_micro // n_bigrams) AS s
      |        FROM scored WHERE n_bigrams > 0)),
      |heur_rank AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC)
      |    AS r_heur
      |  FROM (SELECT doc_id,
      |      CAST(len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |        / len(string_split(text, ' ')) AS s
      |    FROM documents))""".stripMargin
  }

  lazy val qBordaFusionSql: String =
    s"""$rankCtesSql,
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
      |SELECT d.doc_id,
      |  CAST(c.r_clf AS BIGINT) AS r_clf,
      |  CAST(k.r_kn AS BIGINT) AS r_kn,
      |  CAST(h.r_heur AS BIGINT) AS r_heur,
      |  COALESCE(nn.n - c.r_clf, -1) + 1
      |  + COALESCE(nn.n - k.r_kn, -1) + 1
      |  + COALESCE(nn.n - h.r_heur, -1) + 1 AS borda
      |FROM documents d
      |CROSS JOIN nn
      |LEFT JOIN clf_rank c USING (doc_id)
      |LEFT JOIN kn_rank k USING (doc_id)
      |LEFT JOIN heur_rank h USING (doc_id)
      |ORDER BY borda DESC, d.doc_id ASC LIMIT $fuseTopN""".stripMargin

  lazy val qQualityFusionSql: String = {
    s"""$rankCtesSql
      |SELECT d.doc_id,
      |  CAST(c.r_clf AS BIGINT) AS r_clf,
      |  CAST(k.r_kn AS BIGINT) AS r_kn,
      |  CAST(h.r_heur AS BIGINT) AS r_heur,
      |  COALESCE(1.0 / (CAST($fuseK AS DOUBLE) + CAST(c.r_clf AS DOUBLE)),
      |    0.0)
      |  + COALESCE(1.0 / (CAST($fuseK AS DOUBLE) + CAST(k.r_kn AS DOUBLE)),
      |    0.0)
      |  + COALESCE(1.0 / (CAST($fuseK AS DOUBLE)
      |      + CAST(h.r_heur AS DOUBLE)), 0.0) AS rrf_score
      |FROM documents d
      |LEFT JOIN clf_rank c USING (doc_id)
      |LEFT JOIN kn_rank k USING (doc_id)
      |LEFT JOIN heur_rank h USING (doc_id)
      |ORDER BY rrf_score DESC, d.doc_id ASC LIMIT $fuseTopN""".stripMargin
  }
}
