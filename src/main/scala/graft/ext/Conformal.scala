package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SPLIT-CONFORMAL PREDICTION for the quality classifier (Vovk et al.
  * 2005; Angelopoulos & Bates 2021 survey) — the distribution-free
  * uncertainty wrapper a production scorer ships with: instead of a
  * bare 0/1 prediction, each document gets a PREDICTION SET that
  * contains the true label with probability ≥ 1 − α, guaranteed by
  * exchangeability alone (no model assumptions; the classifier can be
  * arbitrarily bad — the sets just get bigger).
  *
  * Split-conformal recipe, exactly:
  *  1. split documents by a seeded md5 coin into CALIBRATION and EVAL;
  *  2. nonconformity of (x, y): s = −score(x) if y = 1 else score(x)
  *     (the margin-based score for a linear gate classifier);
  *  3. q̂ = the ⌈(n_cal + 1)(1 − α)⌉-th SMALLEST calibration
  *     nonconformity (the finite-sample-corrected quantile — the +1 is
  *     what makes coverage ≥ 1 − α exact, not asymptotic);
  *  4. prediction set of x: every label y with s_y(x) ≤ q̂ — here
  *     {1} iff −score ≤ q̂, {0} iff score ≤ q̂, possibly both or empty.
  *
  * The readout is the marginal report an ML-ops dashboard tracks:
  * empirical coverage on the eval half (certified ≥ 1 − α in
  * expectation), average set size (the price of the guarantee — 1.0
  * means the classifier is confidently right-sized, →2.0 means it
  * abstains into {0,1}), and the empty/both fractions.
  *
  * DETERMINISM. Scores are exact integers (the trained gate
  * classifier's md5-bucket weights, memoized and oracle-replayed);
  * nonconformities are negations; q̂ is an exact k-th order statistic
  * ([[CorpusOps.kthLargestWeighted]] with the explicit conformal rank
  * — the two-phase selection, no sort); every reported fraction is
  * ROUND(1e6·int/int).
  *
  * SCALE. One inference scan (map-only codegen fold), the two bounded
  * selection passes over the calibration half, one eval partial agg.
  * Nothing corpus-sized sorts or shuffles beyond the score groupBys. */
object Conformal {

  /** Miscoverage α = 1/10. */
  val alphaNum = 1L
  val alphaDen = 10L

  private def calCoin(doc: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("cal:"), doc).cast(BinaryType)),
      1, 15), 16, 10).cast(LongType) % 2 === 0

  /** The (is_cal, score, y, c) group counts of an inferred frame —
    * the bounded state the readout needs (score-domain-sized, never
    * corpus-sized): the batch query groups per run, the streaming
    * [[graft.streaming.ConformalStore]] maintains the same table as a
    * per-key sum monoid. */
  def groupsOf(inferred: DataFrame): DataFrame =
    inferred
      .withColumn("is_cal", calCoin(col("doc_id")))
      .groupBy("is_cal", "score", "y").agg(count(lit(1)).as("c"))

  /** One row: (n_cal, q_hat, n_eval, coverage_micro, avg_set_micro,
    * frac_empty_micro, frac_both_micro). */
  def conformal(inferred: DataFrame): DataFrame =
    conformalFromGroups(groupsOf(inferred))

  /** The readout from any (is_cal, score, y, c) group-count frame
    * ([[groupsOf]]'s shape; streaming-store entry). */
  def conformalFromGroups(groups: DataFrame): DataFrame = {
    val scored = groups.withColumn("nc",
      when(col("y") === 1, -col("score")).otherwise(col("score")))
    val (mat, release) = graft.util.Checkpoints.checkpointTracked(
      scored.select("is_cal", "score", "y", "c", "nc"))
    try {
      val cal = mat.filter(col("is_cal"))
      val nCal = CorpusOps.totalWeight(cal, col("c"))
      require(nCal > 0, "conformal: empty calibration split")
      // k-th SMALLEST = (n − k + 1)-th largest; k = ⌈(n+1)(1−α)⌉.
      // k > n (tiny calibration sets, ⌈(n+1)(1−α)⌉ = n+1) means exact
      // split-conformal has NO finite quantile: q̂ = +∞ and every
      // prediction set is {0,1}. Surfacing the degenerate case (rather
      // than capping at the max calibration value) preserves the
      // ≥ 1 − α guarantee — a capped q̂ can exclude labels the exact
      // method must include, so e.g. ConformalStore's first small
      // batches would report under-coverage that reads as a MODEL
      // problem when it is a calibration-size problem. The readout
      // makes it visible: q_hat = Long.MaxValue, avg_set = 2.0.
      val k = ((nCal + 1) * (alphaDen - alphaNum) + alphaDen - 1) / alphaDen
      val qHat =
        if (k > nCal) Long.MaxValue
        else CorpusOps.kthLargestWeighted(
          cal.groupBy("nc").agg(sum(col("c")).as("c")),
          "nc", col("c"), nCal - k + 1)._1
      val ev = mat.filter(!col("is_cal"))
        .select(col("c"),
          when(col("nc") <= qHat, col("c")).otherwise(0L).as("covered"),
          (((-col("score") <= qHat).cast("long")
            + (col("score") <= qHat).cast("long")) * col("c"))
            .as("set_size"),
          ((-col("score") > qHat && col("score") > qHat).cast("long")
            * col("c")).as("empty"),
          ((-col("score") <= qHat && col("score") <= qHat).cast("long")
            * col("c")).as("both"))
        .agg(sum("c").as("n_eval"),
          sum("covered").as("n_covered"),
          sum("set_size").as("sum_size"),
          sum("empty").as("n_empty"),
          sum("both").as("n_both"))
      ev.selectExpr(s"${nCal}L as n_cal", s"${qHat}L as q_hat", "n_eval",
          """case when n_eval = 0 then 0L else
            | cast(round(1000000.0 * n_covered / n_eval) as bigint) end
            | as coverage_micro""".stripMargin.replace("\n", " "),
          """case when n_eval = 0 then 0L else
            | cast(round(1000000.0 * sum_size / n_eval) as bigint) end
            | as avg_set_micro""".stripMargin.replace("\n", " "),
          """case when n_eval = 0 then 0L else
            | cast(round(1000000.0 * n_empty / n_eval) as bigint) end
            | as frac_empty_micro""".stripMargin.replace("\n", " "),
          """case when n_eval = 0 then 0L else
            | cast(round(1000000.0 * n_both / n_eval) as bigint) end
            | as frac_both_micro""".stripMargin.replace("\n", " "))
        .localCheckpoint() // outlives the released inference checkpoint
    } finally release()
  }

  def qConformal(spark: SparkSession, dir: String): DataFrame =
    conformal(CorpusOps.qClassifierInfer(spark, dir))

  /** Oracle replay: the FULL classifier training unroll (the
    * qClassifierEval posture), the seeded split, the conformal rank
    * via row_number, and the eval rollup. */
  val qConformalSql: String = {
    val wT = s"w${CorpusOps.classifierTrainRounds}"
    s"""${CorpusOps.classifierTrainCtes},
      |final_score AS MATERIALIZED (
      |  SELECT f.doc_id, SUM(f.cnt * COALESCE(w.wgt, 0)) AS score
      |  FROM feats f LEFT JOIN $wT w USING (bucket) GROUP BY 1),
      |scored AS MATERIALIZED (
      |  SELECT s.doc_id, CAST(s.score AS BIGINT) AS score, l.y,
      |    CAST(CAST('0x' || substr(md5('cal:'
      |        || CAST(s.doc_id AS VARCHAR)), 1, 15)
      |      AS UBIGINT) AS BIGINT) % 2 = 0 AS is_cal,
      |    CASE WHEN l.y = 1 THEN -CAST(s.score AS BIGINT)
      |      ELSE CAST(s.score AS BIGINT) END AS nc
      |  FROM final_score s JOIN lab l USING (doc_id)),
      |ck AS (
      |  SELECT COUNT(*) AS n_cal,
      |    ((COUNT(*) + 1) * ($alphaDen - $alphaNum)
      |      + $alphaDen - 1) // $alphaDen AS k
      |  FROM scored WHERE is_cal),
      |-- k > n_cal (tiny calibration): no finite quantile exists, the
      |-- rn = k row is absent and q_hat falls through to +inf — every
      |-- prediction set is {0,1}, mirroring the Spark degenerate case
      |qh AS (
      |  SELECT COALESCE(MAX(CASE WHEN rn = k THEN nc END),
      |      9223372036854775807) AS q_hat
      |  FROM (SELECT nc, row_number() OVER (ORDER BY nc ASC) AS rn
      |        FROM scored WHERE is_cal), ck),
      |ev AS (
      |  SELECT COUNT(*) AS n_eval,
      |    SUM(CASE WHEN nc <= q_hat THEN 1 ELSE 0 END) AS n_covered,
      |    SUM((CASE WHEN -score <= q_hat THEN 1 ELSE 0 END)
      |      + (CASE WHEN score <= q_hat THEN 1 ELSE 0 END)) AS sum_size,
      |    SUM(CASE WHEN -score > q_hat AND score > q_hat
      |        THEN 1 ELSE 0 END) AS n_empty,
      |    SUM(CASE WHEN -score <= q_hat AND score <= q_hat
      |        THEN 1 ELSE 0 END) AS n_both
      |  FROM scored, qh WHERE NOT is_cal)
      |SELECT CAST(ck.n_cal AS BIGINT) AS n_cal,
      |  CAST(qh.q_hat AS BIGINT) AS q_hat,
      |  CAST(ev.n_eval AS BIGINT) AS n_eval,
      |  CASE WHEN ev.n_eval = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * ev.n_covered / ev.n_eval) AS BIGINT) END
      |    AS coverage_micro,
      |  CASE WHEN ev.n_eval = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * ev.sum_size / ev.n_eval) AS BIGINT) END
      |    AS avg_set_micro,
      |  CASE WHEN ev.n_eval = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * ev.n_empty / ev.n_eval) AS BIGINT) END
      |    AS frac_empty_micro,
      |  CASE WHEN ev.n_eval = 0 THEN 0 ELSE
      |    CAST(ROUND(1000000.0 * ev.n_both / ev.n_eval) AS BIGINT) END
      |    AS frac_both_micro
      |FROM ck, qh, ev""".stripMargin
  }
}
