package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** ISOTONIC CALIBRATION (pool-adjacent-violators) of a document-quality
  * score against a binary keep label, plus the confident-learning
  * label-noise flags the calibrated curve enables — the two ML-ops
  * reads a curation team runs before trusting a scorer's raw values:
  * "what keep-probability does score s actually correspond to?" and
  * "which labels does the calibrated model itself disbelieve?"
  * (Zadrozny & Elkan 2002 for the calibration; Northcutt, Jiang & Chuang
  * 2021's confident-learning framing for the noise flags.)
  *
  * The fit uses the MINIMAX identity for weighted isotonic L2
  * regression (Robertson, Wright & Dykstra 1988, §1.2): over score
  * buckets b₁ < … < b_B with keep counts pos and totals cnt,
  *
  *   iso(k) = max_{i ≤ k} min_{j ≥ i} Σ_{b∈[i..j]} pos / Σ_{b∈[i..j]} cnt
  *
  * — no sequential pooling loop, so the sequential PAVA algorithm
  * becomes a B²-pair computation over the BOUNDED bucket table, fully
  * in-plan. Interval averages come from prefix sums, the inner min /
  * outer max are plain aggregates. The minimax is taken over the
  * micro-QUANTIZED interval averages (one truncating integer division
  * each — engine-portable); max-of-min over any fixed matrix is
  * monotone nondecreasing in k, so the quantized fit is itself a valid
  * isotonic curve, within 10⁻⁶ of the real-valued PAVA fit.
  *
  * SCORE and LABEL: the Kneser-Ney naturalness score (exact integer,
  * [[KneserNey]]) calibrated against the len/punct/stopword heuristic
  * gate — i.e. "P(passes the editorial gate | LM naturalness)", the
  * curve that lets a pipeline REPLACE the expensive gate with a
  * thresholded LM score at a chosen operating point.
  *
  * SCALE. One scan to (score, label) + one 1-row min/max aggregate
  * (broadcast back — the [[graft.operators.HistogramQuantiles]]
  * two-phase fixed-width-bucket pattern), one partial-agg shuffle to
  * ≤ [[isoBuckets]] bucket rows, then ALL remaining work (prefix sums,
  * B² interval table, minimax, windows) lives on the constant-size
  * bucket domain. Corpus growth touches only the two scans. */
object IsotonicCal {

  /** Fixed bucket budget B: the calibration curve's resolution. B² =
    * 576 interval rows — constant, independent of corpus size. */
  val isoBuckets = 24

  /** Confident-learning thresholds on the CALIBRATED keep probability:
    * a keep-labeled doc in a bucket calibrated under pLow, or a
    * drop-labeled doc in a bucket calibrated over pHigh, is flagged. */
  val pLowMicro = 250000L
  val pHighMicro = 750000L

  /** (doc_id, s, y): KN integer naturalness score + heuristic-gate
    * label, for every doc the LM can score (≥ 1 bigram). */
  def scoredLabeled(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val t = split(col("text"), " ")
    val lab = docs.select(col("doc_id"),
      ((length(col("text")) >= 100) &&
        (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
          greatest(length(col("text")), lit(1))) <= 0.3 &&
        (size(filter(t, x => x.isInCollection(TextOps.stopwords)))
          .cast("double") / size(t)) >= 0.01).cast("int").as("y"))
    KneserNey.qKneserNey(spark, dir)
      .filter(col("n_bigrams") > 0)
      .selectExpr("doc_id", "-(kn_nll_micro div n_bigrams) as s")
      .join(lab, Seq("doc_id"))
  }

  /** Per-SCORE sufficient statistics (s, cnt, pos) — the sum monoid
    * [[graft.streaming.CalibrationStore]] maintains incrementally
    * (score-domain-bounded state, the ConformalStore posture). */
  def scoreGroups(sl: DataFrame): DataFrame =
    sl.groupBy("s").agg(count(lit(1)).as("cnt"),
      sum(col("y").cast("bigint")).as("pos"))

  /** The fixed-width bucket table (bucket, lo_score, cnt, pos) — ≤ B
    * rows; `lo_score` is the bucket's inclusive lower score bound.
    * Bucket boundaries derive from the CURRENT min/max, so the
    * streaming view recomputes them from merged state rather than
    * freezing stale bounds. */
  def bucketTableFromGroups(groups: DataFrame): DataFrame = {
    val mm = groups.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
    groups.crossJoin(broadcast(mm))
      .selectExpr("cast((s - lo) div ((hi - lo) div "
          + s"$isoBuckets + 1) as bigint) as bucket",
        s"lo + cast((s - lo) div ((hi - lo) div $isoBuckets + 1) "
          + s"as bigint) * ((hi - lo) div $isoBuckets + 1) as lo_score",
        "cnt", "pos")
      .groupBy("bucket", "lo_score")
      .agg(sum(col("cnt")).as("cnt"), sum(col("pos")).as("pos"))
  }

  def bucketTable(sl: DataFrame): DataFrame =
    bucketTableFromGroups(scoreGroups(sl))

  /** Minimax isotonic fit over any (bucket, lo_score, cnt, pos) bucket
    * table — adds raw_micro and iso_micro. Every window here is over
    * the ≤ B-row bucket domain, never over data. */
  def isotonicFromBuckets(bt: DataFrame): DataFrame = {
    val wb = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bt
      .withColumn("cc", sum(col("cnt")).over(wb))
      .withColumn("pp", sum(col("pos")).over(wb))
      .withColumn("ccx", col("cc") - col("cnt"))
      .withColumn("ppx", col("pp") - col("pos"))
    val i = cum.select(col("bucket").as("bi"), col("ccx"), col("ppx"))
    val j = cum.select(col("bucket").as("bj"), col("cc"), col("pp"))
    // B² interval rows: v = quantized average of buckets [bi..bj]
    val intervals = i.join(j, col("bi") <= col("bj"))
      .selectExpr("bi", "bj",
        "((pp - ppx) * 1000000L) div (cc - ccx) as v")
    val rmin = intervals.groupBy("bi").agg(min(col("v")).as("r"))
    val fit = rmin
      .withColumn("iso_micro", max(col("r")).over(
        Window.orderBy("bi")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("bi").as("bucket"), col("iso_micro"))
    bt.join(fit, Seq("bucket"))
      .selectExpr("bucket", "lo_score", "cnt", "pos",
        "(pos * 1000000L) div cnt as raw_micro", "iso_micro")
  }

  def qIsotonicCal(spark: SparkSession, dir: String): DataFrame =
    isotonicFromBuckets(bucketTable(scoredLabeled(spark, dir)))

  /** Confident-learning label-noise flags: docs whose label the
    * CALIBRATED curve disbelieves. Bounded-table broadcast join back
    * onto the scan — map-only over the corpus. */
  def qLabelNoise(spark: SparkSession, dir: String): DataFrame = {
    val sl = scoredLabeled(spark, dir)
    val fit = isotonicFromBuckets(bucketTable(sl))
      .select(col("bucket"), col("iso_micro"))
    val mm = sl.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
    sl.crossJoin(broadcast(mm))
      .selectExpr("doc_id", "s", "y",
        s"cast((s - lo) div ((hi - lo) div $isoBuckets + 1) as bigint)"
          + " as bucket")
      .join(broadcast(fit), Seq("bucket"))
      .filter((col("y") === 1 && col("iso_micro") <= pLowMicro) ||
        (col("y") === 0 && col("iso_micro") >= pHighMicro))
      .selectExpr("doc_id", "bucket", "s", "y", "iso_micro",
        "case when y = 1 then 'suspect_keep' else 'suspect_drop' end"
          + " as flag")
  }

  /** The scored+labeled CTE prefix (KN score join + gate label) —
    * shared with [[GainsCurve]]'s oracle. */
  private[ext] val slCtes: String =
    s"""${KneserNey.knScoreCtes.replaceFirst("toks AS", "kn_toks AS")
          .replace("FROM toks", "FROM kn_toks")},
      |sl AS MATERIALIZED (
      |  SELECT s.doc_id, -(s.kn_nll_micro // s.n_bigrams) AS s,
      |    CASE WHEN length(d.text) >= 100
      |      AND CAST(len(regexp_extract_all(d.text, '[.,;:!?]'))
      |          AS DOUBLE) / greatest(length(d.text), 1) <= 0.3
      |      AND CAST(len(list_filter(string_split(d.text, ' '),
      |            x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |          / len(string_split(d.text, ' ')) >= 0.01
      |      THEN 1 ELSE 0 END AS y
      |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
      |  WHERE s.n_bigrams > 0)""".stripMargin

  /** Shared oracle prefix: scored+labeled docs, min/max, bucket table,
    * prefix sums, B² intervals, minimax fit. */
  private val isoCtes: String =
    s"""$slCtes,
      |mm AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM sl),
      |bt AS (
      |  SELECT CAST((s - lo) // ((hi - lo) // $isoBuckets + 1)
      |      AS BIGINT) AS bucket,
      |    lo + CAST((s - lo) // ((hi - lo) // $isoBuckets + 1)
      |      AS BIGINT) * ((hi - lo) // $isoBuckets + 1) AS lo_score,
      |    CAST(COUNT(*) AS BIGINT) AS cnt,
      |    CAST(SUM(y) AS BIGINT) AS pos
      |  FROM sl, mm GROUP BY 1, 2),
      |cum AS (
      |  SELECT bucket, lo_score, cnt, pos,
      |    SUM(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
      |      AS cc,
      |    SUM(pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
      |      AS pp
      |  FROM bt),
      |iv AS (
      |  SELECT i.bucket AS bi,
      |    ((j.pp - (i.pp - i.pos)) * 1000000) // (j.cc - (i.cc - i.cnt))
      |      AS v
      |  FROM cum i JOIN cum j ON i.bucket <= j.bucket),
      |rmin AS (SELECT bi, MIN(v) AS r FROM iv GROUP BY bi),
      |fit AS (
      |  SELECT bi AS bucket,
      |    CAST(MAX(r) OVER (ORDER BY bi ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS iso_micro
      |  FROM rmin)""".stripMargin

  val qIsotonicCalSql: String =
    s"""WITH $isoCtes
      |SELECT b.bucket, b.lo_score, b.cnt, b.pos,
      |  (b.pos * 1000000) // b.cnt AS raw_micro, f.iso_micro
      |FROM bt b JOIN fit f ON b.bucket = f.bucket""".stripMargin

  val qLabelNoiseSql: String =
    s"""WITH $isoCtes
      |SELECT sl.doc_id,
      |  CAST((sl.s - mm.lo) // ((mm.hi - mm.lo) // $isoBuckets + 1)
      |    AS BIGINT) AS bucket,
      |  sl.s, sl.y, f.iso_micro,
      |  CASE WHEN sl.y = 1 THEN 'suspect_keep' ELSE 'suspect_drop' END
      |    AS flag
      |FROM sl CROSS JOIN mm
      |JOIN fit f ON f.bucket =
      |  CAST((sl.s - mm.lo) // ((mm.hi - mm.lo) // $isoBuckets + 1)
      |    AS BIGINT)
      |WHERE (sl.y = 1 AND f.iso_micro <= $pLowMicro)
      |   OR (sl.y = 0 AND f.iso_micro >= $pHighMicro)""".stripMargin
}
