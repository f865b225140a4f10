package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** WORD BURSTINESS & DISPERSION — two corpus-linguistics lenses on
  * HOW a word's occurrences distribute, which raw frequency hides:
  *
  * 1. BURSTINESS / ADAPTATION (Church & Gale 1995): a word's mean
  *    occurrences per containing document cf/df, against the
  *    Poisson-expected document frequency N·(1 − e^(−cf/N)). Words
  *    with df far below expectation "burst" — they concentrate in
  *    few documents (entities, topics) rather than spreading
  *    (function words). The adaptation ratio df/E[df] near 0 is the
  *    topical-word signature.
  *
  * 2. GRIES' DP DISPERSION (Gries 2008): how unevenly a word spreads
  *    across SOURCES relative to the sources' sizes,
  *    DP = ½·Σ_s |f_sw/cf_w − t_s/T| ∈ [0, 1) — 0 = perfectly
  *    proportional, →1 = confined to one source. The corpus-mixture
  *    complement to [[FightinWords]] (which asks about ONE split;
  *    DP asks about the whole source layout).
  *
  * DETERMINISM. Both ride exact integer count tables; DP's sum is
  * cross-multiplied to the common denominator cf_w·T so the numerator
  * Σ|f·T − t·cf| is an EXACT integer in DECIMAL(38,0)/HUGEINT — no
  * per-term float at all; burstiness has one exp per word over
  * integers. Top-k orders break ties on the word.
  *
  * SCALE. One tokenize scan each → (doc, word) / (source, word)
  * partial aggs (vocab-bounded); the DP join against per-source
  * totals is grid-sized broadcast. */
object WordDispersion {

  val topK = 20

  /** Only words with at least this many occurrences rank (noise
    * floor — hapax words trivially maximize both statistics). */
  val minCf = 20L

  def wordBurstiness(docs: DataFrame): DataFrame = {
    val dw = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    dw.groupBy("w")
      .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"))
      .filter(col("cf") >= minCf)
      .crossJoin(broadcast(nDocs))
      .selectExpr("w as word", "df", "cf",
        "cast(round(1000000.0 * cast(cf as double) / cast(df as double))"
          + " as bigint) as burst_micro",
        """cast(round(1000000.0 * cast(df as double)
          | / (cast(nd as double)
          |    * (1.0 - exp(-cast(cf as double) / cast(nd as double)))))
          | as bigint) as adapt_micro""".stripMargin.replace("\n", " "))
      .orderBy(col("burst_micro").desc, col("word").asc)
      .limit(topK)
  }

  def qWordBurstiness(spark: SparkSession, dir: String): DataFrame =
    wordBurstiness(Tables(spark, dir, "documents"))

  val qWordBurstinessSql: String =
    s"""WITH dw AS (
       |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
       |        FROM documents)
       |  WHERE w <> '' GROUP BY 1, 2),
       |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
       |agg AS (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS df,
       |    CAST(SUM(c) AS BIGINT) AS cf
       |  FROM dw GROUP BY w)
       |SELECT word, df, cf,
       |  CAST(ROUND(1000000.0 * CAST(cf AS DOUBLE) / CAST(df AS DOUBLE))
       |    AS BIGINT) AS burst_micro,
       |  CAST(ROUND(1000000.0 * CAST(df AS DOUBLE)
       |    / (CAST(nd AS DOUBLE)
       |       * (1.0 - exp(-CAST(cf AS DOUBLE) / CAST(nd AS DOUBLE)))))
       |    AS BIGINT) AS adapt_micro
       |FROM agg, nd
       |WHERE cf >= $minCf
       |ORDER BY burst_micro DESC, word ASC
       |LIMIT $topK""".stripMargin

  /** Gries' DP: the [[topK]] most source-confined words. */
  def wordDispersion(docs: DataFrame): DataFrame = {
    val wc = ChaoRichness.wordCounts(docs)
    dispersionFromWordCounts(wc)
  }

  /** From any (source, w, c) count table (the
    * [[graft.streaming.TextStatsStore]] wc monoid). */
  def dispersionFromWordCounts(wcIn: DataFrame): DataFrame = {
    val (wc, _) = graft.util.Checkpoints.checkpointTracked(wcIn)
    val st = wc.groupBy(col("source").as("s2")).agg(sum("c").as("t"))
    val tot = st.agg(sum("t").as("tt"))
    val cfw = wc.groupBy(col("w").as("w2")).agg(sum("c").as("cf"))
    // dense word × source grid: absent cells carry |0 − t_s·cf| mass
    cfw.filter(col("cf") >= minCf)
      .crossJoin(broadcast(st))
      .join(wc, col("w2") === col("w") && col("s2") === col("source"),
        "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
      .withColumn("num",
        abs(col("c").cast(DecimalType(38, 0)) * col("tt")
          - col("t").cast(DecimalType(38, 0)) * col("cf")))
      .groupBy(col("w2").as("word"), col("cf"), col("tt"))
      .agg(sum(col("num")).as("numsum"))
      .selectExpr("word", "cf",
        """cast(round(1000000.0 * cast(numsum as double)
          | / (2.0 * cast(cf as double) * cast(tt as double)))
          | as bigint) as dp_micro""".stripMargin.replace("\n", " "))
      .orderBy(col("dp_micro").desc, col("word").asc)
      .limit(topK)
  }

  def qWordDispersion(spark: SparkSession, dir: String): DataFrame =
    wordDispersion(Tables(spark, dir, "documents"))

  val qWordDispersionSql: String =
    s"""WITH wc AS MATERIALIZED (
       |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS w
       |        FROM documents)
       |  WHERE w <> '' GROUP BY 1, 2),
       |st AS (SELECT source AS s2, CAST(SUM(c) AS BIGINT) AS t
       |  FROM wc GROUP BY 1),
       |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS tt FROM st),
       |cfw AS (SELECT w AS w2, CAST(SUM(c) AS BIGINT) AS cf
       |  FROM wc GROUP BY 1),
       |dense AS (
       |  SELECT cfw.w2, cfw.cf, st.s2, st.t, COALESCE(wc.c, 0) AS c
       |  FROM cfw CROSS JOIN st
       |  LEFT JOIN wc ON wc.w = cfw.w2 AND wc.source = st.s2
       |  WHERE cfw.cf >= $minCf),
       |agg AS (
       |  SELECT w2 AS word, cf,
       |    SUM(ABS(CAST(c AS HUGEINT) * (SELECT tt FROM tot)
       |      - CAST(t AS HUGEINT) * cf)) AS numsum
       |  FROM dense GROUP BY 1, 2)
       |SELECT word, cf,
       |  CAST(ROUND(1000000.0 * CAST(numsum AS DOUBLE)
       |    / (2.0 * CAST(cf AS DOUBLE)
       |       * CAST((SELECT tt FROM tot) AS DOUBLE))) AS BIGINT)
       |    AS dp_micro
       |FROM agg
       |ORDER BY dp_micro DESC, word ASC
       |LIMIT $topK""".stripMargin
}
