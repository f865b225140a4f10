package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** "FIGHTIN' WORDS" LOG-ODDS (Monroe, Colaresi & Quinn 2008) — the
  * principled corpus-comparison operator: which words distinguish
  * corpus half A from corpus half B, on a scale that neither raw
  * frequency (dominated by common words) nor tf-idf (no variance
  * model) gives? The Dirichlet-smoothed log-odds delta with its
  * variance-standardized z:
  *
  *   δ_w = ln[(y_Aw+α)/(n_A+Vα−y_Aw−α)] − ln[(y_Bw+α)/(n_B+Vα−y_Bw−α)]
  *   z_w = δ_w / sqrt(1/(y_Aw+α) + 1/(y_Bw+α))
  *
  * Instantiation: A = sources src0–src9, B = src10–src19 (the corpus'
  * two halves — the "did the second batch of sources drift
  * lexically" question a mixture planner asks).
  *
  * DETERMINISM. Word counts, totals and vocab size are exact
  * integers off ONE scan; δ and z are single fully-double-cast
  * expressions over those integers with α = 1/2 exactly ([[
  * graft.operators.BayesAb]] posture). Output = top [[topK]] per
  * side by the identically-rounded z (word tie-break).
  *
  * SCALE. One tokenize scan → (word, side) partial agg — bounded by
  * vocab (Heaps-saturating); two 1-row totals broadcast; top-k is
  * TakeOrderedAndProject. */
object FightinWords {

  val topK = 10

  private def deltaExpr(side: String): String = {
    val (y, n) = if (side == "a") ("y_a", "n_a") else ("y_b", "n_b")
    s"""ln((cast($y as double) + 0.5)
       | / (cast($n as double) + 0.5 * v - $y - 0.5))"""
      .stripMargin.replace("\n", " ")
  }

  private def zExpr: String =
    s"""cast(round(1000000.0 * (${deltaExpr("a")} - ${deltaExpr("b")})
       | / sqrt(1.0 / (cast(y_a as double) + 0.5)
       |        + 1.0 / (cast(y_b as double) + 0.5))) as bigint)"""
      .stripMargin.replace("\n", " ")

  /** The (word, y_a, y_b, z_micro, side) table: [[topK]] most
    * A-leaning and B-leaning words. `half` must map a source name to
    * 'a'/'b'. */
  def fightinWords(docs: DataFrame): DataFrame =
    fightinFromWordCounts(ChaoRichness.wordCounts(docs)
      .withColumnRenamed("w", "word"))

  /** The readout from any (source, word, c) count table — the
    * streaming [[graft.streaming.TextStatsStore]] entry (the stopword
    * gate applies HERE, so the stored monoid carries the full
    * vocabulary and also serves [[ChaoRichness]]). */
  def fightinFromWordCounts(wc: DataFrame): DataFrame = {
    val sided = wc
      .filter(!col("word").isInCollection(TextOps.stopwords))
      .withColumn("side",
        // try_cast: a source with NO trailing digits extracts '' —
        // ANSI cast throws where DuckDB's CAST also errors; TRY_CAST
        // on both engines yields NULL < 10 = false ⇒ side 'b'
        // (round-16 edge-corpus find)
        when(expr("try_cast(regexp_extract(source, '([0-9]+)$', 1)" +
          " as int)") < 10, "a").otherwise("b"))
    // the vocab-bounded count table feeds the 1-row totals AND the
    // scoring leg (and scored feeds two top-k legs) — materialize
    // once so the tokenize scan happens once (plan-asserted)
    val (counts, _) = graft.util.Checkpoints.checkpointTracked(
      sided.groupBy("word").agg(
        sum(when(col("side") === "a", col("c")).otherwise(0L)).as("y_a"),
        sum(when(col("side") === "b", col("c")).otherwise(0L)).as("y_b")))
    val tot = counts.agg(sum("y_a").as("n_a"), sum("y_b").as("n_b"),
      count(lit(1)).as("v"))
    val scored = counts.crossJoin(broadcast(tot))
      .selectExpr("word", "y_a", "y_b", s"$zExpr as z_micro")
    val topA = scored.orderBy(col("z_micro").desc, col("word").asc)
      .limit(topK).withColumn("side", lit("a"))
    val topB = scored.orderBy(col("z_micro").asc, col("word").asc)
      .limit(topK).withColumn("side", lit("b"))
    topA.unionAll(topB)
  }

  def qFightinWords(spark: SparkSession, dir: String): DataFrame =
    fightinWords(Tables(spark, dir, "documents"))

  val qFightinWordsSql: String = {
    val stop = TextOps.stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT CASE WHEN TRY_CAST(regexp_extract(source, '([0-9]+)$$', 1)
       |      AS INTEGER) < 10 THEN 'a' ELSE 'b' END AS side,
       |    UNNEST(string_split(text, ' ')) AS word
       |  FROM documents),
       |counts AS (
       |  SELECT word,
       |    CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS y_a,
       |    CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS y_b
       |  FROM toks
       |  WHERE word NOT IN ($stop) AND word <> ''
       |  GROUP BY word),
       |tot AS (SELECT CAST(SUM(y_a) AS BIGINT) AS n_a,
       |    CAST(SUM(y_b) AS BIGINT) AS n_b,
       |    CAST(COUNT(*) AS BIGINT) AS v
       |  FROM counts),
       |scored AS MATERIALIZED (
       |  SELECT word, y_a, y_b, $zExpr AS z_micro
       |  FROM counts, tot)
       |SELECT * FROM (
       |  (SELECT word, y_a, y_b, z_micro, 'a' AS side FROM scored
       |   ORDER BY z_micro DESC, word ASC LIMIT $topK)
       |  UNION ALL
       |  (SELECT word, y_a, y_b, z_micro, 'b' AS side FROM scored
       |   ORDER BY z_micro ASC, word ASC LIMIT $topK))""".stripMargin
  }
}
