package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.CorpusOps

/** MUTUAL-INFORMATION FEATURE SELECTION (Yang & Pedersen 1997; the
  * filter-method standard for text features): score every hashed
  * feature bucket by I(present; label) over the SAME md5 bucket space
  * and gate label the quality classifier trains on — the step that
  * turns the 2^k-wide hashing-trick space into the short list of
  * buckets that actually carry label signal (train a leaner model,
  * or audit WHICH features the gate decision rides on).
  *
  *   I(B;Y) = Σ_{i∈{1,0}, j∈{1,0}} (n_ij/N) · ln(N·n_ij / (n_i·n_j))
  *
  * over the per-bucket 2×2 presence/label table; zero cells contribute
  * 0 (the x·ln x → 0 limit), guarded by exact-integer predicates.
  *
  * DETERMINISM: the four counts are exact integers off one scan; each
  * of the four MI terms is micronat-quantized SEPARATELY
  * (round(1e6·term) as BIGINT — the [[graft.ext.KneserNey]]
  * convention) and the bucket's score is their 4-term integer sum, so
  * no float ever crosses an aggregation boundary.
  *
  * SCALE: tokenize → DISTINCT (doc, bucket) presence (one shuffle,
  * the dedup the hashing trick already implies) → per-bucket partial
  * agg to ≤2^k rows; the 3 global counts ride a broadcast. The final
  * ranking is top-k over the BOUNDED bucket table
  * (TakeOrderedAndProject) — nothing corpus-sized ever sorts. */
object MiSelect {

  /** Buckets surfaced (of [[CorpusOps.classifierBuckets]]). */
  val topK = 64

  def miSelect(docs: DataFrame): DataFrame = {
    val lab = docs.select(col("doc_id"), gate().as("y"))
    val present = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"), CorpusOps.wordBucket(col("w")).as("bucket"))
      .distinct()
    val counts = present.join(lab, Seq("doc_id"))
      .groupBy("bucket")
      .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("n11"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("n10"))
    val glob = lab.agg(count(lit(1)).as("nn"),
      sum(col("y").cast("long")).as("k1"))
    def term(nij: String, ni: String, nj: String): String =
      s"""case when ($nij) = 0 then 0L else
         | cast(round(1000000.0 * (cast($nij as double) / nn)
         |   * ln(cast(nn as double) * ($nij)
         |     / (cast($ni as double) * ($nj)))) as bigint) end"""
        .stripMargin.replace("\n", " ")
    counts.crossJoin(broadcast(glob))
      .selectExpr("bucket", "n11", "n10", "nn", "k1",
        "k1 - n11 as n01", "(nn - k1) - n10 as n00",
        "n11 + n10 as p1")
      .selectExpr("bucket", "n11", "n10", "n01", "n00",
        s"""${term("n11", "p1", "k1")} + ${term("n10", "p1", "nn - k1")}
           | + ${term("n01", "nn - p1", "k1")}
           | + ${term("n00", "nn - p1", "nn - k1")} as mi_micro"""
          .stripMargin.replace("\n", " "))
      .orderBy(col("mi_micro").desc, col("bucket").asc)
      .limit(topK)
  }

  /** The classifier's gate label as a Column (mirrors
    * [[CorpusOps.gateSql]] token for token). */
  private def gate() = {
    val t = split(col("text"), " ")
    (length(col("text")) >= 100 &&
      (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
        greatest(length(col("text")), lit(1))) <= 0.3 &&
      (size(filter(t, x => x.isInCollection(
        Seq("the", "a", "of", "and", "to")))).cast("double") /
        size(t)) >= 0.01).cast("int")
  }

  def qMiSelect(spark: SparkSession, dir: String): DataFrame =
    miSelect(Tables(spark, dir, "documents"))

  val qMiSelectSql: String = {
    val b = CorpusOps.classifierBuckets
    def term(nij: String, ni: String, nj: String): String =
      s"""CASE WHEN ($nij) = 0 THEN 0 ELSE
         |  CAST(ROUND(1000000.0 * (CAST($nij AS DOUBLE) / nn)
         |    * ln(CAST(nn AS DOUBLE) * ($nij)
         |      / (CAST($ni AS DOUBLE) * ($nj)))) AS BIGINT) END"""
        .stripMargin
    s"""WITH lab AS MATERIALIZED (
       |  SELECT doc_id, CAST(${CorpusOps.gateSql} AS BIGINT) AS y
       |  FROM documents),
       |present AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |    CAST(CAST('0x' || substr(md5(word), 1, 8) AS UBIGINT) % $b
       |      AS BIGINT) AS bucket
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |        FROM documents)
       |  WHERE word <> ''),
       |counts AS MATERIALIZED (
       |  SELECT bucket,
       |    SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS n11,
       |    SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS n10
       |  FROM present JOIN lab USING (doc_id) GROUP BY 1),
       |gstat AS MATERIALIZED (
       |  SELECT COUNT(*) AS nn, SUM(y) AS k1 FROM lab),
       |wide AS (
       |  SELECT bucket, n11, n10, nn, k1,
       |    k1 - n11 AS n01, (nn - k1) - n10 AS n00,
       |    n11 + n10 AS p1
       |  FROM counts, gstat)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
       |  CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
       |  ${term("n11", "p1", "k1")}
       |    + ${term("n10", "p1", "nn - k1")}
       |    + ${term("n01", "nn - p1", "k1")}
       |    + ${term("n00", "nn - p1", "nn - k1")} AS mi_micro
       |FROM wide
       |ORDER BY mi_micro DESC, bucket ASC
       |LIMIT $topK""".stripMargin
  }
}
