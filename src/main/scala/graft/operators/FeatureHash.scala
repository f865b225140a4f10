package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** THE HASHING TRICK (Weinberger et al. 2009, ICML; Vowpal Wabbit's
  * featurizer): project an unbounded token vocabulary into a FIXED
  * 2^k-dimensional sparse vector with a signed hash — bucket from one
  * hash, ±1 sign from an independent bit, so colliding tokens cancel
  * in expectation instead of piling up (the unsigned variant's bias).
  * No vocabulary table, no fit step, no OOV path: the feature space is
  * closed under new data, which is the whole point at 100 TB — a
  * vocab-based featurizer needs a second pass and a broadcast dict
  * that grows with the corpus; this needs neither.
  *
  * Output is the sparse vector in exploded (doc_id, bucket, weight)
  * form, weight = Σ±1 over token OCCURRENCES, exact-zero cancellations
  * dropped (they carry no information and their presence would differ
  * from a dense representation).
  *
  * DETERMINISM: bucket and sign are md5 folds (the repo-wide
  * convention, [[graft.ext.CorpusOps]] classifier precedent); weights
  * are integer sums — no floats anywhere.
  *
  * SCALE: tokenize → map-side (doc, bucket, sign) → one partial agg
  * keyed (doc_id, bucket). Output ≤ min(tokens, n_docs·2^k) rows;
  * nothing global, nothing sorted. */
object FeatureHash {

  /** 2^8 buckets: small enough that sf0.001 exercises collisions (and
    * sign cancellation), the production knob goes to 2^18+. */
  val featureBuckets = 256L

  private def md5mod(c: Column, m: Long): Column =
    conv(substring(md5(c.cast(BinaryType)), 1, 8), 16, 10)
      .cast(LongType) % m

  def featureHash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"),
        md5mod(col("w"), featureBuckets).cast(IntegerType).as("bucket"),
        (lit(1L) - lit(2L) * md5mod(concat(lit("sg"), col("w")), 2L))
          .as("sign"))
      .groupBy("doc_id", "bucket")
      .agg(sum("sign").as("weight"))
      .filter(col("weight") =!= 0L)

  def qFeatureHash(spark: SparkSession, dir: String): DataFrame =
    featureHash(Tables(spark, dir, "documents"))

  val qFeatureHashSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |signed AS (
       |  SELECT doc_id,
       |    CAST(CAST(CAST('0x' || substr(md5(w), 1, 8) AS UBIGINT)
       |      AS BIGINT) % $featureBuckets AS INTEGER) AS bucket,
       |    1 - 2 * (CAST(CAST('0x' || substr(md5('sg' || w), 1, 8)
       |      AS UBIGINT) AS BIGINT) % 2) AS sign
       |  FROM toks WHERE w <> '')
       |SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS weight
       |FROM signed GROUP BY 1, 2
       |HAVING SUM(sign) <> 0""".stripMargin
}
