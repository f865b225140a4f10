package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** K-ANONYMITY / L-DIVERSITY PROFILE (Sweeney 2002; Machanavajjhala
  * et al. 2007) — the privacy-risk measurement a dataset release (or a
  * training-corpus card, [[graft.ext.TextOps.qDatasetCard]]'s missing
  * privacy row) runs before publishing: group the table by its
  * QUASI-IDENTIFIER columns (the combination an adversary can link
  * from the outside) and report, per k threshold, how much of the
  * population sits in equivalence classes smaller than k — those rows
  * are re-identifiable at confidence ≥ 1/k. l-diversity tightens it:
  * a class where every member shares one SENSITIVE value leaks the
  * attribute even when k is large, so the profile also reports the
  * class-level distinct-sensitive-value floor.
  *
  * Instantiation: customers keyed by the (c_nationkey, c_mktsegment)
  * quasi-identifier with c_acctbal's sign+magnitude band as the
  * sensitive attribute — the classic (zip, demographic) → salary
  * shape mapped onto the TPC-H roles.
  *
  * Output, one row per k ∈ {2, 5, 10, 25}:
  * (k, n_classes, n_rows, risk_classes, risk_rows, risk_share,
  *  min_class_size, min_l) — risk_* = classes/rows with class size
  * < k; min_l = the smallest per-class distinct sensitive count
  * (k-independent, repeated per row for a single self-describing
  * table).
  *
  * Scale shape: ONE groupBy over the quasi-identifier (the only
  * corpus-sized shuffle; count + distinct-sensitive per class ride
  * the same partial agg), then every k threshold is a conditional
  * aggregate over the |classes| count table — the
  * [[DataQuality.qSkewProfile]] posture. Exact integer counts; the
  * one double (risk_share) is a single division of exact longs. */
object Anonymity {

  val kThresholds: Seq[Int] = Seq(2, 5, 10, 25)

  /** Core over any frame: `qi` = quasi-identifier columns, `sensitive`
    * = the attribute l-diversity protects. */
  def kAnonymityProfile(df: DataFrame, qi: Seq[String],
                        sensitive: String): DataFrame = {
    val classes = df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        countDistinct(col(sensitive)).as("l"))
    val spark = df.sparkSession
    import spark.implicits._
    val ks = kThresholds.toDF("k")
    // |classes| × |k| — both bounded; the corpus is long gone
    classes.crossJoin(broadcast(ks))
      .groupBy("k")
      .agg(count(lit(1)).as("n_classes"),
        sum(col("sz")).as("n_rows"),
        sum(when(col("sz") < col("k"), 1L).otherwise(0L))
          .as("risk_classes"),
        sum(when(col("sz") < col("k"), col("sz")).otherwise(0L))
          .as("risk_rows"),
        min(col("sz")).as("min_class_size"),
        min(col("l")).as("min_l"))
      .withColumn("risk_share",
        col("risk_rows").cast(DoubleType) / col("n_rows").cast(DoubleType))
      .select(col("k"), col("n_classes"), col("n_rows"),
        col("risk_classes"), col("risk_rows"), col("risk_share"),
        col("min_class_size"), col("min_l"))
  }

  /** Driver query: the customer table under the
    * (c_nationkey, c_mktsegment) quasi-identifier with the banded
    * account balance (sign + 1000-wide magnitude bucket) sensitive. */
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame =
    kAnonymityProfile(
      Tables(spark, dir, "customer")
        .withColumn("bal_band",
          (floor(col("c_acctbal") / 1000.0)).cast(LongType)),
      Seq("c_nationkey", "c_mktsegment"), "bal_band")

  val qKAnonymitySql: String = {
    val ks = kThresholds.mkString(", ")
    s"""WITH classes AS MATERIALIZED (
      |  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS sz,
      |    CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
      |      AS BIGINT) AS l
      |  FROM customer GROUP BY 1, 2),
      |ks AS (SELECT unnest([$ks]) AS k)
      |SELECT CAST(k AS INTEGER) AS k,
      |  CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(SUM(sz) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
      |    AS risk_classes,
      |  CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
      |    AS risk_rows,
      |  CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS DOUBLE)
      |    / CAST(SUM(sz) AS DOUBLE) AS risk_share,
      |  CAST(MIN(sz) AS BIGINT) AS min_class_size,
      |  CAST(MIN(l) AS BIGINT) AS min_l
      |FROM classes CROSS JOIN ks
      |GROUP BY 1""".stripMargin
  }
}
