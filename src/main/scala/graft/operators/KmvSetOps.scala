package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** KMV SKETCH SET ALGEBRA — estimated Jaccard / intersection / union
  * size between every pair of event-type audiences, from bottom-k
  * sketches alone (Beyer et al. 2007, "On synopses for distinct-value
  * estimation under multiset operations" — the K_∩/k Jaccard estimator
  * over the union sketch). This is the capability that makes distinct
  * sketches COMPOSABLE: audience-overlap matrices, cross-snapshot
  * novelty, retention set math — all answered from k-row summaries
  * instead of corpus-sized set joins.
  *
  * Estimators, for pair (A, B) with union sketch = k smallest distinct
  * hashes of A∪B and τ = its k-th value:
  *   J = |{h ∈ union sketch : h ∈ A ∧ h ∈ B}| / k
  *   |A∪B| = (k−1)·2⁶⁰/τ   (exact when the union has < k members)
  *   |A∩B| = J·|A∪B|
  *
  * Scale shape: ONE corpus scan builds the distinct (type, user) set;
  * per-type bottom-k is a type-partitioned TOP-K window over md5-Horner
  * hashes (partial top-k heaps per partition — the KMV merge IS
  * bottom-k of a union, so this is also how per-day sketches would
  * roll up, [[graft.streaming.KmvStore]]'s algebra). EVERYTHING
  * pairwise then happens on |types|·k sketch rows — the |types|² pair
  * matrix never touches the corpus. The exact Jaccard column (one
  * distinct-pair self-join) is the built-in accuracy audit, same
  * posture as the ANN probes' recall column; a pure-production run
  * would drop it.
  *
  * Determinism: md5-Horner 60-bit hashes are engine-portable
  * ([[graft.ext.Similarity.qApproxDistinctDet]] precedent); counts
  * are exact longs; the three estimates are correctly-rounded double
  * expressions over exact longs, identical in both engines. */
object KmvSetOps {

  val kmvK = 128
  private val two60 = 1152921504606846976.0 // 2^60 as an exact double

  /** Pairwise audience overlap between event types:
    * (type_a, type_b, k_used, est_jaccard, est_union, est_intersect,
    * exact_jaccard). */
  def qKmvIntersect(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    kmvOverlap(ev.select(col("event_type").as("t"),
      col("user_id").as("u")))
  }

  /** Core over an explicit membership frame `duIn(t, u)` (t = set
    * label, u = member key). */
  def kmvOverlap(duIn: DataFrame, k: Int = kmvK): DataFrame = {
    val du = duIn.select("t", "u").distinct()
    // distinct on (t, h), not just (t, u): a 60-bit collision between
    // two members of one set would otherwise leave duplicate h rows in
    // the sketch, and the later (t, h) equi-joins would double-count —
    // the KMV state is a SET of hashes by definition (Beyer et al. §3)
    val hashed = du.select(col("t"),
      conv(substring(md5(col("u").cast(StringType).cast(BinaryType)), 1, 15),
        16, 10).cast(LongType).as("h"))
      .distinct()
    val wT = Window.partitionBy(col("t")).orderBy(col("h"))
    val sk = hashed.withColumn("rn", row_number().over(wT))
      .filter(col("rn") <= k).select("t", "h")
    // the |types|² pair frame over the tiny sketch table
    val types = sk.select(col("t")).distinct()
    val pairs = types.select(col("t").as("ta"))
      .join(types.select(col("t").as("tb")), col("ta") < col("tb"))
    val skA = sk.select(col("t").as("ta"), col("h"))
    val skB = sk.select(col("t").as("tb"), col("h"))
    val merged = pairs.join(skA, Seq("ta")).select("ta", "tb", "h")
      .unionAll(pairs.join(skB, Seq("tb")).select("ta", "tb", "h"))
      .distinct()
    val wP = Window.partitionBy(col("ta"), col("tb")).orderBy(col("h"))
    val unionSk = merged.withColumn("rn", row_number().over(wP))
      .filter(col("rn") <= k)
    // membership flags via semi-join-shaped left joins on the sketches
    val flagged = unionSk
      .join(skA.select(col("ta"), col("h"), lit(1).as("in_a")),
        Seq("ta", "h"), "left")
      .join(skB.select(col("tb"), col("h"), lit(1).as("in_b")),
        Seq("tb", "h"), "left")
    val est = flagged.groupBy("ta", "tb")
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("tau"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("k_both"))
      .withColumn("est_jaccard",
        col("k_both").cast(DoubleType) / col("k_used").cast(DoubleType))
      .withColumn("est_union",
        when(col("k_used") < k, col("k_used").cast(DoubleType))
          .otherwise((col("k_used").cast(DoubleType) - 1.0) * two60 /
            col("tau").cast(DoubleType)))
      .withColumn("est_intersect", col("est_jaccard") * col("est_union"))
    // exact audit: |A∩B| and |A|,|B| from the distinct (type,user) set
    val f = du.groupBy("t").agg(count(lit(1)).as("f"))
    val inter = du.select(col("t").as("ta"), col("u"))
      .join(du.select(col("t").as("tb"), col("u")), "u")
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("inter"))
    val exact = inter
      .join(f.select(col("t").as("ta"), col("f").as("fa")), "ta")
      .join(f.select(col("t").as("tb"), col("f").as("fb")), "tb")
      .withColumn("exact_jaccard", col("inter").cast(DoubleType) /
        (col("fa") + col("fb") - col("inter")).cast(DoubleType))
      .select("ta", "tb", "exact_jaccard")
    est.join(exact, Seq("ta", "tb"), "left")
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("k_used"), col("est_jaccard"), col("est_union"),
        col("est_intersect"),
        // a pair absent from the intersection table IS a 0 intersection
        coalesce(col("exact_jaccard"), lit(0.0)).as("exact_jaccard"))
  }

  val qKmvIntersectSql: String =
    s"""WITH du AS (
       |  SELECT DISTINCT event_type AS t, user_id AS u FROM events),
       |hashed AS (
       |  SELECT DISTINCT t, CAST(CAST('0x' || substr(md5(CAST(u AS VARCHAR)),
       |    1, 15) AS UBIGINT) AS BIGINT) AS h
       |  FROM du),
       |sk AS (
       |  SELECT t, h FROM (
       |    SELECT t, h, ROW_NUMBER() OVER (PARTITION BY t ORDER BY h) AS rn
       |    FROM hashed) WHERE rn <= $kmvK),
       |pairs AS (
       |  SELECT a.t AS ta, b.t AS tb
       |  FROM (SELECT DISTINCT t FROM sk) a
       |  JOIN (SELECT DISTINCT t FROM sk) b ON a.t < b.t),
       |merged AS (
       |  SELECT DISTINCT ta, tb, h FROM (
       |    SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.t = p.ta
       |    UNION ALL
       |    SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.t = p.tb)),
       |usk AS (
       |  SELECT ta, tb, h FROM (
       |    SELECT ta, tb, h,
       |      ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
       |    FROM merged) WHERE rn <= $kmvK),
       |flagged AS (
       |  SELECT u.ta, u.tb, u.h,
       |    CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END AS in_a,
       |    CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS in_b
       |  FROM usk u
       |  LEFT JOIN sk a ON a.t = u.ta AND a.h = u.h
       |  LEFT JOIN sk b ON b.t = u.tb AND b.h = u.h),
       |est AS (
       |  SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS k_used, MAX(h) AS tau,
       |    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS k_both
       |  FROM flagged GROUP BY 1, 2),
       |f AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS f FROM du GROUP BY 1),
       |inter AS (
       |  SELECT a.t AS ta, b.t AS tb, CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM du a JOIN du b ON a.u = b.u AND a.t < b.t
       |  GROUP BY 1, 2),
       |exact AS (
       |  SELECT i.ta, i.tb,
       |    CAST(i.inter AS DOUBLE)
       |      / CAST(fa.f + fb.f - i.inter AS DOUBLE) AS exact_jaccard
       |  FROM inter i
       |  JOIN f fa ON fa.t = i.ta
       |  JOIN f fb ON fb.t = i.tb)
       |SELECT e.ta AS type_a, e.tb AS type_b, e.k_used,
       |  CAST(e.k_both AS DOUBLE) / CAST(e.k_used AS DOUBLE) AS est_jaccard,
       |  CASE WHEN e.k_used < $kmvK THEN CAST(e.k_used AS DOUBLE)
       |    ELSE (CAST(e.k_used AS DOUBLE) - 1.0) * 1152921504606846976.0
       |      / CAST(e.tau AS DOUBLE) END AS est_union,
       |  (CAST(e.k_both AS DOUBLE) / CAST(e.k_used AS DOUBLE))
       |    * (CASE WHEN e.k_used < $kmvK THEN CAST(e.k_used AS DOUBLE)
       |       ELSE (CAST(e.k_used AS DOUBLE) - 1.0) * 1152921504606846976.0
       |         / CAST(e.tau AS DOUBLE) END) AS est_intersect,
       |  COALESCE(x.exact_jaccard, 0.0) AS exact_jaccard
       |FROM est e LEFT JOIN exact x ON x.ta = e.ta AND x.tb = e.tb""".stripMargin
}
