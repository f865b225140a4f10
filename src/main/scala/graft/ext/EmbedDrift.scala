package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** EMBEDDING-SPACE DRIFT MONITOR — the representation-level sibling of
  * the value-level drift pair ([[graft.operators.KsDrift]]/
  * [[graft.operators.PsiDrift]]): has each class's REGION of embedding
  * space moved between a reference and a current slice? The raw
  * centroid distance is useless as an alarm — for weakly-clustered
  * labels the centroids are sampling noise and every cosine reads
  * "different" — so the verdict is NOISE-NORMALIZED (the classic
  * two-sample mean-shift calibration):
  *
  *   T = ‖μ_r − μ_c‖² / ((1/n_r + 1/n_c) · tr(Σ_pooled))
  *
  * Under no drift E[‖μ_r−μ_c‖²] = (1/n_r + 1/n_c)·tr(Σ), so T ≈ 1 on
  * the null corpus regardless of how weak the class structure is, and
  * the alarm fires at T ≥ [[driftBarT]] — a real shift of the class
  * mean scales T with n, so at production n even small shifts alarm
  * (which is exactly what a drift monitor should do). The descriptive
  * centroid cosine is surfaced beside it.
  *
  * EXACTNESS. Components are micro-quantized
  * ([[Similarity.embedPrototype]]'s round(x·1e6)); every Σ is an
  * exact integer in DECIMAL(38,0)/HUGEINT, and d², tr and T expand
  * into mirrored div/sqrt expressions of those integers (the
  * count normalizations never fold floats):
  * d² = A/n_r² − 2B/(n_r·n_c) + C/n_c², tr = (D − E/N)/N with
  * A=Σs_r², B=Σs_r·s_c, C=Σs_c², D=N·Σq², E=Σ(s_r+s_c)².
  *
  * SCALE. One posexplode scan → |labels|×dims bounded integer sums →
  * |labels|-row readout. Slices split by vec_id parity (production:
  * snapshot ids). */
object EmbedDrift {

  /** Alarm bar on the noise-normalized statistic: T ≥ 3. */
  val driftBarT = 3000000L

  private val micro = 1000000L

  /** (label, n_ref, n_cur, cos_micro, t_micro, drifted). */
  def embedDrift(emb: DataFrame): DataFrame = {
    def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    val sums = emb
      .withColumn("is_ref", col("vec_id") % 2 === 0)
      .select(col("label"), col("is_ref"),
        posexplode(col("embedding")).as(Seq("j", "x")))
      .withColumn("q", round(col("x").cast("double") * micro).cast("long"))
      .groupBy("label", "j").agg(
        sum(when(col("is_ref"), col("q")).otherwise(0L)).as("sr"),
        sum(when(!col("is_ref"), col("q")).otherwise(0L)).as("sc"),
        sum(d38(col("q")) * col("q")).as("qq"))
    val counts = emb.groupBy("label").agg(
      sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_cur"))
    val agg = sums.groupBy("label").agg(
        sum(d38(col("sr")) * col("sc")).as("b"),
        sum(d38(col("sr")) * col("sr")).as("a"),
        sum(d38(col("sc")) * col("sc")).as("c"),
        sum(col("qq")).as("sqq"),
        sum(d38(col("sr") + col("sc")) * (col("sr") + col("sc"))).as("e"))
      .join(counts, "label")
    // d² and tr as mirrored doubles of the exact integer sums; the
    // µ-quantization scale cancels between numerator and denominator
    val d2 =
      """(cast(a as double) / (cast(n_ref as double) * n_ref)
        | - 2.0 * cast(b as double) / (cast(n_ref as double) * n_cur)
        | + cast(c as double) / (cast(n_cur as double) * n_cur))"""
        .stripMargin.replace("\n", " ")
    val tr =
      """((cast(sqq as double)
        |   - cast(e as double) / (n_ref + n_cur)) / (n_ref + n_cur))"""
        .stripMargin.replace("\n", " ")
    agg.selectExpr("label", "n_ref", "n_cur",
        """case when a = 0 or c = 0 then 0L else
          | cast(round(1000000.0 * cast(b as double)
          |   / (sqrt(cast(a as double)) * sqrt(cast(c as double))))
          |   as bigint) end as cos_micro""".stripMargin.replace("\n", " "),
        s"""case when n_ref = 0 or n_cur = 0 or $tr <= 0.0 then 0L else
           | cast(round(1000000.0 * $d2
           |   / ((1.0 / n_ref + 1.0 / n_cur) * $tr)) as bigint) end
           | as t_micro""".stripMargin.replace("\n", " "))
      .withColumn("drifted", col("t_micro") >= driftBarT)
      .orderBy("label")
  }

  def qEmbedDrift(spark: SparkSession, dir: String): DataFrame =
    embedDrift(Tables(spark, dir, "embeddings"))

  val qEmbedDriftSql: String = {
    val d2 =
      """(CAST(a AS DOUBLE) / (CAST(n_ref AS DOUBLE) * n_ref)
        | - 2.0 * CAST(b AS DOUBLE) / (CAST(n_ref AS DOUBLE) * n_cur)
        | + CAST(c AS DOUBLE) / (CAST(n_cur AS DOUBLE) * n_cur))"""
        .stripMargin.replace("\n", " ")
    val tr =
      """((CAST(sqq AS DOUBLE)
        |   - CAST(e AS DOUBLE) / (n_ref + n_cur)) / (n_ref + n_cur))"""
        .stripMargin.replace("\n", " ")
    s"""WITH ex AS MATERIALIZED (
       |  SELECT label, vec_id % 2 = 0 AS is_ref,
       |    CAST(round(CAST(embedding[u.j] AS DOUBLE) * $micro) AS BIGINT)
       |      AS q,
       |    u.j AS j
       |  FROM embeddings,
       |    LATERAL unnest(generate_series(1, len(embedding))) AS u(j)),
       |sums AS (
       |  SELECT label, j,
       |    SUM(CASE WHEN is_ref THEN q ELSE 0 END) AS sr,
       |    SUM(CASE WHEN NOT is_ref THEN q ELSE 0 END) AS sc,
       |    SUM(q * q) AS qq
       |  FROM ex GROUP BY 1, 2),
       |agg AS (
       |  SELECT label, SUM(sr * sc) AS b, SUM(sr * sr) AS a,
       |    SUM(sc * sc) AS c, SUM(qq) AS sqq,
       |    SUM((sr + sc) * (sr + sc)) AS e
       |  FROM sums GROUP BY 1),
       |counts AS (
       |  SELECT label,
       |    SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS n_ref,
       |    SUM(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS n_cur
       |  FROM embeddings GROUP BY 1),
       |fin AS (
       |  SELECT g.label, CAST(c2.n_ref AS BIGINT) AS n_ref,
       |    CAST(c2.n_cur AS BIGINT) AS n_cur,
       |    g.a, g.b, g.c, g.sqq, g.e
       |  FROM agg g JOIN counts c2 USING (label))
       |SELECT label, n_ref, n_cur,
       |  CASE WHEN a = 0 OR c = 0 THEN 0 ELSE
       |    CAST(round(1000000.0 * CAST(b AS DOUBLE)
       |      / (sqrt(CAST(a AS DOUBLE)) * sqrt(CAST(c AS DOUBLE))))
       |      AS BIGINT) END AS cos_micro,
       |  CASE WHEN n_ref = 0 OR n_cur = 0 OR $tr <= 0.0 THEN 0 ELSE
       |    CAST(round(1000000.0 * $d2
       |      / ((1.0 / n_ref + 1.0 / n_cur) * $tr)) AS BIGINT) END
       |    AS t_micro,
       |  CASE WHEN n_ref = 0 OR n_cur = 0 OR $tr <= 0.0 THEN 0 ELSE
       |    CAST(round(1000000.0 * $d2
       |      / ((1.0 / n_ref + 1.0 / n_cur) * $tr)) AS BIGINT) END
       |    >= $driftBarT AS drifted
       |FROM fin ORDER BY label""".stripMargin
  }
}
