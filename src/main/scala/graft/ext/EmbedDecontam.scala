package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** EMBEDDING-SPACE DECONTAMINATION — the semantic complement of
  * [[TextOps]]' n-gram decontamination (q_decontaminate): an eval
  * document that was paraphrased, translated or reformatted into the
  * training corpus shares no 8-gram with its source, but its embedding
  * still sits next to it. Flag every train vector whose cosine against
  * ANY eval vector reaches [[decontamCos]] (the Gemini/GPT-4 report
  * posture of checking eval contamination in representation space).
  *
  * Output: one row per contaminated train vector — how many eval
  * vectors it collides with and the worst (max) cosine, the table an
  * auditor ranks by max_cos and reads top-down.
  *
  * DETERMINISM. The eval split is the md5-free integer coin vec_id %
  * 17 = 3 (engine-portable); each cosine is the codegen'd
  * [[Similarity.dot]] left-to-right fold the ANN family already
  * hash-checks (q_ann_cosine_by_id); MAX over doubles and the hit
  * count are order-free.
  *
  * SCALE. The eval battery is SMALL BY NATURE (benchmarks are
  * thousands of items, not billions) — it broadcasts, and the scan is
  * map-only at |train|·|eval| multiply-adds with nothing shuffled: the
  * filter drops clean vectors at scan speed and only the contaminated
  * sliver reaches the aggregate. If an eval battery ever outgrew
  * broadcast, the LSH-banded pair mining [[Similarity]] uses for
  * embedNearDup is the same-semantics fallback; the brute path is the
  * exact reference the banded one is specced against. */
object EmbedDecontam {

  /** Contamination threshold: unit-normalized corpus, so dot = cosine;
    * 0.35 sits far above the null cross-pair distribution's p99
    * (≈ 0.29 measured) — flags semantic neighborhood, not noise. */
  val decontamCos = 0.35

  val evalMod = 17L
  val evalRes = 3L

  /** Parameterized entry (ScaleCheck passes a corpus-proportional
    * `mod` so the timed eval battery stays CONSTANT-size — the
    * documented contract). */
  def embedDecontam(emb: DataFrame, mod: Long): DataFrame = {
    val ev = emb.filter(pmod(col("vec_id"), lit(mod)) === evalRes)
      .select(col("vec_id").as("eval_id"), col("embedding").as("e"))
    val tr = emb.filter(pmod(col("vec_id"), lit(mod)) =!= evalRes)
    tr.join(broadcast(ev),
        Similarity.dot(col("embedding"), col("e")) >= decontamCos)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_hits"),
        max(Similarity.dot(col("embedding"), col("e"))).as("max_cos"))
  }

  def qEmbedDecontam(spark: SparkSession, dir: String): DataFrame =
    embedDecontam(Tables(spark, dir, "embeddings"), evalMod)

  val qEmbedDecontamSql: String =
    s"""WITH ev AS (
      |  SELECT vec_id AS eval_id, embedding AS e
      |  FROM embeddings WHERE vec_id % $evalMod = $evalRes),
      |tr AS (
      |  SELECT vec_id, embedding
      |  FROM embeddings WHERE vec_id % $evalMod <> $evalRes),
      |hits AS (
      |  SELECT tr.vec_id,
      |    list_sum(list_transform(list_zip(tr.embedding, ev.e),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS cos
      |  FROM tr CROSS JOIN ev)
      |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
      |  MAX(cos) AS max_cos
      |FROM hits WHERE cos >= $decontamCos
      |GROUP BY vec_id""".stripMargin
}
