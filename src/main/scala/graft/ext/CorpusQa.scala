package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CORPUS METADATA QA — two cheap one-pass readouts a curation team
  * runs before trusting the corpus' own labels:
  *
  *  - [[qLangConfusion]]: the confusion matrix between the DECLARED
  *    language column and the n-gram language-ID prediction
  *    ([[TextOps.qLangId]]) — declared metadata is the single most
  *    common lie in scraped corpora, and the confusion matrix is the
  *    standard audit (each cell with its share of the declared
  *    language's mass, so a mislabeled-source row reads directly).
  *  - [[qWordEntropy]]: per-document unigram Shannon entropy — the
  *    distributional repetition signal that complements
  *    [[TextOps.qRepRatio]]'s positional one (a doc alternating two
  *    phrases has LOW entropy but also low bigram-repeat ratio only
  *    if phrases are long; entropy catches degenerate vocabulary
  *    regardless of arrangement). Gopher's repetition rules and
  *    CCNet's perplexity buckets both proxy this; entropy is the
  *    model-free version.
  *
  * DETERMINISM. Confusion cells are exact counts; shares are one
  * mirrored double division each. Entropy follows the suite's
  * per-term quantization convention ([[KneserNey]]): each (doc, word)
  * term is ONE round(1e6 · (c/n)·ln(n/c)) and the per-doc value is
  * the exact integer sum of terms — engine-portable because both
  * sides quantize BEFORE summing.
  *
  * SCALE. Confusion: the map-only lang-ID scan + a ≤|langs|²-cell
  * partial agg + a broadcast ≤|langs|-row marginal join. Entropy: one
  * explode → (doc, word) partial-agg shuffle (the vocab/tfidf shape),
  * one per-doc partial agg, a doc-keyed join — linear, no windows. */
object CorpusQa {

  def qLangConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = TextOps.qLangId(spark, dir)
      .groupBy("lang_declared", "lang_predicted")
      .agg(count(lit(1)).as("n_docs"))
    val marg = cells.groupBy("lang_declared")
      .agg(sum(col("n_docs")).as("n_declared"))
    cells.join(broadcast(marg), Seq("lang_declared"))
      .selectExpr("lang_declared", "lang_predicted", "n_docs",
        """cast(round(1000000.0 * cast(n_docs as double)
          | / cast(n_declared as double)) as bigint)
          | as declared_share_micro""".stripMargin.replace("\n", " "))
  }

  val qLangConfusionSql: String =
    s"""WITH base AS (${TextOps.qLangIdSql.replace("\n", "\n  ")}),
      |cells AS (
      |  SELECT lang_declared, lang_predicted,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM base GROUP BY 1, 2),
      |marg AS (
      |  SELECT lang_declared, SUM(n_docs) AS n_declared
      |  FROM cells GROUP BY 1)
      |SELECT c.lang_declared, c.lang_predicted, c.n_docs,
      |  CAST(ROUND(1000000.0 * CAST(c.n_docs AS DOUBLE)
      |    / CAST(m.n_declared AS DOUBLE)) AS BIGINT)
      |    AS declared_share_micro
      |FROM cells c JOIN marg m ON m.lang_declared = c.lang_declared"""
      .stripMargin

  def qWordEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("doc_id").agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_types"))
    counts.join(totals, Seq("doc_id"))
      .selectExpr("doc_id", "n_tokens", "n_types",
        """cast(round(1000000.0
          | * (cast(c as double) / cast(n_tokens as double))
          | * ln(cast(n_tokens as double) / cast(c as double)))
          | as bigint) as t""".stripMargin.replace("\n", " "))
      .groupBy("doc_id", "n_tokens", "n_types")
      .agg(sum(col("t")).as("entropy_micro"))
  }

  /** HEAPS'-LAW FIT — the vocabulary-growth scaling diagnostic
    * (Heaps 1978): V(N) ≈ K·N^β. β near 1 means the source keeps
    * minting new types (ids, hashes, boilerplate noise — bad training
    * signal); β in the natural-language band (~0.4-0.6) means the
    * vocabulary saturates like text should. The curve AND the fit in
    * one query, the capacity-planning input for tokenizer training
    * ([[Bpe]]) and vocab-capped models ([[KneserNey]] capV).
    *
    * SHAPE: the [[Dedup.qCoverageCurve]] min-bucket trick — order the
    * corpus into 10 deterministic md5 buckets; a type's FIRST
    * appearance is its min bucket, so cumulative types at prefix k is
    * a ≤11-row histogram cumsum, and cumulative tokens is a 10-row
    * cumsum of per-bucket token counts: the whole 10-point (N_k, V_k)
    * curve from one exploded-token pass. The log-log OLS fit runs on
    * the constant 10-row spine with (ln N, ln V) quantized to micro
    * integers FIRST (so every cross-engine sum is integer, order-free
    * — the repo's per-term quantization convention) and β as one
    * mirrored double expression.
    *
    * Output, one row per prefix k: cumulative tokens/types, their
    * micro-quantized logs, and the fitted beta_micro / ln-K (micro)
    * repeated on each row (broadcast 1-row fit). */
  def qHeapsLaw(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"),
        (conv(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 15), 16, 10).cast("long") % 10).as("bucket"))
      .filter(col("w") =!= "")
    val perBucketTokens = toks.groupBy("bucket")
      .agg(count(lit(1)).as("nt"))
    val typeMin = toks.groupBy("w").agg(min(col("bucket")).as("minb"))
    val typeHist = typeMin.groupBy("minb").agg(count(lit(1)).as("nv"))
    val spine = spark.range(1, 11).select(col("id").as("k"))
    val w10 = org.apache.spark.sql.expressions.Window.orderBy("k")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val curve = spine
      .join(perBucketTokens, col("bucket") === col("k") - 1, "left")
      .join(typeHist, col("minb") === col("k") - 1, "left")
      .withColumn("tokens_cum",
        sum(coalesce(col("nt"), lit(0L))).over(w10))
      .withColumn("types_cum",
        sum(coalesce(col("nv"), lit(0L))).over(w10))
      .filter(col("tokens_cum") > 0 && col("types_cum") > 0)
      .selectExpr("k as train_buckets", "tokens_cum", "types_cum",
        """cast(round(1000000.0 * ln(cast(tokens_cum as double)))
          | as bigint) as x_micro""".stripMargin.replace("\n", " "),
        """cast(round(1000000.0 * ln(cast(types_cum as double)))
          | as bigint) as y_micro""".stripMargin.replace("\n", " "))
    // OLS over the ≤10 quantized points: integer sums (order-free),
    // one mirrored double division; a degenerate curve (all x equal)
    // reports 0 with the points beside it
    val fit = curve.agg(
        count(lit(1)).as("np"),
        sum(col("x_micro")).as("sx"), sum(col("y_micro")).as("sy"),
        sum(col("x_micro") * col("y_micro")).as("sxy"),
        sum(col("x_micro") * col("x_micro")).as("sxx"))
      .selectExpr("np", "sx", "sy",
        """case when np * sxx - sx * sx = 0 then 0L else
          | cast(round(1000000.0
          |   * (cast(np as double) * cast(sxy as double)
          |      - cast(sx as double) * cast(sy as double))
          |   / (cast(np as double) * cast(sxx as double)
          |      - cast(sx as double) * cast(sx as double)))
          |   as bigint) end as beta_micro"""
          .stripMargin.replace("\n", " "))
      .selectExpr("beta_micro",
        // intercept from the quantized beta: one mirrored double
        // expression (an integer div here would floor/trunc-diverge
        // across engines on negative ln K)
        """case when np = 0 then 0L else
          | cast(round((cast(sy as double)
          |   - (cast(beta_micro as double) / 1000000.0)
          |     * cast(sx as double))
          |   / cast(np as double)) as bigint)
          | end as lnk_micro""".stripMargin.replace("\n", " "))
    curve.crossJoin(broadcast(fit))
  }

  val qHeapsLawSql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS w,
      |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
      |      AS UBIGINT) AS BIGINT) % 10 AS bucket
      |  FROM documents),
      |tok2 AS (SELECT w, bucket FROM toks WHERE w <> ''),
      |pbt AS (
      |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS nt
      |  FROM tok2 GROUP BY bucket),
      |tmin AS (SELECT w, MIN(bucket) AS minb FROM tok2 GROUP BY w),
      |thist AS (
      |  SELECT minb, CAST(COUNT(*) AS BIGINT) AS nv
      |  FROM tmin GROUP BY minb),
      |spine AS (
      |  SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT) AS k),
      |curve AS MATERIALIZED (
      |  SELECT k AS train_buckets, tokens_cum, types_cum,
      |    CAST(ROUND(1000000.0 * ln(CAST(tokens_cum AS DOUBLE)))
      |      AS BIGINT) AS x_micro,
      |    CAST(ROUND(1000000.0 * ln(CAST(types_cum AS DOUBLE)))
      |      AS BIGINT) AS y_micro
      |  FROM (
      |    SELECT s.k,
      |      CAST(SUM(COALESCE(p.nt, 0)) OVER (ORDER BY s.k
      |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_cum,
      |      CAST(SUM(COALESCE(h.nv, 0)) OVER (ORDER BY s.k
      |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS types_cum
      |    FROM spine s
      |    LEFT JOIN pbt p ON p.bucket = s.k - 1
      |    LEFT JOIN thist h ON h.minb = s.k - 1)
      |  WHERE tokens_cum > 0 AND types_cum > 0),
      |fit0 AS MATERIALIZED (
      |  SELECT np, sx, sy,
      |    CASE WHEN np * sxx - sx * sx = 0 THEN 0 ELSE
      |      CAST(ROUND(1000000.0
      |        * (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |        / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |        AS BIGINT) END AS beta_micro
      |  FROM (
      |    SELECT CAST(COUNT(*) AS BIGINT) AS np,
      |      SUM(x_micro) AS sx, SUM(y_micro) AS sy,
      |      SUM(x_micro * y_micro) AS sxy,
      |      SUM(x_micro * x_micro) AS sxx
      |    FROM curve)),
      |fit AS MATERIALIZED (
      |  SELECT beta_micro,
      |    CASE WHEN np = 0 THEN 0 ELSE
      |      CAST(ROUND((CAST(sy AS DOUBLE)
      |        - (CAST(beta_micro AS DOUBLE) / 1000000.0)
      |          * CAST(sx AS DOUBLE))
      |        / CAST(np AS DOUBLE)) AS BIGINT)
      |      END AS lnk_micro
      |  FROM fit0)
      |SELECT c.train_buckets, c.tokens_cum, c.types_cum,
      |  c.x_micro, c.y_micro, f.beta_micro, f.lnk_micro
      |FROM curve c CROSS JOIN fit f""".stripMargin

  val qWordEntropySql: String =
    """WITH counts AS (
      |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  WHERE w <> '' GROUP BY doc_id, w),
      |totals AS (
      |  SELECT doc_id, SUM(c) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_types
      |  FROM counts GROUP BY doc_id)
      |SELECT c.doc_id,
      |  CAST(t.n_tokens AS BIGINT) AS n_tokens, t.n_types,
      |  CAST(SUM(CAST(ROUND(1000000.0
      |    * (CAST(c.c AS DOUBLE) / CAST(t.n_tokens AS DOUBLE))
      |    * ln(CAST(t.n_tokens AS DOUBLE) / CAST(c.c AS DOUBLE)))
      |    AS BIGINT)) AS BIGINT) AS entropy_micro
      |FROM counts c JOIN totals t ON t.doc_id = c.doc_id
      |GROUP BY c.doc_id, t.n_tokens, t.n_types""".stripMargin
}
