package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** SPAN CORRUPTION — the seq2seq pretraining objective's data prep
  * (Raffel et al. 2020, T5 §3.1.4): mask contiguous word spans,
  * replace each with an ordinal sentinel token, and emit the
  * (corrupted input, span targets) pair the model trains on.
  *
  * T5's reference sampler walks the sequence left to right (span
  * starts drawn until ~15% noise density, mean span 3) — a SEQUENTIAL
  * dependence that would force a per-document fold. This
  * implementation uses the BLOCK-DETERMINISTIC variant: the word
  * sequence is cut into fixed blocks of [[blockLen]] = 20, and every
  * FULL block carries exactly one span of seeded length 2–4 (mean 3 →
  * the same 15% density) at a seeded offset. Spans can't cross blocks,
  * so there is NO merge step and NO sequential state — masking is a
  * pure per-position expression, embarrassingly parallel at any
  * document length, and the sentinel ordinal is simply the block
  * index (every full block has one span, so ordinals are consecutive
  * by construction — T5's sequential numbering for free). The tail
  * block (< 20 words) is never masked; documents under 20 words pass
  * through uncorrupted with zero spans — both documented edges the
  * spec pins.
  *
  * Seeding: span length and offset come from the md5 coin of
  * (doc_id, block) — the repo's seeded-sampler convention — so the
  * corruption is REPLAYABLE (the pair set a training run saw can be
  * reproduced exactly) and the oracle replays it bit-for-bit.
  *
  * Plan shape: map-only — one projection computes words, the
  * per-block (offset, length) array (≤ n/20 structs), and both output
  * strings via codegen'd array HOFs; no shuffle, no join, no state.
  * At 100 TB this is the ideal operator shape: pure scan throughput. */
object SpanCorrupt {

  /** Block length; each full block carries one span. */
  val blockLen = 20
  /** Sentinel prefix — `<extra_id_N>` with N = block ordinal. */
  val sentinelPrefix = "<extra_id_"
  val salt = "graft-span"

  private def coin(docId: Column, b: Column, tag: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), docId.cast("string"),
      lit(":"), b.cast("string"), lit(":" + tag)).cast("binary")),
      1, 8), 16, 10).cast(LongType)

  /** (doc_id, n_words, n_spans, n_masked, corrupted, targets). */
  def spanCorrupt(docs: DataFrame): DataFrame = {
    val words = filter(split(col("text"), " "), w => w =!= lit(""))
    val n = size(words).cast(LongType)
    val nFull = (n / blockLen).cast(LongType) // integral: both positive
    val docId = col("doc_id")
    // per-full-block (off, len): len ∈ {2,3,4}, off ∈ [0, B−len]
    val blockArr = when(col("n_full") > 0,
      transform(sequence(lit(0L), col("n_full") - 1), b => {
        val len = coin(docId, b, "len") % 3 + 2
        val off = coin(docId, b, "off") % (lit(blockLen.toLong) - len + 1)
        struct(off.as("off"), len.as("len"))
      })).otherwise(array().cast("array<struct<off:bigint,len:bigint>>"))
    val base = docs.select(docId, words.as("words"), n.as("n_words"),
      nFull.as("n_full"))
      .withColumn("blocks", blockArr)
    // per-position emission; sequence guarded (Spark's sequence runs
    // DESCENDING when start > stop — an empty doc would mint [1,0])
    def emit(f: (Column, Column, Column, Column) => Column): Column =
      when(col("n_words") > 0,
        filter(transform(sequence(lit(1L), col("n_words")), pos => {
          val w = (pos - 1) % blockLen
          val b = ((pos - 1) - w) / blockLen
          // try_: the tail block's index exceeds the span array — NULL
          // (= unmasked) is the contract, not ANSI's index error
          val blk = try_element_at(col("blocks"), (b + 1).cast("int"))
          f(pos, w, b, blk)
        }), x => x.isNotNull))
        .otherwise(array().cast("array<string>"))
    def masked(w: Column, blk: Column): Column =
      blk.isNotNull && w >= blk.getField("off") &&
        w < blk.getField("off") + blk.getField("len")
    def sentinel(b: Column): Column =
      concat(lit(sentinelPrefix), b.cast(LongType).cast("string"), lit(">"))
    val corrupted = emit { (pos, w, b, blk) =>
      when(!masked(w, blk), element_at(col("words"), pos.cast("int")))
        .when(w === blk.getField("off"), sentinel(b))
        .otherwise(lit(null))
    }
    val targets = emit { (pos, w, b, blk) =>
      when(!masked(w, blk), lit(null))
        .when(w === blk.getField("off"),
          concat(sentinel(b), lit(" "),
            element_at(col("words"), pos.cast("int"))))
        .otherwise(element_at(col("words"), pos.cast("int")))
    }
    base.select(col("doc_id"), col("n_words"),
      col("n_full").as("n_spans"),
      aggregate(col("blocks"), lit(0L),
        (acc, s) => acc + s.getField("len")).as("n_masked"),
      array_join(corrupted, " ").as("corrupted"),
      array_join(targets, " ").as("targets"))
  }

  def qSpanCorrupt(spark: SparkSession, dir: String): DataFrame =
    spanCorrupt(Tables(spark, dir, "documents"))

  val qSpanCorruptSql: String = {
    val b = blockLen
    def coinSql(tag: String): String =
      s"""CAST(('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR)
         |      || ':' || CAST(b AS VARCHAR) || ':$tag'), 1, 8))
         |      AS UBIGINT)""".stripMargin
    s"""WITH base AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> w <> '') AS words
      |  FROM documents),
      |sized AS MATERIALIZED (
      |  SELECT doc_id, words, CAST(len(words) AS BIGINT) AS n_words,
      |    CAST(len(words) // $b AS BIGINT) AS n_full
      |  FROM base),
      |blk AS (
      |  SELECT s.doc_id, u.b,
      |    2 + CAST(${coinSql("len").linesIterator.map("    " + _.trim)
             .mkString(" ")} % 3 AS BIGINT) AS slen
      |  FROM sized s, UNNEST(generate_series(0, s.n_full - 1)) AS u(b)),
      |blk2 AS (
      |  SELECT doc_id, b, slen,
      |    CAST(${coinSql("off").linesIterator.map("    " + _.trim)
             .mkString(" ")} % ($b - slen + 1) AS BIGINT) AS soff
      |  FROM blk),
      |blockarr AS MATERIALIZED (
      |  SELECT doc_id,
      |    list(struct_pack(soff := soff, slen := slen) ORDER BY b)
      |      AS blocks
      |  FROM blk2 GROUP BY doc_id),
      |joined AS (
      |  SELECT s.doc_id, s.words, s.n_words, s.n_full,
      |    COALESCE(a.blocks, []) AS blocks
      |  FROM sized s LEFT JOIN blockarr a USING (doc_id))
      |SELECT doc_id, n_words, n_full AS n_spans,
      |  CAST(COALESCE(list_sum(list_transform(blocks,
      |    x -> struct_extract(x, 'slen'))), 0) AS BIGINT) AS n_masked,
      |  COALESCE(array_to_string(list_filter(list_transform(
      |    generate_series(1, n_words), pos ->
      |      CASE
      |        WHEN NOT (blocks[CAST((pos - 1) // $b + 1 AS INT)] IS NOT NULL
      |          AND (pos - 1) % $b >= struct_extract(
      |            blocks[CAST((pos - 1) // $b + 1 AS INT)], 'soff')
      |          AND (pos - 1) % $b < struct_extract(
      |            blocks[CAST((pos - 1) // $b + 1 AS INT)], 'soff')
      |            + struct_extract(
      |            blocks[CAST((pos - 1) // $b + 1 AS INT)], 'slen'))
      |          THEN words[CAST(pos AS INT)]
      |        WHEN (pos - 1) % $b = struct_extract(
      |            blocks[CAST((pos - 1) // $b + 1 AS INT)], 'soff')
      |          THEN '$sentinelPrefix' || CAST((pos - 1) // $b AS VARCHAR)
      |            || '>'
      |        ELSE NULL END),
      |    x -> x IS NOT NULL), ' '), '') AS corrupted,
      |  COALESCE(array_to_string(list_filter(list_transform(
      |    generate_series(1, n_words), pos ->
      |      CASE
      |        WHEN NOT (blocks[CAST((pos - 1) // $b + 1 AS INT)] IS NOT NULL
      |          AND (pos - 1) % $b >= struct_extract(
      |            blocks[CAST((pos - 1) // $b + 1 AS INT)], 'soff')
      |          AND (pos - 1) % $b < struct_extract(
      |            blocks[CAST((pos - 1) // $b + 1 AS INT)], 'soff')
      |            + struct_extract(
      |            blocks[CAST((pos - 1) // $b + 1 AS INT)], 'slen'))
      |          THEN NULL
      |        WHEN (pos - 1) % $b = struct_extract(
      |            blocks[CAST((pos - 1) // $b + 1 AS INT)], 'soff')
      |          THEN '$sentinelPrefix' || CAST((pos - 1) // $b AS VARCHAR)
      |            || '> ' || words[CAST(pos AS INT)]
      |        ELSE words[CAST(pos AS INT)] END),
      |    x -> x IS NOT NULL), ' '), '') AS targets
      |FROM joined""".stripMargin
  }
}
