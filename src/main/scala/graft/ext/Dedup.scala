package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for LLM training-data pipelines (BASELINE
  * north star; SURVEY.md §7.5), over the `documents` table.
  *
  * Scale design notes (the part that matters at 100 TB):
  *  - exact dedup is a hash-keyed groupBy — shuffle carries (key, id)
  *    pairs only, never document bodies;
  *  - near-dup candidate generation is LSH-bucketed (shingle → minhash →
  *    band → bucket equi-join). NEVER all-pairs: the only joins are
  *    equi-joins on band buckets, so the shuffle is O(docs × bands) and
  *    hot buckets are bounded by the band hash;
  *  - exact Jaccard verification runs only on candidate pairs.
  */
object Dedup {

  /** Word tokens (the synthetic corpus is single-space separated). */
  private def toks(c: Column): Column = split(c, " ")

  /** Distinct word-3-gram shingles of a text column; texts shorter than
    * 3 tokens fall back to the whole text as one shingle. */
  def shingles3(c: Column): Column = {
    val t = toks(c)
    array_distinct(
      when(size(t) >= 3,
        transform(sequence(lit(1), size(t) - 2), i =>
          concat_ws(" ",
            element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
        .otherwise(array(c)))
  }

  /** Exact dedup, hash-groupBy shape: group on a normalized key (here a
    * 40-char prefix, which the synthetic corpus plants real collisions
    * for), keep the smallest doc_id as the representative. Deterministic
    * — unlike dropDuplicates, whose survivor depends on partitioning. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(substring(col("text"), 1, 40).as("prefix_key"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_dups"))

  val qDedupExactSql: String =
    """SELECT substr(text, 1, 40) AS prefix_key,
      |       MIN(doc_id) AS rep_doc_id,
      |       COUNT(*) AS n_dups
      |FROM documents
      |GROUP BY prefix_key""".stripMargin

  /** N-gram Jaccard near-dup pairs, oracle-checked: candidate pairs share
    * at least one 3-gram shingle (equi-join on the shingle — docfreq-
    * bounded, not all-pairs), exact Jaccard from intersection/set sizes.
    * At 100 TB add a docfreq cap on shingles (drop shingles present in
    * >X docs) to bound hot keys; unnecessary at test scale. */
  def qDedupJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val grams = docs.select(col("doc_id"),
      explode(shingles3(col("text"))).as("g"))
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = grams.as("a")
      .join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    val jacc = col("i").cast("double") /
      (col("sa.n") + col("sb.n") - col("i"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), jacc.as("jacc"))
      .filter(col("jacc") >= 0.2)
  }

  val qDedupJaccardSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(t) >= 3
      |         THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |               for i in range(1, len(t) - 1)]
      |         ELSE [array_to_string(t, ' ')] END)) AS g
      |  FROM toks),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |       CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jacc
      |FROM inter
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.2""".stripMargin

  /** MinHash + LSH banded near-dup detection (Spark-only — seeded
    * xxhash64 signatures aren't portable SQL; driver records rows-only).
    *
    * K=16 minhashes, 8 bands × 2 rows → candidate threshold
    * (1/8)^(1/2) ≈ 0.35 Jaccard; candidates verified with exact Jaccard
    * ≥ 0.5. Shuffle = docs × bands bucket rows + the candidate joins. */
  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val K = 16
    val B = 8 // bands of r = 2
    val docs = Tables(spark, dir, "documents")
    val withGrams = docs.select(col("doc_id"), shingles3(col("text")).as("gs"))
    val sig = transform(sequence(lit(0), lit(K - 1)), j =>
      array_min(transform(col("gs"), g => xxhash64(g, j))))
    val withSig = withGrams.select(col("doc_id"), col("gs"), sig.as("sig"))
    val bandCol = explode(transform(sequence(lit(0), lit(B - 1)), b =>
      struct(b.as("band"),
        xxhash64(element_at(col("sig"), b * 2 + 1),
          element_at(col("sig"), b * 2 + 2)).as("bucket"))))
    val buckets = withSig.select(col("doc_id"), bandCol.as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val pairs = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val gsets = withGrams.select(col("doc_id"), col("gs"))
    pairs
      .join(gsets.as("ga"), col("doc_a") === col("ga.doc_id"))
      .join(gsets.as("gb"), col("doc_b") === col("gb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ga.gs"), col("gb.gs"))).cast("double") /
          size(array_union(col("ga.gs"), col("gb.gs")))).as("jacc"))
      .filter(col("jacc") >= 0.5)
  }

  /** SimHash near-dup detection (Spark-only, rows-only check): 64-bit
    * signature from signed sums of token-hash bits — a map-only
    * projection per document (no shuffle to build signatures). Pairs are
    * found by the block trick: split the 64 bits into 4 × 16-bit blocks;
    * any pair within Hamming distance 3 must share at least one exact
    * block, so candidate generation is again an equi-join on
    * (block_idx, block_value), verified with bit_count(xor) <= 3. */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // 3-gram shingles, not unigrams: the synthetic corpus has a 31-word
    // vocabulary, so unigram token SETS collide across unrelated docs and
    // unigram simhash degenerates (~1000 hamming<=3 pairs); 3-grams keep
    // the signature discriminative (only genuine near-dups survive).
    val hs = transform(shingles3(col("text")), t => xxhash64(t))
    val bit = (j: Int) =>
      when(aggregate(col("hs"), lit(0L), (acc, h) =>
        acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L)
      ) > 0, lit(1L)).otherwise(lit(0L))
    val sim = (0 until 64).map(j => shiftleft(bit(j), j)).reduce(_ + _)
    val signed = docs.select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"), sim.as("simhash"))
    val blocks = signed.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("blk"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("v"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.blk").as("blk"), col("bb.v").as("v"))
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }
}
