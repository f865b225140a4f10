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
    // Signatures via explode + ONE hash-aggregate of K mins: stays in
    // whole-stage codegen with map-side partial aggregation. (The
    // tempting nested-HOF form — transform(seq, j -> array_min(
    // transform(gs, g -> xxhash64(g, j)))) — is interpreted, not
    // codegen'd, and this DAG references the signature table from four
    // branches; interpreted × recomputed was ~45 s at sf0.1.)
    // localCheckpoint materializes the small per-doc table (K longs + the
    // shingle set per doc) exactly once for all downstream branches.
    val exploded = docs.select(col("doc_id"),
      explode(shingles3(col("text"))).as("g"))
    val sigTbl = exploded.groupBy(col("doc_id")).agg(
      min(xxhash64(col("g"), lit(0))).as("m0"),
      ((1 until K).map(j => min(xxhash64(col("g"), lit(j))).as(s"m$j")) :+
        collect_list(col("g")).as("gs")): _*)
      .localCheckpoint()
    val bandCol = explode(array((0 until B).map(b =>
      struct(lit(b).as("band"),
        xxhash64(col(s"m${b * 2}"), col(s"m${b * 2 + 1}")).as("bucket"))): _*))
    val buckets = sigTbl.select(col("doc_id"), bandCol.as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // Bucket-size cap: in a correlated corpus many docs share the
    // globally-smallest shingle hashes, so some band buckets become
    // giant cliques — self-joining them is O(size^2) with no near-dup
    // signal (a bucket holding hundreds of docs means that band hash is
    // uninformative, not that they're all duplicates). Dropping oversized
    // buckets is the standard LSH skew guard and what makes this plan
    // survive 100 TB; genuine near-dups keep colliding in their other,
    // discriminative bands.
    val maxBucket = 100
    val smallBuckets = buckets
      .withColumn("cnt", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("cnt") <= maxBucket)
      .drop("cnt")
    val pairs = smallBuckets.as("a")
      .join(smallBuckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Two-stage verification. Stage 1 estimates Jaccard from the K
    // signature columns already in hand (plain long comparisons, pure
    // codegen) and prunes; stage 2 computes exact Jaccard on the
    // survivors only. The prune threshold sits BELOW the final 0.5 bar
    // (0.4) so a 16-sample estimate of a true >=0.5 pair essentially
    // never lands under it (P[Binom(16,0.8) < 6.4] ~ 2e-5).
    val est = (0 until K).map(j =>
      when(col(s"sa.m$j") === col(s"sb.m$j"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / K
    val plausible = pairs
      .join(sigTbl.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sigTbl.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(est >= 0.4)
      .select(col("doc_a"), col("doc_b"))
    val gsets = sigTbl.select(col("doc_id"), col("gs"))
    plausible
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
    //
    // Shape: explode shingle hashes, then ONE hash-aggregate computing 64
    // signed bit-sums with map-side partial aggregation — the shuffle
    // carries 64 longs per doc, and the whole thing stays in codegen
    // (64 per-row HOF aggregates were ~6x slower).
    val exploded = docs.select(col("doc_id"),
      explode(transform(shingles3(col("text")), t => xxhash64(t))).as("h"))
    val bitSums = exploded.groupBy(col("doc_id")).agg(
      sum(shiftright(col("h"), 0).bitwiseAND(1) * 2 - 1).as("s0"),
      (1 until 64).map(j =>
        sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"s$j")): _*)
    val sim = (0 until 64)
      .map(j => shiftleft(when(col(s"s$j") > 0, 1L).otherwise(0L), j))
      .reduce(_ + _)
    val signed = bitSums.select(col("doc_id"), sim.as("simhash"))
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
