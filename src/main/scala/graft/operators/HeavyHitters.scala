package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** EXACT DISTRIBUTED HEAVY HITTERS over a key stream whose distinct
  * cardinality is too large to shuffle wholesale — the frequent-phrase /
  * hot-key report every corpus review and skew diagnosis starts from.
  *
  * The textbook scale problem: "all keys with frequency ≥ φ·N" is a
  * one-line groupBy … HAVING, but at 100 TB the groupBy shuffles ONE ROW
  * PER DISTINCT KEY (for token n-grams: billions) to answer a question
  * whose output is ≤ 1/φ rows. The classic fix (Charikar et al.,
  * count–min / count-sketch family) is a bounded sketch that prunes the
  * shuffle, then an exact second pass over the survivors:
  *
  *  1. SKETCH PASS (map-only + tiny shuffle): each key row hashes into
  *     [[hhDepth]] independent rows of [[hhWidth]] counters
  *     (xxhash64-seeded). The groupBy key space is depth×width —
  *     constant (24 576) regardless of corpus size — so map-side
  *     partial aggregation collapses every partition to ≤24 576 rows
  *     before any network traffic.
  *  2. PRUNE (map-only): the counter table broadcasts (≤24 576 rows);
  *     a key's count-min estimate `least(c₁…c_d)` OVER-estimates its
  *     true count (collisions only add), so `est < T` proves the key
  *     is not heavy — dropping it is safe, keeping every truly-heavy
  *     key. The filter is per-row against the broadcast map, before
  *     the exact shuffle.
  *  3. EXACT PASS: groupBy over surviving rows only. A key passes the
  *     prune either for all of its rows or none (the estimate is a
  *     pure function of the key), so surviving counts are the TRUE
  *     counts and `HAVING cnt ≥ T` gives the exact answer — the
  *     sketch only ever pruned, never decided.
  *
  * Net: the unbounded-cardinality shuffle is replaced by a
  * constant-size one plus a shuffle of heavy-candidate rows (mass ≤
  * depth·width·T in expectation). The ORACLE is the naive exact
  * groupBy — a genuinely different plan proving the sketch pruned
  * nothing it shouldn't. Cost of exactness vs sketch-only: one extra
  * scan of the (map-only) key stream — the scan is re-derived, not
  * cached, because at target scale the token stream outweighs any
  * cache tier. */
object HeavyHitters {

  val hhDepth = 3
  val hhWidth = 8192L
  /** Heavy = count ≥ max(N div phiDenom, floorCount). */
  val phiDenom = 1000L
  val floorCount = 2L

  /** Exact heavy hitters of the single string column `key` in `keys`.
    * Returns (key, cnt) for every key with cnt ≥ max(N/φ⁻¹, floor).
    * `absoluteT` overrides the relative threshold — the scale-check
    * posture (a 10× disjoint-vocabulary corpus has no RELATIVELY heavy
    * keys, so timing the relative form would measure an empty prune). */
  def heavyHitters(keys: DataFrame, absoluteT: Option[Long] = None)
      : DataFrame = {
    val spark = keys.sparkSession
    // one scalar scan: total mass → threshold
    val t = absoluteT.getOrElse {
      val n = keys.count()
      math.max(n / phiDenom, floorCount)
    }
    // sketch pass: depth rows per key row, constant groupBy key space
    val hashed = keys.select(
      posexplode(array((0 until hhDepth).map(i =>
        pmod(xxhash64(col("key"), lit(i)), lit(hhWidth))): _*))
        .as(Seq("d", "bucket")))
    val counters = hashed.groupBy("d", "bucket")
      .agg(count(lit(1)).as("c"))
    // prune: per-row broadcast lookups; est = min over depth rows
    val pruned = (0 until hhDepth).foldLeft(
      keys.withColumns((0 until hhDepth).map(i =>
        s"b$i" -> pmod(xxhash64(col("key"), lit(i)), lit(hhWidth))).toMap)) {
      case (df, i) =>
        df.join(
          broadcast(counters.filter(col("d") === i)
            .select(col("bucket").as(s"b$i"), col("c").as(s"c$i"))),
          Seq(s"b$i"))
    }.filter(least((0 until hhDepth).map(i => col(s"c$i")): _*) >= t)
    // exact pass over survivors only
    pruned.groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= t)
  }

  /** The corpus bigram stream (map-only). */
  def bigrams(docs: DataFrame): DataFrame =
    docs
      .select(expr(
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')")
        .as("toks"))
      // sequence(0, size-2) would run DESCENDING for <2 tokens (Spark's
      // default step is -1 when start > stop) and emit null bigrams;
      // DuckDB's generate_series is simply empty there — align by
      // dropping sub-bigram docs before the transform.
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> concat(toks[i], ' ', toks[i + 1]))")).as("key"))

  /** Driver query: heavy token bigrams across the documents corpus —
    * the frequent-phrase report (boilerplate candidates, template
    * detection) at n-gram cardinality. */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHitters(bigrams(Tables(spark, dir, "documents")))
      .select(col("key").as("bigram"), col("cnt"))

  /** Naive exact formulation — groupBy the full key space. The sketch
    * path must reproduce this bit-for-bit. */
  val qHeavyHittersSql: String =
    """WITH toks AS (
      |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                     t -> t <> '') AS ts
      |  FROM documents
      |), big AS (
      |  SELECT unnest([ts[i] || ' ' || ts[i + 1]
      |                 for i in generate_series(1, len(ts) - 1)]) AS bigram
      |  FROM toks
      |), n AS (SELECT COUNT(*) AS n FROM big)
      |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM big
      |GROUP BY bigram
      |HAVING COUNT(*) >= GREATEST((SELECT n FROM n) // 1000, 2)""".stripMargin
}
