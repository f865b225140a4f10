package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.BloomExpressions

/** Bloom-filter membership probe — the cross-snapshot dedup /
  * decontamination technique for the case a JOIN cannot serve: testing
  * a new batch against a REFERENCE SET far too large to broadcast and
  * too expensive to shuffle against (yesterday's 100 TB corpus, the
  * full eval-benchmark suite, a historical URL frontier).
  *
  * Build once over the reference keys — Spark's own
  * `BloomFilterAggregate` (the expression Catalyst's runtime filter
  * injection uses): per-partition update + `mergeInPlace` combine, so
  * the build is one distributed aggregation and the only thing that
  * moves is bits (~9.6 bits/key at 1% FP → ~1.2 GB for 10⁹ keys,
  * broadcastable where the key set never would be). The probe is the
  * codegen'd `BloomFilterMightContain` — a pure map, no shuffle, scan
  * speed on any batch. Keys hash to xxhash64 longs on BOTH sides, so
  * build and probe agree by construction.
  *
  * The contract is ONE-SIDED: no false negatives (a key in the
  * reference set always hits), false positives at the configured rate
  * flag rows that were actually new. That is the right direction for
  * both dedup (losing an fp-rate sliver of novel docs is harmless)
  * and decontamination (over-flagging is safe, under-flagging is
  * not). Where exactness matters, the bloom pass is the PREFILTER:
  * kept rows are exact by construction (non-members are definite),
  * and the flagged ~fp-rate can be re-verified with an exact
  * semi-join whose probe side is now batch·fp-rate, not batch. */
object BloomProbe {

  /** Standard Bloom sizing: m = −n·ln(p) / (ln 2)², floored to one
    * long word. */
  def numBits(expectedKeys: Long, fpRate: Double): Long = {
    require(fpRate > 0 && fpRate < 1, s"fpRate $fpRate out of (0,1)")
    math.max(64L,
      math.ceil(-expectedKeys.toDouble * math.log(fpRate) /
        (math.log(2) * math.log(2))).toLong)
  }

  private def keyHash(c: Column): Column = xxhash64(c.cast("string"))

  /** Serializes [[buildFilter]]'s conf-raise window: the clamp confs are
    * read lazily by `BloomFilterAggregate` from the SESSION conf, so two
    * concurrent builds on one session could clobber each other's
    * save/restore (restoring the other build's raised value as
    * "original"). One JVM-wide lock makes the save/raise/run/restore
    * sequence atomic across threads. Residual caveat, documented rather
    * than solved: UNRELATED queries on the same session that Catalyst
    * decorates with its own injected runtime filters observe the raised
    * caps while a build is in flight — benign in direction (a higher cap
    * only lets the optimizer use the sizing it estimated; it never
    * shrinks a filter), but a strict-isolation caller should build on a
    * dedicated `spark.newSession()`. */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The conf clobber the lock guards is PER SESSION (each session has
    * its own conf), so the lock is keyed by sessionUUID: concurrent
    * builds on unrelated sessions proceed in parallel, and one
    * slow/hung build can no longer serialize every other session's
    * builds behind a JVM-wide monitor (round-7 advice). */
  private def buildLock(spark: org.apache.spark.sql.SparkSession): Object =
    buildLocks.computeIfAbsent(
      graft.util.SessionCache.sessionKey(spark), _ => new Object)

  /** Build the serialized filter (as a 1-row, 1-column DataFrame —
    * keep it as a DataFrame to `persist`/reuse, or `collectFilter` for
    * a driver-side handle). Null keys are skipped (a null is never a
    * member). */
  def buildFilter(keys: DataFrame, keyCol: String,
                  expectedKeys: Long, fpRate: Double = 0.01): Array[Byte] = {
    val bits = numBits(expectedKeys, fpRate)
    // BloomFilterAggregate SILENTLY clamps its sizing to the runtime-
    // filter-injection conf caps (maxNumBits default 64 Mi,
    // maxNumItems 4 M — decompiled from the shipped catalyst jar): a
    // 10⁹-key filter built under the defaults would saturate and flag
    // EVERYTHING as seen. Raise the caps to this build's sizing for
    // the duration of the job and restore after — the confs also gate
    // Catalyst's own injected runtime filters, so they must not stay
    // raised behind the caller's back.
    buildLock(keys.sparkSession).synchronized {
      val conf = keys.sparkSession.conf
      val kBits = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
      val kItems = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
      val (oldBits, oldItems) = (conf.get(kBits), conf.get(kItems))
      conf.set(kBits, math.max(bits, oldBits.toLong).toString)
      conf.set(kItems, math.max(expectedKeys, oldItems.toLong).toString)
      try {
        val row = keys.filter(col(keyCol).isNotNull)
          .agg(BloomExpressions.bloomFilterAgg(
            keyHash(col(keyCol)), expectedKeys, bits).as("bf"))
          .head()
        row.getAs[Array[Byte]]("bf")
      } finally {
        conf.set(kBits, oldBits)
        conf.set(kItems, oldItems)
      }
    }
  }

  /** Probe predicate over any frame: true iff the row's key MIGHT be
    * in the reference set. The filter bytes travel as a literal into
    * codegen (for multi-GB filters prefer a broadcast variable and a
    * per-partition probe; at the sizes a single driver literal can
    * carry, the literal keeps the whole predicate in codegen). */
  def mightContain(filter: Array[Byte], key: Column): Column =
    BloomExpressions.mightContain(lit(filter), keyHash(key))

  /** `batch` rows whose key is DEFINITELY NOT in the reference set —
    * the novelty filter of cross-snapshot dedup. Exact keeps: bloom
    * false positives can only DROP novel rows (at ~fpRate), never keep
    * a seen one. */
  def filterNovel(batch: DataFrame, keyCol: String,
                  filter: Array[Byte]): DataFrame =
    batch.filter(!mightContain(filter, col(keyCol)))

  /** Driver query — the cross-snapshot dedup shape end to end:
    * "yesterday's" corpus is the lower half of doc_ids, its text
    * fingerprints build the filter (memoized: the filter is the
    * persisted artifact of a snapshot run), and "today's" full corpus
    * probes it; survivors are the definitely-novel docs. Bloom bit
    * positions are xxhash64-deterministic and the merge is bitwise OR
    * (order-independent), so the output is stable across runs and
    * partitionings — but not SQL-replayable (filter internals), so the
    * driver records rows-only; BloomProbeSpec proves the one-sided
    * contract (zero false negatives, bounded false positives). */
  def qBloomNovel(spark: org.apache.spark.sql.SparkSession,
                  dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir, "documents")
    val cutoff = docs.agg(max("doc_id")).head().getLong(0) / 2
    val filter = graft.util.SessionCache.memoize(spark, "bloom", dir) {
      buildFilter(
        docs.filter(col("doc_id") <= cutoff)
          .select(md5(col("text").cast("binary")).as("fp")),
        "fp", expectedKeys = cutoff + 1, fpRate = 0.001)
    }
    filterNovel(
      docs.withColumn("fp", md5(col("text").cast("binary"))), "fp", filter)
      .select("doc_id", "lang", "source")
  }

  /** Bit-array size the STREAMING det bloom uses ([[graft.streaming
    * .CurationStream.appendNovelBatch]]): a stream's modulus must stay
    * FIXED across batches (positions already in the store were derived
    * under it), so it is sized once to the stream's horizon — 2²⁰ holds
    * the sub-1% FP regime up to ~10⁵ keys; a production stream passes
    * its own horizon-sized m. The BATCH det twin ([[qBloomNovelDet]])
    * no longer uses a fixed m at all — see [[detBloomBitsPerKey]]. */
  val detBloomBits = 1 << 20

  /** Probe positions per key for the deterministic twin (k = 3). */
  val detBloomProbes = 3

  /** BITS PER KEY for the batch det twin's modulus: m = 16·n, computed
    * from the reference-set COUNT in integer arithmetic — which the
    * generated oracle SQL reproduces exactly (`16 * COUNT(*)`), unlike
    * the float-log [[numBits]] formula whose ceil could straddle an ulp
    * between engines. Fill factor is ≤ k/16 = 0.1875 at ANY reference
    * size (set bits ≤ 3n, m = 16n), so FP ≤ 0.1875³ ≈ 0.66% — the
    * sub-1% regime no longer saturates at 100× (round-7 ask #7); the
    * fixed-m saturation was an artifact of the literal, not the design. */
  val detBloomBitsPerKey = 16L

  /** Bit position `i` of `key` in the deterministic twin: first 8 hex
    * digits of md5(key‖'#'‖i) Horner-parsed mod `m` — the
    * q_winnow/q_dedup_simhash technique, chosen over seeded xxhash64
    * PRECISELY so both engines derive identical positions. */
  private[graft] def detBit(key: Column, i: Int, m: Column): Column = pmod(
    conv(substring(md5(concat(key, lit(s"#$i")).cast("binary")), 1, 8),
      16, 10).cast("bigint"), m)

  /** Fixed-[[detBloomBits]] form for the streaming store. */
  private[graft] def detBit(key: Column, i: Int): Column =
    detBit(key, i, lit(detBloomBits.toLong))

  /** [[qBloomNovel]] with FULLY REPLAYABLE bloom semantics — the
    * q_semdedup_det move applied to the sketch family: instead of
    * Spark's opaque `BloomFilterAggregate` blob, the filter IS a
    * DataFrame of distinct set bit positions (md5-derived, k = 3,
    * m = 2²⁰), bounded by m regardless of corpus size — so the bit
    * table BROADCASTS (≤ 8 MB of longs) and the probe is three
    * broadcast left joins, one per position: map-only, no shuffle, the
    * same plan shape as the production `might_contain` probe. A row is
    * definitely-novel iff ANY of its three positions is unset — which
    * an oracle can replay bit-for-bit, FALSE POSITIVES INCLUDED: the
    * driver hash-checks not just "novel ⊆ truly-novel" but the exact
    * saturation behavior of a 3-hash bloom at this fill factor,
    * something the rows-only q_bloom_novel can only spec-check. The
    * production path keeps `BloomFilterAggregate` (bits as ONE blob
    * beats 3n position rows through the build aggregation, and probing
    * needs no join at all); this twin pins the bloom CONTRACT in the
    * driver gate. Same snapshot split and output columns as
    * [[qBloomNovel]]. */
  def qBloomNovelDet(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir, "documents")
    val cutoff = docs.agg(max("doc_id")).head().getLong(0) / 2
    // modulus scales with the reference set: m = 16·n (integer math the
    // oracle replays as 16 * COUNT(*)); both driver lookups are bounded
    // scalar aggregates, the same posture as the cutoff itself
    val n = docs.filter(col("doc_id") <= cutoff).count()
    val m = lit(detBloomBitsPerKey * math.max(1L, n))
    val fp = docs.withColumn("fp", md5(col("text").cast("binary")))
    val bits = fp.filter(col("doc_id") <= cutoff)
      .select(explode(array((1 to detBloomProbes)
        .map(i => detBit(col("fp"), i, m)): _*)).as("bit"))
      .distinct()
    val probed = (1 to detBloomProbes).foldLeft(
      fp.withColumns((1 to detBloomProbes)
        .map(i => s"p$i" -> detBit(col("fp"), i, m)).toMap)) { (df, i) =>
      df.join(broadcast(bits.withColumnRenamed("bit", s"b$i")),
        col(s"p$i") === col(s"b$i"), "left")
    }
    probed.filter((1 to detBloomProbes)
        .map(i => col(s"b$i").isNull).reduce(_ || _))
      .select("doc_id", "lang", "source")
  }

  /** Full ANSI replay of [[qBloomNovelDet]]: the md5-Horner bit
    * positions, the reference-count-scaled modulus (16·n in integer
    * arithmetic — replayable where a float-log sizing formula is not),
    * the distinct-bit build over the snapshot half, and the
    * any-bit-unset novelty test. */
  val qBloomNovelDetSql: String = {
    def pos(i: Int) =
      s"CAST(CAST('0x' || substr(md5(f || '#$i'), 1, 8) AS UBIGINT) " +
        s"AS BIGINT) % m.m"
    val posCols = (1 to detBloomProbes)
      .map(i => s"    ${pos(i)} AS p$i").mkString(",\n")
    val novel = (1 to detBloomProbes)
      .map(i => s"p$i NOT IN (SELECT bit FROM bits)").mkString("\n   OR ")
    s"""WITH fp AS (
      |  SELECT doc_id, lang, source, md5(text) AS f FROM documents),
      |cut AS (SELECT MAX(doc_id) // 2 AS c FROM documents),
      |m AS (
      |  SELECT $detBloomBitsPerKey *
      |    GREATEST(CAST(COUNT(*) AS BIGINT), 1) AS m
      |  FROM fp, cut WHERE doc_id <= c),
      |bits AS (
      |  SELECT DISTINCT CAST(CAST('0x' || substr(md5(f || '#' || i), 1, 8)
      |      AS UBIGINT) AS BIGINT) % m.m AS bit
      |  FROM fp, cut, m,
      |    (SELECT unnest(range(1, ${detBloomProbes + 1})) AS i)
      |  WHERE doc_id <= c),
      |probe AS (
      |  SELECT doc_id, lang, source,
      |$posCols
      |  FROM fp, m)
      |SELECT doc_id, lang, source FROM probe
      |WHERE $novel""".stripMargin
  }

  // ─────────── Runtime bloom-filter join (the manual runtime filter) ───────────

  /** BLOOM-PREFILTERED JOIN — the runtime-filter pattern applied BY
    * HAND: when a selective dimension filter means most fact rows will
    * die in the join anyway, build a bloom over the surviving dim keys
    * and kill fact rows AT THE SCAN, before they pay the join shuffle.
    * Catalyst injects this itself in friendly conditions
    * (`runtime.bloomFilter.enabled`, creation-side thresholds); the
    * explicit form exists for the cases the injection declines — a
    * pre-built dim artifact reused across queries, a creation side
    * above the planner's size gates, or a probe under a join the
    * optimizer reshapes — and makes the 100 TB arithmetic visible:
    * shuffling 100 TB of facts to keep 20% costs 5× the network the
    * kept rows need; an ~x-bits/key bloom broadcast kills the dead 80%
    * map-side for ~fpRate of false passengers, every one of which the
    * EXACT join after still removes. Result is therefore exactly the
    * plain join — the bloom only prunes — which is what the ORACLE
    * (a bloom-free join) certifies. */
  def bloomJoin(fact: DataFrame, factKey: String,
                dim: DataFrame, dimKey: String,
                expectedKeys: Long, fpRate: Double = 0.01): DataFrame = {
    val filter = buildFilter(dim.select(dimKey), dimKey,
      expectedKeys, fpRate)
    fact.filter(mightContain(filter, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** Driver query: urgent-order revenue by month — the ~20%-selective
    * priority predicate lives on orders (the dim side); the bloom over
    * urgent orderkeys prunes lineitem at the scan, the exact join
    * drops the false positives, and the rollup is exact cents. */
  def qBloomJoin(spark: org.apache.spark.sql.SparkSession,
                 dir: String): DataFrame = {
    val urgent = graft.Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val n = urgent.count() // the dim side is the SMALL side by premise
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    bloomJoin(li, "l_orderkey", urgent, "o_orderkey",
      expectedKeys = math.max(n, 1L))
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        sum(col("l_quantity").cast("long")).as("qty"),
        sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("revenue_cents"))
  }

  val qBloomJoinSql: String =
    """SELECT date_trunc('month', o.o_orderdate) AS month,
      |  CAST(SUM(CAST(FLOOR(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty,
      |  CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderpriority = '1-URGENT'
      |GROUP BY 1""".stripMargin
}
