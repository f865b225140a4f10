package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomProbe

/** Bloom probe: the one-sided contract (zero false negatives, bounded
  * false positives), novelty filtering, and the no-UDF plan. */
class BloomProbeSpec extends SparkSpec {

  test("no false negatives ever; false positives inside ~2x the configured rate") {
    import spark.implicits._
    val reference = (0L until 5000L).map(i => s"doc-$i").toDF("key")
    val filter = BloomProbe.buildFilter(reference, "key",
      expectedKeys = 5000, fpRate = 0.01)
    // every reference key must hit
    val misses = reference
      .filter(!BloomProbe.mightContain(filter, col("key"))).count()
    assert(misses === 0L)
    // disjoint probe set: hit rate ~ fpRate
    val novel = (0L until 10000L).map(i => s"new-$i").toDF("key")
    val fps = novel
      .filter(BloomProbe.mightContain(filter, col("key"))).count()
    assert(fps < 10000 * 0.01 * 2, s"fp count $fps exceeds 2x bound")
    // filterNovel keeps exactly the non-hits
    assert(BloomProbe.filterNovel(novel, "key", filter).count() ===
      10000 - fps)
  }

  test("cross-snapshot dedup shape: yesterday's corpus filters today's batch") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val yesterday = docs.filter(col("doc_id") < 50)
    val today = docs // 50 re-crawled + 50 new
    val filter = BloomProbe.buildFilter(
      yesterday.select(md5(col("text").cast("binary")).as("fp")), "fp",
      expectedKeys = 100, fpRate = 0.001)
    val kept = BloomProbe.filterNovel(
      today.withColumn("fp", md5(col("text").cast("binary"))), "fp", filter)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // nothing from yesterday's exact texts survives (no false negatives)
    val yesterdayTexts = yesterday.select(md5(col("text").cast("binary")))
      .collect().map(_.getString(0)).toSet
    val keptTexts = docs.filter(col("doc_id").isInCollection(kept))
      .select(md5(col("text").cast("binary")))
      .collect().map(_.getString(0)).toSet
    assert(keptTexts.intersect(yesterdayTexts).isEmpty)
    // and the novel half survives (minus at most the tiny fp allowance)
    assert(kept.size >= 45)
  }

  test("sizing beyond the runtime-filter conf caps is honored, not clamped") {
    import spark.implicits._
    // requested ~479 M bits (50 M keys @ 1%) far exceeds the default
    // maxNumBits cap of 64 Mi — without the conf raise inside
    // buildFilter the aggregate would silently build a 64 Mi-bit
    // filter and saturate at real key volumes
    val requested = BloomProbe.numBits(50L * 1000 * 1000, 0.01)
    val bytes = BloomProbe.buildFilter(
      (0L until 100L).map(i => s"k$i").toDF("key"), "key",
      expectedKeys = 50L * 1000 * 1000, fpRate = 0.01)
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    assert(bf.bitSize() >= requested,
      s"bitSize ${bf.bitSize()} clamped below requested $requested")
    // and the session confs are restored afterwards
    assert(spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong <= 67108864L)
  }

  test("deterministic twin: exact bit-level replay incl. false positives; " +
    "zero false negatives; probe side is broadcast joins, no shuffle") {
    val dir = "/root/testdata/sf0.001"
    val got = BloomProbe.qBloomNovelDet(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    // full driver-side replay of the md5-Horner bloom
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val cutoff = docs.map(_._1).max / 2
    // scaled modulus: m = bitsPerKey * |reference set| (round-8 form)
    val m = BloomProbe.detBloomBitsPerKey * docs.count(_._1 <= cutoff)
    def pos(f: String, i: Int): Long =
      java.lang.Long.parseLong(md5hex(f + "#" + i).take(8), 16) % m
    val bits = docs.filter(_._1 <= cutoff).flatMap { case (_, t) =>
      val f = md5hex(t)
      (1 to BloomProbe.detBloomProbes).map(i => pos(f, i))
    }.toSet
    val expect = docs.filter { case (_, t) =>
      val f = md5hex(t)
      (1 to BloomProbe.detBloomProbes).exists(i => !bits(pos(f, i)))
    }.map(_._1).toSet
    assert(got === expect) // bit-for-bit, FALSE POSITIVES INCLUDED
    // one-sided contract: no seen text ever surfaces as novel
    val seenTexts = docs.filter(_._1 <= cutoff).map(_._2).toSet
    val textOf = docs.toMap
    assert(got.forall(id => !seenTexts(textOf(id))))
    // and FPs (truly-novel docs the bloom drops) stay rare at this fill
    val trulyNovel = docs.filter { case (_, t) => !seenTexts(t) }
      .map(_._1).toSet
    val fps = (trulyNovel -- got).size
    assert(fps <= math.max(5, trulyNovel.size / 20), s"fp count $fps")
    // scale shape: the probe is three BroadcastHashJoins — no exchange
    // between the scan and the novelty filter
    val plan = BloomProbe.qBloomNovelDet(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("probe is native codegen, not a UDF") {
    import spark.implicits._
    val reference = (0L until 100L).map(i => s"k$i").toDF("key")
    val filter = BloomProbe.buildFilter(reference, "key", 100, 0.01)
    // probe over a FILE source: a LocalRelation would let the optimizer
    // evaluate the predicate at plan time and hide it from the plan
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = docs.filter(BloomProbe.mightContain(filter, col("doc_id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(500))
    assert(!plan.contains("UDF") && !plan.contains("BatchEval"),
      plan.take(500))
  }

  test("bloom join: result equals the plain join; probe prunes BELOW the " +
    "join exchange") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val got = BloomProbe.qBloomJoin(spark, dir)
    val want = spark.sql(BloomProbe.qBloomJoinSql)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
    // the might_contain filter must sit on the fact SCAN side, below
    // the join: in the executed plan string the probe appears before
    // any join node materializes the fact rows
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(800))
    // and the prune is real: probed fact rows ≈ urgent fraction
    val li = Tables(spark, dir, "lineitem")
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val filter = BloomProbe.buildFilter(urgent, "o_orderkey",
      math.max(urgent.count(), 1L))
    val kept = li.filter(
      BloomProbe.mightContain(filter, col("l_orderkey"))).count()
    val exact = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(kept >= exact)                    // one-sided: never under-keep
    assert(kept <= (exact * 1.1 + 50).toLong, // and barely over
      s"bloom kept $kept vs exact $exact")
  }
}
