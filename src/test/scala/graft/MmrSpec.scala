package graft

import graft.ext.Mmr

class MmrSpec extends SparkSpec {

  test("greedy picks pure relevance first, then trades off redundancy") {
    // a: rel 100; b: rel 90 but near-duplicate of a (sim 95);
    // c: rel 60, dissimilar. Round 1 → a. Round 2: b scores
    // 7*90-3*95 = 345, c scores 7*60-3*10 = 390 → c wins despite
    // lower relevance — the diversification the operator exists for.
    val rels = Seq(1L -> 100L, 2L -> 90L, 3L -> 60L)
    val sims = Map(
      (1L, 2L) -> 95L, (2L, 1L) -> 95L,
      (1L, 3L) -> 10L, (3L, 1L) -> 10L,
      (2L, 3L) -> 20L, (3L, 2L) -> 20L)
    val out = Mmr.greedy(rels, sims)
    assert(out.map(_._2) === Seq(1L, 3L, 2L))
    assert(out.head._4 === 700L)      // rank-1 score = 7*rel
    assert(out(1)._4 === 390L)
    // rank 3: b penalized by max(sim to a, sim to c) = 95
    assert(out(2)._4 === 7L * 90 - 3L * 95)
  }

  test("ties break toward the smaller vec_id") {
    val rels = Seq(5L -> 50L, 2L -> 50L, 9L -> 50L)
    val sims = (for {
      a <- Seq(2L, 5L, 9L); b <- Seq(2L, 5L, 9L) if a != b
    } yield (a, b) -> 0L).toMap
    val out = Mmr.greedy(rels, sims)
    assert(out.map(_._2) === Seq(2L, 5L, 9L))
  }

  test("driver query: k ranked rows, rank-1 is the relevance top-1") {
    val out = Mmr.qMmrRerank(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === Mmr.k)
    assert(out.map(_.getAs[Long]("rank")).toSeq === (1L to Mmr.k).toSeq)
    // rank 1 must equal brute-force top-1 (vec 0's self-match)
    val brute1 = graft.ext.Similarity.qAnnBrute(spark, "/root/testdata/sf0.001")
      .collect().head.getAs[Long]("vec_id")
    assert(out.head.getAs[Long]("vec_id") === brute1)
    // every selected id must come from the top-20 candidate pool
    val pool = graft.ext.Similarity.qAnnCosineById(spark, "/root/testdata/sf0.001")
      .orderBy(org.apache.spark.sql.functions.col("cosine").desc,
        org.apache.spark.sql.functions.col("vec_id").asc)
      .limit(Mmr.nCand).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(out.forall(r => pool.contains(r.getAs[Long]("vec_id"))))
  }
}
