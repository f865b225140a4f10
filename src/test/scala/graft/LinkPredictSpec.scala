package graft

import graft.operators.LinkPredict

/** Link prediction: exact scores on hand-computed small graphs
  * (d ≤ S regime), Horvitz-Thompson mass preservation on a hub star
  * (d > S regime), and shape/non-adjacency on the corpus. */
class LinkPredictSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: two-basket graph scores its one distance-2 pair") {
    // edges 12 13 23 24 34 — the only non-adjacent distance-2 pair is
    // (1,4) with shared neighbors {2,3}, both of degree 3
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val rows = LinkPredict.linkPredict(und).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) === (1L, 4L))
    assert(r.getLong(r.fieldIndex("cn_micro")) === 2000000L)
    assert(r.getLong(r.fieldIndex("ra_micro")) ===
      2 * math.round(1e6 / 3.0))
    // aa term = (cn_term·1e6) div ln_micro — the integer derivation
    val lnMicro3 = math.round(math.log(3.0) * 1e6)
    assert(r.getLong(r.fieldIndex("aa_micro")) ===
      2 * (1000000L * 1000000L / lnMicro3))
  }

  test("HT regime: hub star preserves total wedge mass within rounding") {
    // hub 0 with 30 leaves: d(hub)=30 > S=24, every leaf d=1. All
    // C(24,2)=276 sampled pairs carry scale C(30,2)/C(24,2), so the
    // summed cn mass must reconstruct C(30,2)·1e6 within ±1 per term.
    val und = (1L to 30L).map(leaf => (0L, leaf)).toDF("u", "v")
    val rows = LinkPredict.linkPredict(und, topK = 1000).collect()
    assert(rows.length === 276) // C(S,2) sampled candidate pairs
    val totalCn = rows.map(r => r.getLong(r.fieldIndex("cn_micro"))).sum
    val exact = 435L * 1000000L // C(30,2)·1e6
    assert(math.abs(totalCn - exact) <= 276L)
    // every scored pair is leaf-leaf (never includes the hub)
    assert(rows.forall(r => r.getLong(0) >= 1L && r.getLong(1) >= 1L))
  }

  test("sampling is seeded: identical result on re-run") {
    val und = (1L to 30L).map(leaf => (0L, leaf)).toDF("u", "v")
    val a = LinkPredict.linkPredict(und, topK = 50).collect().toSeq
    val b = LinkPredict.linkPredict(und, topK = 50).collect().toSeq
    assert(a === b)
  }

  test("corpus: top-k are non-adjacent, AA-sorted, deterministic ties") {
    val dir = "/root/testdata/sf0.001"
    val out = LinkPredict.qLinkPredict(spark, dir).collect()
    assert(out.length === LinkPredict.lpTopK)
    val edges = graft.operators.PageRank.coPurchaseEdgesMemo(spark, dir)
      .filter(org.apache.spark.sql.functions.col("src") <
        org.apache.spark.sql.functions.col("dst"))
      .select("src", "dst").as[(Long, Long)].collect().toSet
    out.foreach { r =>
      assert(!edges.contains((r.getLong(0), r.getLong(1))))
      assert(r.getLong(0) < r.getLong(1))
    }
    val aas = out.map(r => r.getLong(r.fieldIndex("aa_micro"))).toSeq
    assert(aas === aas.sorted.reverse)
  }
}
