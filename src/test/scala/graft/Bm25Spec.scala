package graft

import graft.ext.Bm25
import org.apache.spark.sql.functions._

/** BM25: hand-computed scores on a tiny corpus (tf saturation, length
  * normalization, idf ordering) and structural invariants on the
  * corpus query. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("bm25: hand-computed score on a two-doc corpus") {
    // doc 1: "cat cat dog" (len 3), doc 2: "dog mouse" (len 2);
    // query = [cat]: N=2, df(cat)=1, avgdl=2.5
    // idf = ln((2-1+0.5)/(1+0.5)+1) = ln(2); tf=2, dl=3
    // s = ln(2)*2*2.2/(2 + 1.2*(0.25+0.75*3/2.5))
    val docs = Seq((1L, "cat cat dog"), (2L, "dog mouse"))
      .toDF("doc_id", "text")
    val got = Bm25.bm25(docs, Seq("cat")).collect()
    assert(got.length === 1 && got.head.getLong(0) === 1L)
    val expected = math.log(2.0) * 2.0 * 2.2 /
      (2.0 + 1.2 * (0.25 + 0.75 * 3.0 / 2.5))
    assert(math.abs(got.head.getDouble(2) - expected) < 1e-12)
    assert(got.head.getLong(1) === 1L)
  }

  test("bm25: longer doc with same tf scores LOWER (length normalization)") {
    val docs = Seq(
      (1L, "cat dog"),
      (2L, "cat dog mouse horse bird fish snake wolf"))
      .toDF("doc_id", "text")
    val s = Bm25.bm25(docs, Seq("cat")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) > s(2L))
  }

  test("bm25: corpus query — every match carries ≥1 hit, rarer term outranks on idf") {
    val dir = "/root/testdata/sf0.001"
    val got = Bm25.qBm25(spark, dir)
    assert(got.count() > 0)
    assert(got.filter(col("n_hits") < 1 || col("n_hits") > 3).isEmpty)
    assert(got.filter(col("score") <= 0).isEmpty)
  }
}
