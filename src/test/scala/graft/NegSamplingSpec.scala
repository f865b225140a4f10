package graft

import org.apache.spark.sql.functions._
import graft.ext.NegSampling

class NegSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("bands partition the mass: every draw resolves to exactly one word") {
    val out = NegSampling.qNegativeSample(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === NegSampling.negDraws)
    assert(out.map(_.getAs[Long]("d")).distinct.length ===
      NegSampling.negDraws)
    // deterministic: a second run is row-identical
    val again = NegSampling.qNegativeSample(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString) ===
      again.map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString))
  }

  test("draw frequency follows the ^(3/4) weights on a planted corpus") {
    // "a" appears 81 times, "b" 16: w(a)=27e6, w(b)=8e6 → a gets ~77%
    val docs = Seq((1L, (Seq.fill(81)("a") ++ Seq.fill(16)("b"))
      .mkString(" "))).toDF("doc_id", "text")
    val out = NegSampling.negativeSample(docs).collect()
    assert(out.length === NegSampling.negDraws)
    val byWord = out.groupBy(_.getAs[String]("word")).map {
      case (w, rs) => w -> rs.length
    }
    assert(byWord("a") > byWord("b"))
    assert(byWord("a") + byWord("b") === NegSampling.negDraws)
    // exact sqrt-derived micro weights: draws for b sit inside b's band
    val total = 27000000L + 8000000L
    assert(out.forall { r =>
      val u = r.getAs[Long]("u_micro")
      u >= 0 && u < total &&
        (r.getAs[String]("word") == "a") == (u < 27000000L)
    })
  }
}
