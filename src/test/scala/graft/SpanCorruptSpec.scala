package graft

import org.apache.spark.sql.functions._
import graft.ext.SpanCorrupt

class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ts: (Long, String)*) = ts.toSeq.toDF("doc_id", "text")

  test("short documents pass through uncorrupted with zero spans") {
    val text = (1 to 19).map(i => s"w$i").mkString(" ")
    val r = SpanCorrupt.spanCorrupt(docs((1L, text))).collect().head
    assert(r.getAs[Long]("n_words") === 19L)
    assert(r.getAs[Long]("n_spans") === 0L)
    assert(r.getAs[Long]("n_masked") === 0L)
    assert(r.getAs[String]("corrupted") === text)
    assert(r.getAs[String]("targets") === "")
  }

  test("empty and whitespace-only docs are safe") {
    val out = SpanCorrupt.spanCorrupt(docs((1L, ""), (2L, "   ")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_words") === 0L)
      assert(r.getAs[String]("corrupted") === "")
      assert(r.getAs[String]("targets") === "")
    }
  }

  test("one span per full block; structure is consistent") {
    val text = (1 to 45).map(i => s"w$i").mkString(" ") // 2 full blocks
    val r = SpanCorrupt.spanCorrupt(docs((7L, text))).collect().head
    assert(r.getAs[Long]("n_spans") === 2L)
    val nMasked = r.getAs[Long]("n_masked")
    assert(nMasked >= 4L && nMasked <= 8L) // 2 spans × len 2..4
    val corrupted = r.getAs[String]("corrupted").split(" ")
    val targets = r.getAs[String]("targets").split(" ")
    // corrupted = original words − masked + one sentinel per span
    assert(corrupted.length === 45 - nMasked + 2)
    // targets = masked words + one sentinel per span
    assert(targets.length === nMasked + 2)
    assert(corrupted.count(_.startsWith("<extra_id_")) === 2)
    assert(targets.count(_.startsWith("<extra_id_")) === 2)
    // sentinels are ordinal by block
    assert(corrupted.filter(_.startsWith("<extra_id_")).toSeq ===
      Seq("<extra_id_0>", "<extra_id_1>"))
    // reconstruction: replacing each sentinel in `corrupted` with its
    // span from `targets` recovers the original document
    val spans = r.getAs[String]("targets")
      .split("<extra_id_\\d+> ").filter(_.nonEmpty).map(_.trim)
    val rebuilt = spans.zipWithIndex.foldLeft(
      r.getAs[String]("corrupted")) { case (acc, (span, i)) =>
      acc.replace(s"<extra_id_$i>", span)
    }
    assert(rebuilt === text)
  }

  test("corruption is replayable and spans vary across blocks/docs") {
    val text = (1 to 200).map(i => s"w$i").mkString(" ")
    val a = SpanCorrupt.spanCorrupt(docs((1L, text))).collect()
      .head.toString
    val b = SpanCorrupt.spanCorrupt(docs((1L, text))).collect()
      .head.toString
    assert(a === b)
    // different doc ids corrupt differently (seed includes doc_id)
    val c = SpanCorrupt.spanCorrupt(docs((2L, text))).collect()
      .head.getAs[String]("corrupted")
    assert(c !== SpanCorrupt.spanCorrupt(docs((1L, text))).collect()
      .head.getAs[String]("corrupted"))
  }

  test("driver query: density lands near 15% on the corpus") {
    val out = SpanCorrupt.qSpanCorrupt(spark, "/root/testdata/sf0.001")
    val r = out.agg(
      sum("n_masked").cast("double").as("m"),
      sum(expr("n_spans * 20")).cast("double").as("fullw"))
      .head
    val density = r.getDouble(0) / r.getDouble(1)
    // mean span 3 per 20-word block → 15% of full-block words
    assert(density > 0.10 && density < 0.20, s"density $density")
  }
}
