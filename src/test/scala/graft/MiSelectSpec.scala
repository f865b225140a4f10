package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import graft.operators.MiSelect
import graft.ext.CorpusOps

/** MI feature selection: scores must equal an independent JVM
  * recomputation over the same md5 bucket space, and a planted
  * perfectly-label-predictive token must rank first with MI equal to
  * the label entropy. */
class MiSelectSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def bucket(w: String): Long =
    java.lang.Long.parseLong(md5hex(w).substring(0, 8), 16) %
      CorpusOps.classifierBuckets

  // the gate: len >= 100, punct/len <= 0.3, stopword ratio >= 0.01.
  // good docs are long stopword-bearing text carrying the marker
  // token; bad docs are short. Filler varies per doc so several
  // buckets appear on each side.
  private def corpus = {
    val good = (0 until 12).map { i =>
      (i.toLong, s"signal the quick brown fox jumps over lazy dog f$i " +
        ("the word " * 12).trim)
    }
    val bad = (12 until 24).map { i => (i.toLong, s"noise tiny f$i") }
    (good ++ bad).toDF("doc_id", "text")
  }

  test("matches an independent recomputation; planted token ranks first") {
    val docs = corpus
    val rows = docs.as[(Long, String)].collect()
    def gate(t: String): Int = {
      val toks = t.split(" ")
      val punct = t.count("[.,;:!?]".toSet.contains(_)) // no regex chars
      val stop = toks.count(Set("the", "a", "of", "and", "to").contains)
      if (t.length >= 100 && punct.toDouble / t.length <= 0.3 &&
        stop.toDouble / toks.length >= 0.01) 1 else 0
    }
    val lab = rows.map { case (id, t) => id -> gate(t) }.toMap
    val nn = rows.length.toDouble
    val k1 = lab.values.sum.toDouble
    val present = rows.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).map(bucket).distinct.map(b => (b, id))
    }
    val expected = present.groupBy(_._1).map { case (b, docs0) =>
      val ids = docs0.map(_._2).distinct
      val n11 = ids.count(lab(_) == 1).toDouble
      val n10 = ids.count(lab(_) == 0).toDouble
      val n01 = k1 - n11
      val n00 = (nn - k1) - n10
      val p1 = n11 + n10
      def term(nij: Double, ni: Double, njv: Double): Long =
        if (nij == 0) 0L
        else math.round(1e6 * (nij / nn) * math.log(nn * nij / (ni * njv)))
      b -> (term(n11, p1, k1) + term(n10, p1, nn - k1) +
        term(n01, nn - p1, k1) + term(n00, nn - p1, nn - k1))
    }
    val got = MiSelect.miSelect(docs).collect()
      .map(r => r.getLong(r.fieldIndex("bucket")) ->
        r.getLong(r.fieldIndex("mi_micro"))).toMap
    got.foreach { case (b, mi) => assert(mi === expected(b), s"bucket $b") }
    // 'signal' appears in every good doc and no bad doc (as does the
    // stopword machinery) -> its bucket carries the full label
    // entropy ln 2 (k1 = nn/2): MI = ln 2 in micronats
    val top = MiSelect.miSelect(docs).collect().head
    // per-term quantization: 2 rounded halves of ln 2 may differ from
    // one rounded ln 2 by 1 micronat
    assert(math.abs(top.getLong(top.fieldIndex("mi_micro")) -
      math.round(1e6 * math.log(2.0))) <= 2)
    assert(top.getLong(top.fieldIndex("mi_micro")) ===
      expected.values.max)
    assert(math.abs(expected(bucket("signal")) -
      math.round(1e6 * math.log(2.0))) <= 2)
  }

  test("label-independent buckets score zero MI") {
    // every doc (both classes) contains the token 'everywhere' -> its
    // presence carries no information; planted with balanced classes
    val docs = ((0 until 4).map(i =>
      (i.toLong, "everywhere the common text body that runs long enough " +
        ("the pad " * 10).trim)) ++
      (4 until 8).map(i => (i.toLong, "everywhere brief"))).toDF("doc_id", "text")
    val out = MiSelect.miSelect(docs).collect()
      .map(r => r.getLong(r.fieldIndex("bucket")) ->
        r.getLong(r.fieldIndex("mi_micro"))).toMap
    assert(out(bucket("everywhere")) === 0L)
  }
}
