package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import graft.operators.FeatureHash

/** Hashing trick: bucket/sign/weight must equal an independent JVM
  * md5 recomputation, signs must cancel exactly, and the bucket space
  * must stay within 2^k. */
class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def bucket(w: String): Int =
    (java.lang.Long.parseLong(md5hex(w).substring(0, 8), 16) %
      FeatureHash.featureBuckets).toInt

  private def sign(w: String): Long =
    1L - 2L * (java.lang.Long.parseLong(md5hex("sg" + w).substring(0, 8), 16) % 2L)

  test("matches an independent md5 recomputation, occurrences summed") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "empty  gaps   collapse"), // multiple spaces -> empty tokens
      (3L, "repeat repeat repeat")
    ).toDF("doc_id", "text")
    val expected = docs.as[(Long, String)].collect().flatMap {
      case (id, text) =>
        text.split(" ").filter(_.nonEmpty)
          .map(w => ((id, bucket(w)), sign(w)))
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      .filter(_._2 != 0L)
    val got = FeatureHash.featureHash(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("buckets bounded by 2^k; per-doc |weight| mass <= token count") {
    val docs = Seq((1L, (1 to 100).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = FeatureHash.featureHash(docs).collect()
    assert(rows.forall(r => r.getInt(1) >= 0 &&
      r.getInt(1) < FeatureHash.featureBuckets))
    assert(rows.map(r => math.abs(r.getLong(2))).sum <= 100L)
  }
}
