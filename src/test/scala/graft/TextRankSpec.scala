package graft

import graft.ext.TextRank

/** TextRank: the integer fixed point must conserve what the damping
  * model promises (Σ rank ≤ total mass, ≥ base mass), a hub word
  * wired to everything must outrank the periphery, stopwords must
  * never appear, and a two-word symmetric graph must tie exactly. */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("hub outranks periphery; stopwords excluded; ranks conserve") {
    // "net" co-occurs with every other word; the others only with net
    val docs = Seq(
      (1L, "net alpha net beta net gamma"),
      (2L, "net delta net alpha the net"),
      (3L, "net beta of net gamma net"))
      .toDF("doc_id", "text")
    val out = TextRank.textrank(docs).collect()
    assert(out.head.getString(0) === "net")
    val words = out.map(_.getString(0)).toSet
    assert(!words.contains("the") && !words.contains("of"))
    val total = out.map(_.getLong(1)).sum
    // top-k of a small graph = the whole node set here: the damped
    // integer walk keeps Σ rank within (15% base, 100%] of the mass
    assert(total <= 1000000000000L)
    assert(total >= 150000000000L)
  }

  test("two-word symmetric graph ties exactly") {
    val docs = Seq((1L, "ping pong ping pong ping")).toDF("doc_id", "text")
    val out = TextRank.textrank(docs).collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === out(1).getLong(1))
    // tie broken by word: ping before pong
    assert(out(0).getString(0) === "ping")
  }
}
