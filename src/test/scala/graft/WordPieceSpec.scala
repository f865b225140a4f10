package graft

import org.apache.spark.sql.functions._
import graft.ext.{Bpe, WordPiece}

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def types(ws: (String, Long)*) = ws.toSeq.toDF("word", "n")

  test("likelihood argmax beats raw frequency") {
    // "ab" appears in every word (high pair count but 'a','b' are
    // ubiquitous); "xy" co-occurs exclusively: whenever x or y appears
    // it is in the pair. WordPiece must merge (x,y) first even though
    // (a,b) has the higher raw count — the defining difference vs BPE.
    val t = types(
      ("abxy", 4L), ("ab", 6L), ("ba", 5L))
    val m = WordPiece.train(t, rounds = 1)
    assert(m.merges.nonEmpty)
    val (_, l, r, cnt, lcnt, rcnt) = m.merges.head
    assert((l, r) === ("x", "y"))
    assert(cnt === 4L && lcnt === 4L && rcnt === 4L)
  }

  test("early stop: singleton pairs never merge") {
    val m = WordPiece.train(types(("ab", 1L), ("cd", 1L)), rounds = 5)
    assert(m.merges.isEmpty)
    // vocab still covers characters + sentinel
    assert(m.vocab.contains("a") && m.vocab.contains(Bpe.eow))
  }

  test("greedy longest-match-first consumes maximal pieces") {
    val vocab = Set("a", "b", "c", "ab", "abc", Bpe.eow)
    val maxLen = 4
    val df = Seq("abcab", "cab", "zzz").toDF("w")
      .select(col("w"), WordPiece.greedyCount(
        concat(col("w"), lit(Bpe.eow)), vocab, maxLen).as("cnt"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // abcab -> abc, ab, </w> = 3; cab -> c, ab, </w> = 3;
    // zzz (OOV chars) -> z, z, z, </w> = 4
    assert(got("abcab") === 3L)
    assert(got("cab") === 3L)
    assert(got("zzz") === 4L)
  }

  test("training trace columns are exact on a hand corpus") {
    // corpus: 'aa' x5 → syms [a, a, </w>]; pairs (a,a)=5, (a,</w>)=5;
    // symbol counts a=10, </w>=5. Scores: (a,a)=5/100, (a,</w>)=5/50
    // → (a,</w>) wins: same count, rarer right symbol.
    val m = WordPiece.train(types(("aa", 5L)), rounds = 1)
    val (_, l, r, cnt, lcnt, rcnt) = m.merges.head
    assert((l, r) === ("a", Bpe.eow))
    assert(cnt === 5L && lcnt === 10L && rcnt === 5L)
  }

  test("driver queries run on testdata: trace rows and full doc cover") {
    val dir = "/root/testdata/sf0.001"
    val trace = WordPiece.qWordpieceTrain(spark, dir).collect()
    assert(trace.nonEmpty)
    assert(trace.map(_.getAs[Int]("rank")).toSeq ===
      (0 until trace.length).toSeq)
    assert(trace.forall(_.getAs[Long]("pair_count") >= 2L))
    val enc = WordPiece.qWordpieceEncode(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(enc.count() === docs)
    assert(enc.filter(col("n_wordpiece_tokens") <= 0).count() === 0L)
  }

  test("wordpiece fertility is sane vs word count") {
    val dir = "/root/testdata/sf0.001"
    val enc = WordPiece.qWordpieceEncode(spark, dir)
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("nw"))
    val row = enc.join(words, "doc_id")
      .agg(sum("n_wordpiece_tokens").as("nt"), sum("nw").as("nw"))
      .head
    val fert = row.getLong(0).toDouble / row.getLong(1)
    // each word yields at least its </w> piece and at most chars+1
    assert(fert >= 1.0 && fert < 30.0, s"fertility $fert out of range")
  }
}
