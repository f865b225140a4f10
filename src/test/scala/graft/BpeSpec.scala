package graft

import org.apache.spark.sql.functions._
import graft.ext.Bpe

/** BPE training against an independent driver-side reference
  * implementation, plus encode invariants. */
class BpeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Reference BPE: the textbook sequential algorithm over a
    * type-frequency map — same tie-break (count desc, pair asc). */
  private def referenceBpe(types: Map[String, Long],
                           rounds: Int): Seq[(Int, String, String, Long)] = {
    var segs: Map[Vector[String], Long] =
      types.map { case (w, n) => (w.split("").toVector :+ Bpe.eow) -> n }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < rounds && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + n)
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= 2 =>
          out += ((rank, l, r, c))
          segs = segs.map { case (syms, n) =>
            val merged = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == l && x == r)
                acc.init :+ (l + r)
              else acc :+ x
            }
            merged -> n
          }
          rank += 1
        case _ => done = true
      }
    }
    out.result()
  }

  private def corpusTypes: Map[String, Long] =
    Tables(spark, dir, "documents").select("text").collect()
      .flatMap(_.getString(0).split(" "))
      .groupBy(identity).map { case (w, v) => w -> v.length.toLong }

  test("distributed BPE equals the reference algorithm merge-for-merge") {
    val got = Bpe.qBpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val want = referenceBpe(corpusTypes, Bpe.bpeMerges)
    assert(got === want)
    assert(got.size === Bpe.bpeMerges) // this corpus sustains 20 merges
  }

  test("encode: tokens concatenate back to the word + sentinel, merges applied") {
    import spark.implicits._
    val model = graft.ext.Bpe.BpeModel(referenceBpe(corpusTypes, Bpe.bpeMerges))
    val words = corpusTypes.keys.toSeq.sorted.take(10)
    val toks = words.toDF("text")
      .select(col("text"), Bpe.encode(col("text"), model).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(toks(w).mkString("") === w + Bpe.eow)
    }
    // under a ONE-merge model, every word containing the (l, r) char
    // pair encodes with the merged symbol (later merges can consume an
    // early merge's symbol, so this is only assertable per-prefix-model)
    val first @ (_, l, r, _) = referenceBpe(corpusTypes, 1).head
    val model1 = graft.ext.Bpe.BpeModel(Seq(first))
    val carriers = corpusTypes.keys.filter { w =>
      val syms = w.split("").toVector :+ Bpe.eow
      syms.zip(syms.tail).contains((l, r))
    }.toSeq.sorted
    assert(carriers.nonEmpty) // the top pair came from somewhere
    val t1 = carriers.toDF("text")
      .select(col("text"), Bpe.encode(col("text"), model1).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    carriers.foreach(w => assert(t1(w).contains(l + r), s"word $w"))
  }

  test("packing by TRUE tokenizer counts: BPE token sizes flow through " +
    "the chunk grid and prefix sum") {
    import graft.ext.TextOps
    // the faithful production chain: chunk → count BPE tokens (not
    // whitespace words) → pack to the context budget by prefix sum
    val model = graft.ext.Bpe.BpeModel(referenceBpe(corpusTypes, Bpe.bpeMerges))
    val chunks = TextOps.qChunk(spark, dir)
      .select(col("doc_id"), col("chunk_id"),
        size(Bpe.encode(col("chunk_text"), model)).cast("bigint")
          .as("n_bpe_tokens"))
    val packed = graft.operators.PrefixSum.withRunningTotal(
        chunks, Seq(col("doc_id"), col("chunk_id")),
        "n_bpe_tokens", "cum_bpe")
      .withColumn("pack_id",
        expr(s"(cum_bpe - n_bpe_tokens) div ${TextOps.packContext}"))
      .collect()
    // BPE merges compress: every chunk's token count is <= chars+1
    // and >= 1; the running total is strictly increasing in the
    // deterministic (doc_id, chunk_id) order and packs are contiguous
    val byOrder = packed.sortBy(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")))
    var cum = 0L
    byOrder.foreach { r =>
      val n = r.getAs[Long]("n_bpe_tokens")
      assert(n >= 1)
      cum += n
      assert(r.getAs[Long]("cum_bpe") === cum)
    }
    val packIds = byOrder.map(_.getAs[Long]("pack_id"))
    assert(packIds.toSeq === packIds.sorted.toSeq) // monotone in stream order
  }

  test("string-form corpus encoding equals the array-form token counts") {
    import org.apache.spark.sql.functions._
    // two independent formulations of the same tokenizer: the
    // codegen'd replace-chain (qBpeEncode) and the aggregate-HOF fold
    // (encode) must count identically on every document
    val model = graft.ext.Bpe.BpeModel(referenceBpe(corpusTypes, Bpe.bpeMerges))
    val viaString = Bpe.qBpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaArray = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(Bpe.encode(col("text"), model)).cast("bigint").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaString === viaArray)
    // sanity: merges compress — fewer tokens than characters+words
    val chars = Tables(spark, dir, "documents")
      .select(sum(length(regexp_replace(col("text"), " ", ""))),
        sum(size(split(col("text"), " ")))).head()
    assert(viaString.values.sum < chars.getLong(0) + chars.getLong(1))
  }

  test("train stops when no pair repeats") {
    import spark.implicits._
    val types = Seq(("ab", 1L)).toDF("word", "n")
    assert(Bpe.train(types, rounds = 5).merges.isEmpty)
  }

  /** Driver-side replay of [[Bpe.encode]]'s exact semantics: non-empty
    * space-splits, chars + `</w>`, each merge one left-to-right
    * non-overlapping pass in rank order. */
  private def referenceEncode(text: String,
      merges: Seq[(Int, String, String, Long)]): Seq[String] =
    text.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
      var syms: Vector[String] = w.split("").toVector :+ Bpe.eow
      merges.foreach { case (_, l, r, _) =>
        val next = Vector.newBuilder[String]
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == l && syms(k + 1) == r) {
            next += (l + r); k += 2
          } else { next += syms(k); k += 1 }
        }
        syms = next.result()
      }
      syms
    }

  test("native tokenizer equals the fold encode token-for-token on the corpus") {
    val model = graft.ext.Bpe.BpeModel(referenceBpe(corpusTypes, Bpe.bpeMerges))
    val both = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        Bpe.encode(col("text"), model).as("fold"),
        Bpe.encodeFast(spark, col("text"), model).as("fast"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"doc ${r.getLong(0)}")
    }
  }

  test("native tokenizer matches the rank-order fold at >=1000 trained merges") {
    import spark.implicits._
    // the real corpus has 31 word types (105 sustainable merges), so a
    // production-sized model needs a synthetic vocabulary: seeded
    // pseudo-words with Zipf-ish counts, trained by the driver-side
    // reference — the same trainer the distributed loop is proven
    // against — to past 1000 merges
    val rnd = new scala.util.Random(42)
    val words = (0 until 2500).map { i =>
      val len = 4 + rnd.nextInt(9)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.distinct
    val types = words.zipWithIndex
      .map { case (w, i) => w -> (1L + 5000L / (i + 1)) }.toMap
    val merges = referenceBpe(types, 1200)
    assert(merges.size >= 1000, s"only ${merges.size} merges sustained")
    val model = graft.ext.Bpe.BpeModel(merges)
    // synthetic docs over that vocabulary; the native expression (one
    // plan node carrying the 1000+-rule broadcast — the shape the fold
    // Column could never compile at) must reproduce the driver fold
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until 30).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" "))
    }.toDF("id", "text")
    val got = docs
      .select(col("id"), col("text"),
        Bpe.encodeFast(spark, col("text"), model).as("toks"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](2) === referenceEncode(r.getString(1), merges),
        s"doc ${r.getLong(0)}")
    }
  }

  test("all three encode forms agree on whitespace edge cases") {
    import spark.implicits._
    val model = graft.ext.Bpe.BpeModel(referenceBpe(corpusTypes, Bpe.bpeMerges))
    // words drawn from the trained vocabulary, abused with leading /
    // trailing / repeated / all-space / empty whitespace
    val ws = corpusTypes.keys.toSeq.sorted.take(3)
    val texts = Seq(
      s"${ws(0)}  ${ws(1)}", s" ${ws(0)}", s"${ws(1)} ", "", " ", "   ",
      s"  ${ws(0)}   ${ws(1)}  ${ws(2)} ", ws.mkString(" "))
    val rows = texts.toDF("text")
      .select(col("text"),
        size(Bpe.encode(col("text"), model)).cast("bigint").as("via_fold"),
        size(Bpe.encodeFast(spark, col("text"), model)).cast("bigint")
          .as("via_native"),
        Bpe.countTokensStringForm(col("text"), model).as("via_string"))
      .collect()
    rows.foreach { r =>
      val (t, a, b, c) = (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      assert(a === b, s"fold vs native on '$t'")
      assert(a === c, s"fold vs string-form on '$t'")
      // driver-side reference agrees too
      assert(a === referenceEncode(t, model.merges).size.toLong,
        s"reference on '$t'")
    }
    // the multi-space text really exercises the normalization: same
    // tokens as its single-spaced twin
    val pair = Seq(s"${ws(0)}  ${ws(1)}", s"${ws(0)} ${ws(1)}").toDF("text")
      .select(Bpe.encodeFast(spark, col("text"), model).as("toks"))
      .collect().map(_.getSeq[String](0))
    assert(pair(0) === pair(1))
  }
}
