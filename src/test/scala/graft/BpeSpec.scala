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
}
