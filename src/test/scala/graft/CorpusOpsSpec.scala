package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.CorpusOps

/** Corpus-model operators: vocabulary, hashed-classifier inference,
  * boilerplate removal, bigram-LM scoring — hand-checked on tiny planted
  * corpora plus sf0.001 sanity. */
class CorpusOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def docsOf(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang")
  }

  test("vocab: counts and the (n desc, word asc) cut line are exact") {
    val docs = docsOf(
      (1L, "b a b c", "en"),
      (2L, "a b d", "en"))
    val got = CorpusOps.vocab(docs, topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // counts: b=3, a=2, c=1, d=1 → top3 cuts at the c/d tie, word asc
    assert(got === Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }

  test("classifier: score is the sum of md5-derived bucket weights, map-only") {
    val docs = docsOf((1L, "alpha beta alpha", "en"))
    val row = CorpusOps.classify(docs).collect().head
    // independent reimplementation of the weight chain, driver-side
    def weight(word: String): Long = {
      def md5hex8(s: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
      }
      val bucket = md5hex8(word) % CorpusOps.classifierBuckets
      md5hex8(bucket.toString) % 2001 - 1000
    }
    assert(row.getAs[Long]("n_tokens") === 3L)
    assert(row.getAs[Long]("score") ===
      2 * weight("alpha") + weight("beta"))
    assert(row.getAs[Int]("keep") === (if (row.getAs[Long]("score") > 0) 1 else 0))
    // inference must be a pure map: no exchange anywhere in the plan
    val plan = CorpusOps.classify(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier plan shuffles:\n$plan")
  }

  test("classifier: colliding words share a bucket weight (hashing trick)") {
    // brute-force two words that land in the same bucket
    def bucket(word: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(word.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) %
        CorpusOps.classifierBuckets
    }
    val w0 = "w0"
    val mate = (1 to 100000).map("w" + _).find(w => w != w0 && bucket(w) == bucket(w0)).get
    val scores = CorpusOps.classify(docsOf((1L, w0, "en"), (2L, mate, "en")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score")).toMap
    assert(scores(1L) === scores(2L))
  }

  /** 10 distinct tokens = exactly one boilerplate line. */
  private def line(tag: String): String =
    (1 to CorpusOps.boilerplateLineLen).map(i => s"$tag$i").mkString(" ")

  test("boilerplate: shared lines stripped, unique lines kept in order, " +
    "all-boilerplate docs survive with empty text") {
    val nav = line("nav")
    val docs = docsOf(
      (1L, s"$nav ${line("a")} ${line("b")}", "en"),
      (2L, s"${line("c")} $nav", "en"),
      (3L, nav, "en")) // nothing but the shared line
    val got = CorpusOps.boilerplate(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept_lines"),
          r.getAs[String]("clean_text")))).toMap
    assert(got(1L) === ((3L, 2L, s"${line("a")} ${line("b")}")))
    assert(got(2L) === ((2L, 1L, line("c"))))
    assert(got(3L) === ((1L, 0L, "")))
  }

  test("boilerplate: a line repeated WITHIN one doc only is not boilerplate") {
    val rep = line("rep")
    val docs = docsOf((1L, s"$rep $rep", "en"), (2L, line("x"), "en"))
    val got = CorpusOps.boilerplate(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(got(1L) === s"$rep $rep") // docfreq 1 → kept, both copies
  }

  test("bounded common-line build: verdict-equal to the exact single-phase " +
    "store, even under a collision-saturated 8-bucket modulus") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val exact = CorpusOps.lineStats(docs)
      .filter(col("mn") =!= col("mx")).select("lh")
      .collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty) // the corpus actually has shared lines
    // default modulus (the production sizing)
    val bounded = CorpusOps.commonLineHashes(docs)
      .collect().map(_.getLong(0)).toSet
    assert(bounded === exact)
    // 8 buckets: every bucket is a candidate, phase 2 must still
    // reject each singleton exactly — proves the pre-filter can only
    // ever ADD candidates, never change a verdict
    val collided = CorpusOps.commonLineHashes(docs, buckets = 8L)
      .collect().map(_.getLong(0)).toSet
    assert(collided === exact)
  }

  test("lm score: add-1 bigram arithmetic, OOV counting, short docs") {
    val docs = docsOf(
      (1L, "a b a b", "en"),   // train: bigrams ab, ba, ab
      (2L, "a b z", "de"),     // scored: ab (seen), bz (OOV)
      (3L, "a", "de"))         // 0 bigrams
    // model: c(a,b)=2 c(b,a)=1; c1(a·)=2 c1(b·)=1; V=|{a,b}|=2
    val v = 2.0
    def nll(c12: Long, c1: Long): Long =
      math.round(math.log((c1 + v) / (c12 + 1.0)) * 1e6)
    val got = CorpusOps.lmScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("oov_bigrams"),
          r.getAs[Long]("nll_micro")))).toMap
    assert(got(1L) === ((3L, 0L, 2 * nll(2, 2) + nll(1, 1))))
    assert(got(2L) === ((2L, 1L, nll(2, 2) + nll(0, 1))))
    assert(got(3L) === ((0L, 0L, 0L)))
  }

  test("lm score on sf0.001: English scores below non-English on average") {
    val scored = CorpusOps.qLmScore(spark, dir)
      .filter(col("n_bigrams") > 0)
      .withColumn("avg_nll",
        col("nll_micro").cast("double") / col("n_bigrams"))
      .groupBy(col("lang") === CorpusOps.lmTrainLang)
      .agg(avg("avg_nll").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getAs[Double]("m")).toMap
    // the train slice must look more likely to its own model — the
    // CCNet selection signal this operator exists to produce
    assert(scored(true) < scored(false))
  }

  test("vocab on sf0.001 is the corpus's true global word count head") {
    val docs = Tables(spark, dir, "documents")
    val brute = docs.collect().flatMap(_.getAs[String]("text").split(" "))
      .groupBy(identity).view.mapValues(_.length).toMap
    val got = CorpusOps.qVocab(spark, dir).collect()
    got.foreach(r => assert(brute(r.getString(0)) === r.getLong(1)))
    // top-1 really is the max count
    assert(got.head.getLong(1) === brute.values.max)
  }

  test("classifier train: batch-perceptron trace and final weights match " +
    "a driver-side replay; the distilled model learns the gate") {
    val model = CorpusOps.trainClassifier(Tables(spark, dir, "documents"))
    // independent replay over collected docs — same md5 bucketing, same
    // gate labels, same mistake-driven integer updates
    def md5hex8(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val stop = Set("the", "a", "of", "and", "to")
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val feats = docs.map { case (id, t) =>
      id -> t.split(" ", -1).groupBy(w =>
        md5hex8(w) % CorpusOps.classifierBuckets)
        .map { case (b, ws) => b -> ws.length.toLong }
    }.toMap
    val labels = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val y = t.length >= 100 &&
        "[.,;:!?]".r.findAllIn(t).size.toDouble / t.length <= 0.3 &&
        toks.count(stop).toDouble / toks.length >= 0.01
      id -> (if (y) 1L else 0L)
    }.toMap
    var w = Map.empty[Long, Long]
    val trace = (1 to CorpusOps.classifierTrainRounds).map { r =>
      val errs = docs.map(_._1).map { id =>
        val margin = feats(id).map { case (b, c) =>
          c * w.getOrElse(b, 0L) }.sum
        id -> (labels(id) - (if (margin > 0) 1L else 0L))
      }.filter(_._2 != 0L)
      errs.foreach { case (id, e) =>
        feats(id).foreach { case (b, c) =>
          w = w.updated(b, w.getOrElse(b, 0L) + c * e)
        }
      }
      (r, errs.length.toLong, w.valuesIterator.map(math.abs).sum)
    }
    assert(model.rounds.map(r => (r.round, r.nMistakes, r.wL1)) === trace)
    // final weights agree under default-0 semantics (a bucket whose
    // updates cancel may be present as 0 in one map, absent in the other)
    (model.weights.keySet ++ w.keySet).foreach { b =>
      assert(model.weights.getOrElse(b, 0L) === w.getOrElse(b, 0L), s"w[$b]")
    }
    // distillation converges toward the gate on this corpus: the final
    // round's mistakes are strictly below round 1's (which mispredicts
    // every positive under the zero model)
    assert(model.rounds.last.nMistakes < model.rounds.head.nMistakes)
    // labels are non-degenerate — both classes present, or the task
    // would prove nothing
    assert(labels.values.toSet === Set(0L, 1L))

    // TRAIN → SERVE: literal-map inference reproduces the replay's
    // margins under the final weights, and the plan is map-only (no
    // join, no exchange between scan and score)
    val served = CorpusOps.classifyWith(
      Tables(spark, dir, "documents"), model.weights).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("score"),
        r.getAs[Int]("pred")))).toMap
    docs.foreach { case (id, _) =>
      val margin = feats(id).map { case (b, c) =>
        c * w.getOrElse(b, 0L) }.sum
      assert(served(id) === ((margin, if (margin > 0) 1 else 0)), s"doc $id")
    }
    val plan = CorpusOps.classifyWith(
      Tables(spark, dir, "documents"), model.weights)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      plan.take(600))
  }

  test("classifier train with caller labels: converges to zero mistakes " +
    "on a linearly separable toy and the served model separates it") {
    import spark.implicits._
    // 'spamword' appears iff label 0 — separable under bag-of-words
    val docs = Seq(
      (1L, "buy spamword now now", 0),
      (2L, "spamword offer deal", 0),
      (3L, "meeting notes for tuesday", 1),
      (4L, "quarterly report draft", 1),
      (5L, "lunch plans and notes", 1),
      (6L, "cheap spamword deal deal", 0)
    ).toDF("doc_id", "text", "quality")
    val model = CorpusOps.trainClassifier(docs, rounds = 8,
      labelCol = Some("quality"))
    assert(model.rounds.last.nMistakes === 0L) // converged
    val served = CorpusOps.classifyWith(docs, model.weights).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("pred")).toMap
    Seq(1L, 2L, 6L).foreach(id => assert(served(id) === 0, s"doc $id"))
    Seq(3L, 4L, 5L).foreach(id => assert(served(id) === 1, s"doc $id"))
  }

  // ------------------------------------------------------------ threshold

  test("score threshold: two-phase selection equals brute-force k-th order " +
    "statistic, incl. ties at the cut and negative scores") {
    import spark.implicits._
    def brute(scores: Seq[Long], num: Long, den: Long): (Long, Long, Long, Long) = {
      val n = scores.size.toLong
      val k = (n * num + den - 1) / den
      val thr = scores.sorted(Ordering[Long].reverse)(k.toInt - 1)
      (n, k, thr, scores.count(_ >= thr).toLong)
    }
    def run(scores: Seq[Long], num: Long = 1L, den: Long = 4L) = {
      val df = scores.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "score")
      val r = CorpusOps.scoreThreshold(df, keepNum = num, keepDen = den)
        .collect().head
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
        brute(scores, num, den), s"scores=$scores")
    }
    run(Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L))    // clean cut
    run(Seq(5L, 5L, 5L, 5L, 1L, 1L, 1L, 1L))            // tie class straddles
    run((-5000L to 5000L by 7L))                        // negatives, many buckets
    run(Seq(-4097L, -4096L, -1L, 0L, 1L, 4095L, 4096L)) // bucket boundaries
    run(Seq(42L))                                       // single doc
    run((1L to 100L), num = 99L, den = 100L)            // keep almost all
    // and on real data: the calibrated gate keeps ~ the target quarter
    val real = CorpusOps.scoreThreshold(
      CorpusOps.classify(Tables(spark, dir, "documents"))
        .select(col("doc_id"), col("score"))).collect().head
    assert(real.getLong(3) >= real.getLong(1)) // ties only widen
    assert(real.getLong(3) < real.getLong(0))  // strict subset
  }

  // ----------------------------------------------------------------- dsir

  test("dsir: logw is the exact micronat sum of per-bucket log-ratios " +
    "(independent driver-side recomputation)") {
    val docs = docsOf(
      (1L, "alpha beta", "en"),
      (2L, "gamma delta", "de"))
    val model = CorpusOps.trainDsir(docs, targetLang = "en",
      materialize = false)
    val got = CorpusOps.dsirWeightsWith(docs, model).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_feats"),
        r.getAs[Long]("logw_micro"))).toMap
    // independent reimplementation: features = unigrams + bigrams,
    // bucket = md5-first-8-hex % B, λ = round(ln((ct+1)(Nr+B)/((cr+1)(Nt+B)))·1e6)
    def bucket(f: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) %
        CorpusOps.dsirBuckets
    }
    def feats(text: String): Seq[Long] = {
      val w = text.split(" ", -1).toSeq
      (w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))).map(bucket)
    }
    val all = Seq("alpha beta", "gamma delta").flatMap(feats)
    val tgt = feats("alpha beta")
    val b = CorpusOps.dsirBuckets
    val (nr, nt) = (all.size.toLong, tgt.size.toLong)
    def lam(bk: Long): Long = {
      val cr = all.count(_ == bk).toLong
      val ct = tgt.count(_ == bk).toLong
      math.round(math.log(
        ((ct + 1).toDouble * (nr + b)) / ((cr + 1).toDouble * (nt + b))) * 1e6)
    }
    assert(got(1L) === ((3L, feats("alpha beta").map(lam).sum)))
    assert(got(2L) === ((3L, feats("gamma delta").map(lam).sum)))
  }

  test("dsir: resample recovers a planted target domain") {
    // target domain speaks vocabulary A; the raw pool is mostly B-dialect
    val a = (1 to 8).map(i => (i.toLong, "data spark shuffle join", "tgt"))
    val bDocs = (9 to 28).map(i =>
      (i.toLong, s"weather rain cloud wind w$i", "other"))
    val mixed = Seq((29L, "data spark mumble", "other"),
      (30L, "weather spark data join", "other"))
    val docs = docsOf(a ++ bDocs ++ mixed: _*)
    val model = CorpusOps.trainDsir(docs, targetLang = "tgt",
      materialize = false)
    // every A-dialect doc outweighs every pure-B doc
    val w = CorpusOps.dsirWeightsWith(docs, model).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("logw_micro")).toMap
    val minA = (1L to 8L).map(w).min
    val maxB = (9L to 28L).map(w).max
    assert(minA > maxB, s"minA=$minA maxB=$maxB")
    // and the Gumbel top-k sample is dominated by target-like docs:
    // the 10 selected ids should include no more than 2 pure-B docs
    val sel = CorpusOps.dsirResampleWith(docs, model, k = 10).collect()
      .map(_.getLong(0)).toSet
    assert(sel.count(id => id >= 9L && id <= 28L) <= 2, sel.toSeq.sorted)
  }

  test("dsir on sf0.001: en mean weight beats every other language; " +
    "one-shot path ≡ materialized-model path") {
    val docs = Tables(spark, dir, "documents")
    val model = CorpusOps.trainDsir(docs)
    val byLang = CorpusOps.dsirWeightsWith(docs, model)
      .groupBy("lang").agg(avg(col("logw_micro")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = byLang.filter(_._1 != CorpusOps.dsirTargetLang).values
    assert(others.nonEmpty && others.forall(_ < byLang("en")), byLang)
    val oneShot = CorpusOps.dsirWeights(docs).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("logw_micro"))).sorted
    val served = CorpusOps.dsirWeightsWith(docs, model).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("logw_micro"))).sorted
    assert(oneShot === served)
  }
}
