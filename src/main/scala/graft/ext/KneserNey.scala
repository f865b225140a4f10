package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** INTERPOLATED KNESER–NEY bigram scoring — the smoothing that actually
  * ships in production n-gram LMs (KenLM's default; Kneser & Ney 1995,
  * Chen & Goodman 1998 §2.7) — as the second, stronger head on the
  * corpus-LM family next to [[CorpusOps.qLmScore]]'s add-1 baseline.
  * Add-1 wildly over-penalizes unseen bigrams of frequent words; KN
  * backs off to the CONTINUATION count (how many distinct left
  * contexts a word appears in), which is why "Francisco" (frequent,
  * but only ever after "San") scores low as a novel continuation.
  *
  *   p_cont(w2)  = (N1+(·w2) + 1) / (N1+(··) + V)
  *   p(w2|w1)    = (max(c(w1,w2) − d, 0) + d·N1+(w1·)·p_cont(w2)) / c(w1·)
  *                 (w1 seen; d = 0.75, Chen & Goodman's fixed discount)
  *   p(w2|w1)    = p_cont(w2)                       (w1 unseen)
  *
  * with N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct
  * left contexts of w2, N1+(··) = distinct bigram TYPES, V = train
  * vocabulary. The +1/+V floor on p_cont is the standard engineering
  * deviation that keeps out-of-vocabulary continuations at positive
  * probability (pure KN assigns 0 to a w2 never seen in training,
  * which would make −ln p undefined on exactly the OOV documents a
  * quality filter most needs to score).
  *
  * DETERMINISM. Every model quantity is an exact integer count; the
  * per-bigram probability is a fixed-shape double expression (sub,
  * mul, div, add — each IEEE correctly rounded, so bit-identical in
  * any engine given the same parenthesization, which the oracle SQL
  * mirrors literally), and the only libm call is one ln per bigram,
  * pre-quantized to integer MICRONATS before the per-document sum —
  * the [[CorpusOps.qLmScore]] convention: bigint addition commutes,
  * the 1e6 quantum leaves ~3 orders of magnitude of slack over double
  * ulp, and d = 0.75 is exact in binary so the discount arithmetic
  * introduces no rounding at all.
  *
  * SCALE. The model is vocab-bounded (counts over bigram TYPES, never
  * corpus-sized): big/uni/cont are map-side-combined groupBys, scoring
  * is the corpus bigram stream left-joined to the three count tables
  * (AQE broadcasts a single-language model; degrades to shuffle join
  * past that), and B/V are two driver-side scalar counts — the same
  * bounded-metadata contract as lmScore's V. The trained model is
  * memoized per (session, corpus) via [[graft.util.SessionCache]],
  * the production train-once-score-every-batch lifetime. */
object KneserNey {

  /** Absolute discount, exact in binary (Chen & Goodman 1998 fix d
    * rather than estimate n1/(n1+2n2) — the estimated variant changes
    * only this constant). */
  val discount = 0.75

  private val micro = 1e6

  /** Trained KN model: bigram counts, per-w1 (total, distinct-cont)
    * counts, per-w2 continuation counts, and the two scalars
    * (B = bigram types, V = train vocab). Count tables are
    * localCheckpoint-materialized when built for reuse. */
  final case class KnModel(big: DataFrame, uni: DataFrame,
                           cont: DataFrame, b: Long, v: Long)

  /** Train on the [[CorpusOps.lmTrainLang]] slice (the CCNet posture:
    * trusted-slice model scores everything). `materialize` as in
    * [[CorpusOps.trainLmModel]]: checkpoint only the session-cached
    * artifact (raw localCheckpoint has no release path). */
  def train(docs: DataFrame, materialize: Boolean = true): KnModel = {
    val bi = CorpusOps.bigrams(docs)
      .filter(col("lang") === CorpusOps.lmTrainLang)
    val big0 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val big = if (materialize) big0.localCheckpoint() else big0
    val uni0 = big.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1f"))
    val uni = if (materialize) uni0.localCheckpoint() else uni0
    val cont0 = big.groupBy("w2").agg(count(lit(1)).as("n1r"))
    val cont = if (materialize) cont0.localCheckpoint() else cont0
    val b = big.count()
    val v: Long = docs.filter(col("lang") === CorpusOps.lmTrainLang)
      .select(explode(split(col("text"), " ")).as("word"))
      .agg(count_distinct(col("word"))).head.getLong(0)
    require(v > 0, s"KneserNey: no '${CorpusOps.lmTrainLang}' training docs")
    KnModel(big, uni, cont, b, v)
  }

  /** Score every document: (doc_id, lang, n_bigrams, oov_bigrams,
    * kn_nll_micro). oov = bigram type unseen in training. Zero-bigram
    * documents surface with all-zero counts (left join), same as
    * lmScore. */
  def scoreWith(docs: DataFrame, model: KnModel): DataFrame =
    scoreBigrams(docs, CorpusOps.bigrams(docs), model)

  private def scoreBigrams(docs: DataFrame, bi: DataFrame,
                           model: KnModel): DataFrame = {
    // p_cont shares one shape between both arms; the oracle SQL keeps
    // the identical parenthesization so the doubles agree bitwise.
    val bv = (model.b + model.v).toDouble
    val pcont = (coalesce(col("n1r"), lit(0L)) + lit(1L)).cast("double") /
      lit(bv)
    val pSeen = (greatest(col("c12n").cast("double") - lit(discount),
      lit(0.0)) + lit(discount) * col("n1f").cast("double") * pcont) /
      col("c1").cast("double")
    val p = when(col("c1").isNull, pcont).otherwise(pSeen)
    val term = round(-log(p) * micro).cast("bigint")
    val scored = bi
      .join(model.big, Seq("w1", "w2"), "left")
      .join(model.uni, Seq("w1"), "left")
      .join(model.cont, Seq("w2"), "left")
      .select(col("doc_id"), col("c1"), col("n1f"), col("n1r"),
        coalesce(col("c12"), lit(0L)).as("c12n"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum((col("c12n") === 0).cast("bigint")).as("oov_bigrams"),
        sum(term).as("kn_nll_micro"))
    docs.select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("oov_bigrams"), lit(0L)).as("oov_bigrams"),
        coalesce(col("kn_nll_micro"), lit(0L)).as("kn_nll_micro"))
  }

  def score(docs: DataFrame): DataFrame =
    scoreWith(docs, train(docs, materialize = false))

  def qKneserNey(spark: SparkSession, dir: String): DataFrame = {
    val model = graft.util.SessionCache.memoize(spark, "kn", dir) {
      train(Tables(spark, dir, "documents"))
    }
    scoreWith(Tables(spark, dir, "documents"), model)
  }

  // ---------------- vocab-capped variant (round 14) ----------------

  /** Vocabulary cap of the production-posture model. The uncapped
    * model's measured 100× ScaleCheck worst case is vocab growing
    * ~linearly with the corpus (6.80× serving slope) — production LMs
    * cap the vocab, which bounds every model table at (V+1)² REGARDLESS
    * of corpus growth and flattens the serving slope to the pure scan.
    * 16 < the 31-word en vocab of the test corpus, so the cap BINDS on
    * real data (the query is a genuine OOV-folding readout, not an
    * echo of the uncapped model). */
  val capV = 16

  /** The reserved OOV symbol every out-of-vocab token maps to. */
  val unk = "<unk>"

  /** A capped model is the SAME [[KnModel]] machinery trained on the
    * token stream with OOV mapped to [[unk]], plus the vocab table the
    * scorer must apply to its own tokens. */
  final case class CappedModel(model: KnModel, vocab: DataFrame)

  /** Map both bigram legs through the vocab: a miss becomes [[unk]].
    * The vocab is ≤ `capV` rows — always a broadcast join. */
  private def mapOov(bi: DataFrame, vocab: DataFrame): DataFrame =
    bi.join(broadcast(vocab.select(col("word").as("w1"),
        lit(1).as("in1"))), Seq("w1"), "left")
      .join(broadcast(vocab.select(col("word").as("w2"),
        lit(1).as("in2"))), Seq("w2"), "left")
      .select(col("doc_id"), col("lang"),
        when(col("in1").isNotNull, col("w1")).otherwise(lit(unk)).as("w1"),
        when(col("in2").isNotNull, col("w2")).otherwise(lit(unk)).as("w2"))

  /** Train with a top-`cap` vocabulary (by train token count,
    * deterministic word-asc tie-break — a TakeOrdered over the vocab-
    * bounded count table, never a global sort) and ALL out-of-vocab
    * mass folded into [[unk]]'s counts — the unigram-backoff folding
    * production n-gram LMs use (KenLM's --vocab_estimate posture). V
    * becomes min(cap, |vocab|) + 1[any train OOV]: exact, driver-side. */
  def trainCapped(docs: DataFrame, cap: Int = capV,
                  materialize: Boolean = true): CappedModel = {
    val trainToks = docs.filter(col("lang") === CorpusOps.lmTrainLang)
      .select(explode(split(col("text"), " ")).as("word"))
    val vocab0 = trainToks.groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc).limit(cap)
      .select("word")
    val vocab = if (materialize) vocab0.localCheckpoint() else vocab0
    val fullV = trainToks.agg(count_distinct(col("word"))).head.getLong(0)
    require(fullV > 0,
      s"KneserNey: no '${CorpusOps.lmTrainLang}' training docs")
    val v = if (fullV > cap) math.min(cap.toLong, fullV) + 1L else fullV
    val bi = mapOov(CorpusOps.bigrams(docs), vocab)
      .filter(col("lang") === CorpusOps.lmTrainLang)
    val big0 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val big = if (materialize) big0.localCheckpoint() else big0
    val uni0 = big.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1f"))
    val uni = if (materialize) uni0.localCheckpoint() else uni0
    val cont0 = big.groupBy("w2").agg(count(lit(1)).as("n1r"))
    val cont = if (materialize) cont0.localCheckpoint() else cont0
    CappedModel(KnModel(big, uni, cont, big.count(), v), vocab)
  }

  /** Score with a capped model: the scorer's own tokens pass through
    * the SAME vocab map, so eval-side OOV backs off through [[unk]]'s
    * folded statistics instead of the unbounded-vocab floor. */
  def scoreCapped(docs: DataFrame, capped: CappedModel): DataFrame =
    scoreBigrams(docs, mapOov(CorpusOps.bigrams(docs), capped.vocab),
      capped.model)

  def qKneserNeyCapped(spark: SparkSession, dir: String): DataFrame = {
    val model = graft.util.SessionCache.memoize(spark, "kn_capped", dir) {
      trainCapped(Tables(spark, dir, "documents"))
    }
    scoreCapped(Tables(spark, dir, "documents"), model)
  }

  /** The KN scoring CTE chain (toks … scored) — shared by
    * [[qKneserNeySql]] and the KN-gated curate oracle
    * ([[TextOps.qCurateKnSql]]); `scored` holds one row per document
    * WITH bigrams (zero-bigram docs surface only in the outer join the
    * full query adds). */
  val knScoreCtes: String = {
    val lang = CorpusOps.lmTrainLang
    s"""toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      |bi AS (
      |  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
      |  FROM toks, LATERAL unnest(generate_series(1, len(t)-1)) AS u(i)),
      |big AS (
      |  SELECT w1, w2, COUNT(*) AS c12 FROM bi
      |  WHERE lang = '$lang' GROUP BY 1, 2),
      |uni AS (
      |  SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1f FROM big GROUP BY 1),
      |cont AS (SELECT w2, COUNT(*) AS n1r FROM big GROUP BY 1),
      |sc AS (
      |  SELECT (SELECT COUNT(*) FROM big) AS b,
      |    (SELECT COUNT(DISTINCT word) FROM
      |       (SELECT unnest(t) AS word FROM toks WHERE lang = '$lang'))
      |      AS v),
      |terms AS (
      |  SELECT bi.doc_id,
      |    CASE WHEN big.c12 IS NULL THEN 1 ELSE 0 END AS oov,
      |    CASE WHEN uni.c1 IS NULL THEN
      |      CAST(COALESCE(cont.n1r, 0) + 1 AS DOUBLE)
      |        / CAST(sc.b + sc.v AS DOUBLE)
      |    ELSE
      |      (GREATEST(CAST(COALESCE(big.c12, 0) AS DOUBLE) - 0.75, 0.0)
      |        + 0.75 * CAST(uni.n1f AS DOUBLE)
      |          * (CAST(COALESCE(cont.n1r, 0) + 1 AS DOUBLE)
      |             / CAST(sc.b + sc.v AS DOUBLE)))
      |      / CAST(uni.c1 AS DOUBLE)
      |    END AS p
      |  FROM bi
      |  LEFT JOIN big USING (w1, w2)
      |  LEFT JOIN uni USING (w1)
      |  LEFT JOIN cont ON bi.w2 = cont.w2, sc),
      |scored AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(oov) AS BIGINT) AS oov_bigrams,
      |    CAST(SUM(CAST(round(-ln(p) * 1000000.0) AS BIGINT)) AS BIGINT)
      |      AS kn_nll_micro
      |  FROM terms GROUP BY doc_id)""".stripMargin
  }

  val qKneserNeySql: String =
    s"""WITH $knScoreCtes
      |SELECT toks.doc_id, lang,
      |  COALESCE(n_bigrams, 0) AS n_bigrams,
      |  COALESCE(oov_bigrams, 0) AS oov_bigrams,
      |  COALESCE(kn_nll_micro, 0) AS kn_nll_micro
      |FROM toks LEFT JOIN scored ON toks.doc_id = scored.doc_id""".stripMargin

  /** Oracle replay of the capped model: same chain with the top-V
    * vocab CTE (count-desc, word-asc tie-break — LIMIT $capV) and both
    * bigram legs mapped through it before training AND scoring. */
  val qKneserNeyCappedSql: String = {
    val lang = CorpusOps.lmTrainLang
    s"""WITH toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      |bi AS (
      |  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
      |  FROM toks, LATERAL unnest(generate_series(1, len(t)-1)) AS u(i)),
      |voc AS MATERIALIZED (
      |  SELECT word FROM (
      |    SELECT word, COUNT(*) AS cnt
      |    FROM (SELECT unnest(t) AS word FROM toks WHERE lang = '$lang')
      |    GROUP BY 1 ORDER BY cnt DESC, word ASC LIMIT $capV)),
      |fv AS (
      |  SELECT COUNT(DISTINCT word) AS fullv
      |  FROM (SELECT unnest(t) AS word FROM toks WHERE lang = '$lang')),
      |mbi AS MATERIALIZED (
      |  SELECT doc_id, lang,
      |    CASE WHEN v1.word IS NULL THEN '$unk' ELSE bi.w1 END AS w1,
      |    CASE WHEN v2.word IS NULL THEN '$unk' ELSE bi.w2 END AS w2
      |  FROM bi
      |  LEFT JOIN voc v1 ON bi.w1 = v1.word
      |  LEFT JOIN voc v2 ON bi.w2 = v2.word),
      |big AS (
      |  SELECT w1, w2, COUNT(*) AS c12 FROM mbi
      |  WHERE lang = '$lang' GROUP BY 1, 2),
      |uni AS (
      |  SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1f FROM big GROUP BY 1),
      |cont AS (SELECT w2, COUNT(*) AS n1r FROM big GROUP BY 1),
      |sc AS (
      |  SELECT (SELECT COUNT(*) FROM big) AS b,
      |    (SELECT CASE WHEN fullv > $capV THEN LEAST($capV, fullv) + 1
      |       ELSE fullv END FROM fv) AS v),
      |terms AS (
      |  SELECT mbi.doc_id,
      |    CASE WHEN big.c12 IS NULL THEN 1 ELSE 0 END AS oov,
      |    CASE WHEN uni.c1 IS NULL THEN
      |      CAST(COALESCE(cont.n1r, 0) + 1 AS DOUBLE)
      |        / CAST(sc.b + sc.v AS DOUBLE)
      |    ELSE
      |      (GREATEST(CAST(COALESCE(big.c12, 0) AS DOUBLE) - 0.75, 0.0)
      |        + 0.75 * CAST(uni.n1f AS DOUBLE)
      |          * (CAST(COALESCE(cont.n1r, 0) + 1 AS DOUBLE)
      |             / CAST(sc.b + sc.v AS DOUBLE)))
      |      / CAST(uni.c1 AS DOUBLE)
      |    END AS p
      |  FROM mbi
      |  LEFT JOIN big USING (w1, w2)
      |  LEFT JOIN uni USING (w1)
      |  LEFT JOIN cont ON mbi.w2 = cont.w2, sc),
      |scored AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(oov) AS BIGINT) AS oov_bigrams,
      |    CAST(SUM(CAST(round(-ln(p) * 1000000.0) AS BIGINT)) AS BIGINT)
      |      AS kn_nll_micro
      |  FROM terms GROUP BY doc_id)
      |SELECT toks.doc_id, lang,
      |  COALESCE(n_bigrams, 0) AS n_bigrams,
      |  COALESCE(oov_bigrams, 0) AS oov_bigrams,
      |  COALESCE(kn_nll_micro, 0) AS kn_nll_micro
      |FROM toks LEFT JOIN scored ON toks.doc_id = scored.doc_id"""
      .stripMargin
  }
}
