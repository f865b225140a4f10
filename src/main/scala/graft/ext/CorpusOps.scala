package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-model operators — the model-adjacent stages of a training-data
  * pipeline (BASELINE north star; beyond the reference's own surface,
  * like `/root/reference/config.py`'s SQL views these generalize from):
  * vocabulary building (tokenizer training input), hashed linear
  * classifier inference (fasttext-style quality scoring), CCNet-style
  * line-frequency boilerplate removal, and n-gram LM
  * perplexity-proxy scoring (the KenLM filter of CCNet / RefinedWeb).
  *
  * Everything here is deterministic and engine-portable: hashes are md5
  * (same bytes in any engine), model weights derive from md5 folds, and
  * log-likelihoods are quantized to integer micronats per TERM before
  * summation, so sums are order-independent and the driver can
  * hash-compare against DuckDB replaying the identical arithmetic.
  */
object CorpusOps {

  // ---------------------------------------------------------------- vocab

  /** Vocabulary size for [[qVocab]] — production sizes this to the
    * tokenizer's budget; the shape of the plan is identical. */
  val vocabTopK = 50

  /** Vocabulary build — the corpus-wide word-frequency table every
    * tokenizer training run starts from, cut to the top-[[vocabTopK]]
    * types by (count desc, word asc) — a TOTAL order, so the cut line
    * is deterministic in any engine.
    *
    * Scale shape: explode is the only row amplification; the groupBy
    * gets map-side partial aggregation (hash-agg per partition emits at
    * most |vocab| rows per task, and vocabulary grows ~log of corpus
    * size — the shuffle is tiny at any SF); the ordered cut plans as
    * TakeOrderedAndProject (per-partition top-k, never a global sort). */
  def vocab(docs: DataFrame, topK: Int = vocabTopK): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(topK)

  def qVocab(spark: SparkSession, dir: String): DataFrame =
    vocab(Tables(spark, dir, "documents"))

  val qVocabSql: String =
    s"""SELECT word, CAST(COUNT(*) AS BIGINT) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word
      |      FROM documents)
      |GROUP BY word
      |ORDER BY n DESC, word
      |LIMIT $vocabTopK""".stripMargin

  // ----------------------------------------------------------- classifier

  /** Feature-hash buckets for [[qClassifier]]. Production uses 2^20+;
    * the plan shape (map-only, zero shuffle) is identical. */
  val classifierBuckets = 4096

  /** Weight range half-width: bucket weights live in [-1000, 1000]. */
  val classifierWeightSpan = 2001

  /** Integer weight of one word under the md5-derived hashed linear
    * model: bucket = md5(word) mod [[classifierBuckets]], weight =
    * md5(bucket) mod [[classifierWeightSpan]] − 1000. Two md5 folds —
    * one to hash the word into its feature bucket (words colliding into
    * a bucket SHARE a weight, the defining property of the hashing
    * trick), one standing in for the trained weight vector (a real
    * deployment broadcasts learned weights; the md5 fold gives the spec
    * and the oracle a weight vector both engines can derive). */
  /** Feature bucket of one word under the hashing trick: first 8 hex
    * digits of md5(word) mod [[classifierBuckets]] — shared by
    * inference ([[wordWeight]]) and training ([[trainClassifier]]). */
  private[graft] def wordBucket(w: Column): Column = pmod(
    conv(substring(md5(w.cast("binary")), 1, 8), 16, 10).cast("bigint"),
    lit(classifierBuckets.toLong))

  private def wordWeight(w: Column): Column = {
    val bucket = wordBucket(w)
    pmod(
      conv(substring(md5(bucket.cast("string").cast("binary")), 1, 8),
        16, 10).cast("bigint"),
      lit(classifierWeightSpan.toLong)) - lit(1000L)
  }

  /** Hashed-linear-classifier INFERENCE — the fasttext-shaped quality
    * scorer most curation pipelines run over every document: score =
    * Σ over tokens of weight[hash(token)], keep = score > 0. The
    * hashing trick makes the model a fixed-width vector regardless of
    * vocabulary, which is what lets inference run as a pure map.
    *
    * Scale shape: the whole score is ONE codegen'd `aggregate` HOF over
    * the token array — no explode, no shuffle, no UDF; inference runs
    * at scan speed on any corpus size, the ideal shape for scoring
    * 100 TB. Integer weights → bit-identical across engines. */
  def classify(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    docs.select(
      col("doc_id"),
      size(t).cast("bigint").as("n_tokens"),
      aggregate(t, lit(0L), (acc, w) => acc + wordWeight(w)).as("score"))
      .withColumn("keep", (col("score") > 0).cast("int"))
  }

  def qClassifier(spark: SparkSession, dir: String): DataFrame =
    classify(Tables(spark, dir, "documents"))

  val qClassifierSql: String =
    s"""WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id,
      |    CAST(CAST('0x' || substr(md5(CAST(
      |          CAST('0x' || substr(md5(word), 1, 8) AS UBIGINT)
      |            % $classifierBuckets AS VARCHAR)), 1, 8) AS UBIGINT)
      |        % $classifierWeightSpan AS BIGINT) - 1000 AS wgt
      |  FROM w)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(wgt) AS BIGINT) AS score,
      |  CAST(SUM(wgt) > 0 AS INT) AS keep
      |FROM scored GROUP BY doc_id""".stripMargin

  // ------------------------------------------------------ classifier train

  /** Training epochs for [[qClassifierTrain]] — enough for the batch
    * perceptron to converge (or visibly plateau) on the gate-label task
    * at every test SF; production tunes this like any epoch count. */
  val classifierTrainRounds = 6

  /** Per-round training metrics: mistakes BEFORE the round's update,
    * L1 norm of the weight vector AFTER it. */
  final case class TrainRound(round: Int, nMistakes: Long, wL1: Long)

  /** Trained model: final integer weight per feature bucket (absent
    * buckets are 0), plus the per-round metric trace. */
  final case class ClassifierModel(rounds: Seq[TrainRound],
                                   weights: Map[Long, Long])

  /** DISTRIBUTED CLASSIFIER TRAINING — batch perceptron (Rosenblatt
    * 1958, the mistake-driven ancestor of every linear text filter)
    * over hashed bag-of-words features, distilling the rule-based
    * quality gate ([[TextOps.qQualityFilter]]'s len/punct/stopword
    * predicate) into the same fixed-width model [[classify]] serves.
    * This is the fastText/CCNet quality-filter move — train a cheap
    * linear scorer on labels you can generate at corpus scale, then
    * run inference at scan speed — with the label source being the
    * pipeline's own heuristic gate (classifier distillation).
    *
    * Per round over the feature table `(doc_id, bucket, cnt)`:
    * margin_d = Σ_b cnt·w[b] (broadcast join against the ≤ B-row weight
    * table, partial-agg groupBy doc_id), pred = margin > 0, err = y −
    * pred ∈ {−1, 0, 1}; mistake docs send cnt·err back through a
    * groupBy bucket (≤ B rows out), and the driver folds the delta into
    * the weight map. ALL-INTEGER arithmetic: updates are
    * order-independent sums, so the trace and the final weights are
    * bit-identical in any engine and across any partitioning — which is
    * what lets the ENTIRE training loop be SQL-unrolled per round
    * ([[qClassifierTrainSql]], the BPE-training technique applied to
    * model fitting) and hash-checked by the driver.
    *
    * Scale shape: the corpus-sized work per round is one broadcast
    * join + two partial aggregations — no corpus-sized shuffle (doc_id
    * agg keys ≈ docs, bucket agg keys ≤ [[classifierBuckets]]); driver
    * state is the ≤ B-entry weight map and per-round deltas (bounded
    * model metadata, the BPE-argmax posture). The feature table is
    * built ONCE (explode + count, the one shuffle) and checkpointed;
    * rounds scan it without re-reading the corpus. At 100 TB with
    * B = 2²⁰ the weight table still broadcasts at ~16 MB. */
  def trainClassifier(docs: DataFrame,
                      rounds: Int = classifierTrainRounds,
                      labelCol: Option[String] = None): ClassifierModel = {
    val t = split(col("text"), " ")
    // TRACKED checkpoints (round-7 advice): the driver queries run this
    // inside SessionCache.memoize, which records every persistent RDD
    // the build creates as artifact-owned — a plain localCheckpoint
    // here would be PINNED for the whole session even though the
    // returned model is a driver-side weight map owning no executor
    // state. Tracked checkpoints are released before returning, so the
    // memoized entry owns zero blocks and the sweep has nothing to
    // carry.
    val (feats, releaseF) = graft.util.Checkpoints.checkpointTracked(
      docs.select(col("doc_id"), explode(t).as("word"))
        .select(col("doc_id"), wordBucket(col("word")).as("bucket"))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt")))
    // labels: a caller-provided 0/1 column (human ratings, a seed-set
    // membership flag, an LLM judge) — or the default gate distillation
    val yExpr = labelCol.map(c => col(c).cast("bigint")).getOrElse(
      (length(col("text")) >= 100 &&
        (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
          greatest(length(col("text")), lit(1))) <= 0.3 &&
        (size(filter(t, x => x.isInCollection(
          Seq("the", "a", "of", "and", "to")))).cast("double") /
          size(t)) >= 0.01).cast("bigint"))
    try {
      val (labels, releaseL) = graft.util.Checkpoints.checkpointTracked(
        docs.select(col("doc_id"), yExpr.as("y")))
      try {
        val spark = docs.sparkSession
        import spark.implicits._
        var w = Map.empty[Long, Long]
        val trace = Seq.newBuilder[TrainRound]
        for (r <- 1 to rounds) {
          val wDf =
            if (w.isEmpty)
              spark.emptyDataset[(Long, Long)].toDF("bucket", "wgt")
            else w.toSeq.toDF("bucket", "wgt")
          val margins = feats.join(broadcast(wDf), Seq("bucket"), "left")
            .groupBy("doc_id")
            .agg(sum(col("cnt") * coalesce(col("wgt"), lit(0L))).as("margin"))
          // two actions below read the mistake set; released per round
          val (errs, releaseE) = graft.util.Checkpoints.checkpointTracked(
            labels.join(margins, Seq("doc_id"))
              .select(col("doc_id"),
                (col("y") - when(col("margin") > 0, 1L).otherwise(0L))
                  .as("err"))
              .filter(col("err") =!= 0))
          try {
            val nMistakes = errs.count()
            val delta = feats.join(errs, Seq("doc_id"))
              .groupBy("bucket").agg(sum(col("cnt") * col("err")).as("d"))
              .collect() // ≤ classifierBuckets rows — bounded metadata
              .map(row => row.getAs[Long]("bucket") -> row.getAs[Long]("d"))
            w = delta.foldLeft(w) { case (acc, (b, d)) =>
              acc.updated(b, acc.getOrElse(b, 0L) + d)
            }
            trace += TrainRound(r, nMistakes,
              w.valuesIterator.map(math.abs).sum)
          } finally releaseE()
        }
        ClassifierModel(trace.result(), w)
      } finally releaseL()
    } finally releaseF()
  }

  /** Driver query: the per-round training trace — (round, n_mistakes,
    * w_l1). Every number is a function of the full iterative
    * computation (round t's mistakes depend on all t−1 prior weight
    * states), so the hash check pins the whole training loop, not just
    * its last state. Model memoized per dir (the persisted-artifact
    * posture: a deployment trains once and ships weights to
    * [[classify]]-shaped inference). */
  def qClassifierTrain(spark: SparkSession, dir: String): DataFrame = {
    val model = graft.util.SessionCache.memoize(spark, "clftrain", dir) {
      trainClassifier(Tables(spark, dir, "documents"))
    }
    import spark.implicits._
    model.rounds.map(r => (r.round, r.nMistakes, r.wL1))
      .toDF("round", "n_mistakes", "w_l1")
  }

  /** Full ANSI replay of [[qClassifierTrain]]: the feature and label
    * CTEs once, then per round t a margin CTE (left join on the prior
    * weight CTE), a mistake CTE, an update CTE, and the merged weight
    * CTE — weights exist only as chained CTE generations, exactly the
    * qBpeTrainSql unroll. Round 1 is specialized (all margins are 0
    * under empty weights, so err = y). Internal sums may widen to
    * HUGEINT in DuckDB; every surfaced column is CAST explicitly. */
  val qClassifierTrainSql: String = {
    s"${classifierTrainCtes}\n${classifierTrainMetricsSelect}"
  }

  /** The shared WITH-chain (feats, labels, and per-round e/u/w CTE
    * generations through w[[classifierTrainRounds]]) — the training
    * unroll both [[qClassifierTrainSql]] (metrics tail) and
    * [[qClassifierInferSql]] (scoring tail) select from. */
  /** The default gate label as a DuckDB predicate — shared by the
    * training unroll and the CV unroll. */
  private[graft] lazy val gateSql: String =
    """(length(text) >= 100
      |     AND CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |         / greatest(length(text), 1) <= 0.3
      |     AND CAST(len(list_filter(string_split(text, ' '),
      |           x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
      |         / len(string_split(text, ' ')) >= 0.01)""".stripMargin

  private[ext] lazy val classifierTrainCtes: String = {
    val b = classifierBuckets
    val gate = gateSql
    // Every CTE is MATERIALIZED: DuckDB 1.x INLINES CTEs by default,
    // so each round's w CTE referencing w(t−1) twice makes the plan
    // tree (and its cost) grow ~2^rounds — the measured effect was
    // 208 s for this oracle at sf0.01 vs 0.1 s materialized. The
    // driver's gate runs DuckDB, where MATERIALIZED is plain SQL.
    val header =
      s"""WITH toks AS MATERIALIZED (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |feats AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5(word), 1, 8) AS UBIGINT) % $b
        |      AS BIGINT) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY 1, 2),
        |lab AS MATERIALIZED (
        |  SELECT doc_id, CAST($gate AS BIGINT) AS y FROM documents),
        |e1 AS MATERIALIZED (
        |  SELECT doc_id, y AS err FROM lab WHERE y <> 0),
        |u1 AS MATERIALIZED (
        |  SELECT f.bucket, SUM(f.cnt * e.err) AS d
        |  FROM feats f JOIN e1 e USING (doc_id) GROUP BY 1),
        |w1 AS MATERIALIZED (
        |  SELECT bucket, SUM(d) AS wgt FROM u1 GROUP BY 1)""".stripMargin
    val later = (2 to classifierTrainRounds).map { t =>
      val p = t - 1
      s""",
        |m$t AS MATERIALIZED (
        |  SELECT f.doc_id, SUM(f.cnt * COALESCE(w.wgt, 0)) AS margin
        |  FROM feats f LEFT JOIN w$p w USING (bucket) GROUP BY 1),
        |e$t AS MATERIALIZED (
        |  SELECT l.doc_id,
        |    l.y - (CASE WHEN m.margin > 0 THEN 1 ELSE 0 END) AS err
        |  FROM lab l JOIN m$t m USING (doc_id)
        |  WHERE l.y <> (CASE WHEN m.margin > 0 THEN 1 ELSE 0 END)),
        |u$t AS MATERIALIZED (
        |  SELECT f.bucket, SUM(f.cnt * e.err) AS d
        |  FROM feats f JOIN e$t e USING (doc_id) GROUP BY 1),
        |w$t AS MATERIALIZED (
        |  SELECT bucket, SUM(v) AS wgt FROM (
        |    SELECT bucket, wgt AS v FROM w$p
        |    UNION ALL SELECT bucket, d FROM u$t) GROUP BY 1)""".stripMargin
    }.mkString
    s"$header$later"
  }

  private lazy val classifierTrainMetricsSelect: String =
    (1 to classifierTrainRounds).map { t =>
      s"""SELECT CAST($t AS INTEGER) AS round,
        |  CAST((SELECT COUNT(*) FROM e$t) AS BIGINT) AS n_mistakes,
        |  CAST((SELECT COALESCE(SUM(ABS(wgt)), 0) FROM w$t) AS BIGINT)
        |    AS w_l1""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Inference with TRAINED weights — [[classify]]'s scan-speed shape
    * over a real model instead of the md5 stand-in: the weight map
    * travels as ONE plan literal (bounded by [[classifierBuckets]]
    * entries; at B = 2²⁰ a deployment broadcasts instead), and the
    * score is a single codegen'd `aggregate` fold over the token
    * array — no explode, no join, no shuffle. Pure map at any corpus
    * size: the serving path a 100 TB scoring pass actually runs. */
  def classifyWith(docs: DataFrame, weights: Map[Long, Long]): DataFrame = {
    val nonzero = weights.filter(_._2 != 0L)
    val wmap =
      if (nonzero.isEmpty) typedLit(Map(-1L -> 0L)) // never-matching key:
      else typedLit(nonzero)                        // element_at → null → 0
    val t = split(col("text"), " ")
    docs.select(
      col("doc_id"),
      aggregate(t, lit(0L), (acc, w) =>
        acc + coalesce(element_at(wmap, wordBucket(w)), lit(0L)))
        .as("score"))
      .withColumn("pred", (col("score") > 0).cast("int"))
  }

  /** Driver query closing the TRAIN → SERVE loop: score every document
    * with the round-[[classifierTrainRounds]] trained weights (memoized
    * — same artifact [[qClassifierTrain]] builds) and surface the gate
    * label beside the prediction. Hash-checked end to end: the oracle
    * replays the ENTIRE training unroll and then the scoring join, so
    * a divergence anywhere in training surfaces here too. */
  def qClassifierInfer(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val model = graft.util.SessionCache.memoize(spark, "clftrain", dir) {
      trainClassifier(docs)
    }
    val t = split(col("text"), " ")
    classifyWith(docs, model.weights)
      .join(docs.select(col("doc_id"),
        (length(col("text")) >= 100 &&
          (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
            greatest(length(col("text")), lit(1))) <= 0.3 &&
          (size(filter(t, x => x.isInCollection(
            Seq("the", "a", "of", "and", "to")))).cast("double") /
            size(t)) >= 0.01).cast("int").as("y")), Seq("doc_id"))
  }

  /** CLASSIFIER EVALUATION — the confusion matrix + derived metrics of
    * the train → serve loop against its labels, the table a model
    * card reports: TP/FP/FN/TN under the final trained weights, with
    * precision/recall/accuracy as mirrored IEEE divisions of the
    * exact counts. One partial-agg pass over [[qClassifierInfer]]'s
    * output; the oracle replays the ENTIRE training unroll, the
    * scoring join, and the rollup — so the hash pins training,
    * serving, and evaluation in one row. */
  def qClassifierEval(spark: SparkSession, dir: String): DataFrame =
    qClassifierInfer(spark, dir)
      .agg(
        sum((col("pred") === 1 && col("y") === 1).cast("bigint")).as("tp"),
        sum((col("pred") === 1 && col("y") === 0).cast("bigint")).as("fp"),
        sum((col("pred") === 0 && col("y") === 1).cast("bigint")).as("fn"),
        sum((col("pred") === 0 && col("y") === 0).cast("bigint")).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        (col("tp").cast("double") / greatest(col("tp") + col("fp"), lit(1L)))
          .as("precision"),
        (col("tp").cast("double") / greatest(col("tp") + col("fn"), lit(1L)))
          .as("recall"),
        ((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("fn") + col("tn"))).as("accuracy"))

  val qClassifierEvalSql: String = {
    val wT = s"w$classifierTrainRounds"
    s"""$classifierTrainCtes,
      |final_score AS (
      |  SELECT f.doc_id, SUM(f.cnt * COALESCE(w.wgt, 0)) AS s
      |  FROM feats f LEFT JOIN $wT w USING (bucket) GROUP BY 1),
      |verdicts AS (
      |  SELECT CASE WHEN s.s > 0 THEN 1 ELSE 0 END AS pred, l.y
      |  FROM final_score s JOIN lab l USING (doc_id)),
      |cm AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS tp,
      |    CAST(SUM(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS fp,
      |    CAST(SUM(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS fn,
      |    CAST(SUM(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS tn
      |  FROM verdicts)
      |SELECT tp, fp, fn, tn,
      |  CAST(tp AS DOUBLE) / GREATEST(tp + fp, 1) AS precision,
      |  CAST(tp AS DOUBLE) / GREATEST(tp + fn, 1) AS recall,
      |  CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy
      |FROM cm""".stripMargin
  }

  /** CLASSIFIER CALIBRATION TABLE — the reliability diagram behind
    * every threshold decision the curation pipeline makes with this
    * model: split the scored corpus into equal-count score DECILES and
    * report, per decile, the predicted-positive rate against the
    * actual gate-label rate (exact integer permille). A well-calibrated
    * scorer shows label_rate rising monotonically with the decile and
    * crossing pred_rate near the decision boundary; a flat label_rate
    * means the score carries no signal at that margin.
    *
    * Equal-count bins need a global rank — the single-partition-window
    * trap — so the decile comes from the scalable two-level row number
    * ([[graft.operators.RowNumbering]]) via the exact remainder
    * arithmetic of `ntileFromRowNumber` (the
    * [[graft.operators.Aggregates.qNtile]] precedent, cross-validated
    * against DuckDB's native ntile by the oracle; the approximate
    * `(rn−1)·k div n + 1` identity holds only when k | n and was
    * retired by the round-16 edge-corpus sweep). Everything else is one partial-agg pass over the
    * |docs|-row inference output; rates are non-negative integer
    * divisions, so the truncating div agrees across engines. */
  def qCalibration(spark: SparkSession, dir: String): DataFrame = {
    val k = 10
    val inf = qClassifierInfer(spark, dir)
      .select(col("doc_id"), col("score"), col("pred"), col("y"))
    val n = inf.count()
    graft.operators.RowNumbering.withGlobalRowNumber(inf,
        Seq(col("score").asc, col("doc_id").asc), "rn")
      .withColumn("decile", graft.operators.RowNumbering
        .ntileFromRowNumber(k, math.max(n, 1L), "rn"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"),
        sum(col("pred").cast("bigint")).as("n_pred_pos"),
        sum(col("y").cast("bigint")).as("n_label_pos"))
      .select(col("decile"), col("n_docs"), col("min_score"),
        col("max_score"), col("n_pred_pos"), col("n_label_pos"),
        expr("1000 * n_pred_pos div n_docs").as("pred_rate_permille"),
        expr("1000 * n_label_pos div n_docs").as("label_rate_permille"))
  }

  /** The inference unroll as a subquery + DuckDB's native ntile over
    * the same (score, doc_id) total order — cross-validating the
    * engine's row-number identity — then the per-decile rollup. */
  // lazy: composes qClassifierInferSql, declared later in this object
  lazy val qCalibrationSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, score, pred, y,
      |    ntile(10) OVER (ORDER BY score, doc_id) AS decile
      |  FROM (${qClassifierInferSql.replace("\n", "\n  ")}) inf)
      |SELECT CAST(decile AS INTEGER) AS decile,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(MIN(score) AS BIGINT) AS min_score,
      |  CAST(MAX(score) AS BIGINT) AS max_score,
      |  CAST(SUM(pred) AS BIGINT) AS n_pred_pos,
      |  CAST(SUM(y) AS BIGINT) AS n_label_pos,
      |  CAST(1000 * SUM(pred) // COUNT(*) AS BIGINT)
      |    AS pred_rate_permille,
      |  CAST(1000 * SUM(y) // COUNT(*) AS BIGINT)
      |    AS label_rate_permille
      |FROM d GROUP BY decile""".stripMargin

  /** K-FOLD CROSS-VALIDATION of the gate classifier — the honest
    * generalization estimate [[qClassifierEval]] (which trains and
    * evals on the same corpus) cannot give: each fold f trains the
    * full [[classifierTrainRounds]]-round perceptron on the OTHER
    * folds and scores only fold f's held-out documents, so every
    * document's verdict comes from a model that never saw it. Folds
    * are the md5 coin on doc_id (the [[graft.ext.Dedup]] split
    * posture) — deterministic, engine-portable, stratification-free.
    *
    * Scale shape: [[cvFolds]] training loops, each the bounded-state
    * shape of [[trainClassifier]] (broadcast weight table + two
    * partial aggs per round); scoring is the map-only
    * [[classifyWith]] fold over each held-out slice. At 100 TB the
    * cost is folds × the training scan budget — which is exactly the
    * price of a real CV, stated rather than hidden. Models are
    * memoized per (dir, fold).
    *
    * Output: (fold, n_train, n_test, tp, fp, fn, tn, accuracy). The
    * ORACLE replays all [[cvFolds]] training unrolls (fold-filtered
    * labels — margins/updates only ever touch train docs) plus the
    * held-out scoring joins: the entire CV, lists and models
    * included, is hash-checked. */
  val cvFolds = 3

  private def docFold(d: Column): Column = pmod(
    conv(substring(md5(d.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("bigint"), lit(cvFolds.toLong))

  def qClassifierCv(spark: SparkSession, dir: String): DataFrame =
    classifierCv(Tables(spark, dir, "documents"), Some(dir))

  /** Core over any documents frame; `memoDir` keys the per-fold model
    * memoization (None = train fresh, the spec path). */
  def classifierCv(docs: DataFrame,
                   memoDir: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    val t = split(col("text"), " ")
    val gate = (length(col("text")) >= 100 &&
      (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
        greatest(length(col("text")), lit(1))) <= 0.3 &&
      (size(filter(t, x => x.isInCollection(
        Seq("the", "a", "of", "and", "to")))).cast("double") /
        size(t)) >= 0.01).cast("int")
    (0 until cvFolds).map { f =>
      def train() = trainClassifier(docs.filter(docFold(col("doc_id")) =!= f))
      val model = memoDir match {
        case Some(d) =>
          graft.util.SessionCache.memoize(spark, s"clfcv$f", d)(train())
        case None => train()
      }
      val test = docs.filter(docFold(col("doc_id")) === f)
      val nTrain = docs.filter(docFold(col("doc_id")) =!= f).count()
      classifyWith(test, model.weights)
        .join(test.select(col("doc_id"), gate.as("y")), "doc_id")
        .agg(
          count(lit(1)).as("n_test"),
          sum((col("pred") === 1 && col("y") === 1).cast("bigint")).as("tp"),
          sum((col("pred") === 1 && col("y") === 0).cast("bigint")).as("fp"),
          sum((col("pred") === 0 && col("y") === 1).cast("bigint")).as("fn"),
          sum((col("pred") === 0 && col("y") === 0).cast("bigint")).as("tn"))
        .select(lit(f).as("fold"), lit(nTrain).as("n_train"),
          col("n_test"), col("tp"), col("fp"), col("fn"), col("tn"),
          ((col("tp") + col("tn")).cast("double") /
            col("n_test").cast("double")).as("accuracy"))
    }.reduce(_ unionAll _)
  }

  /** The full CV unroll: shared feats/lab CTEs (lab carries the md5
    * fold), then per fold a complete fold-filtered training chain and
    * a held-out scoring tail. Every CTE MATERIALIZED (the DuckDB
    * inlining hazard grows with THREE chains). */
  lazy val qClassifierCvSql: String = {
    val b = classifierBuckets
    val foldExpr = s"""CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
      | 1, 8) AS UBIGINT) % $cvFolds AS BIGINT)""".stripMargin
      .replace("\n", "")
    val header =
      s"""WITH tokscv AS MATERIALIZED (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |featscv AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5(word), 1, 8) AS UBIGINT) % $b
        |      AS BIGINT) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM tokscv GROUP BY 1, 2),
        |labcv AS MATERIALIZED (
        |  SELECT doc_id, CAST($gateSql AS BIGINT) AS y,
        |    $foldExpr AS fold
        |  FROM documents)""".stripMargin
    val folds = (0 until cvFolds).map { f =>
      val trainChain = {
        val first =
          s""",
            |e1_$f AS MATERIALIZED (
            |  SELECT doc_id, y AS err FROM labcv
            |  WHERE fold <> $f AND y <> 0),
            |u1_$f AS MATERIALIZED (
            |  SELECT ft.bucket, SUM(ft.cnt * e.err) AS d
            |  FROM featscv ft JOIN e1_$f e USING (doc_id) GROUP BY 1),
            |w1_$f AS MATERIALIZED (
            |  SELECT bucket, SUM(d) AS wgt FROM u1_$f GROUP BY 1)""".stripMargin
        val later = (2 to classifierTrainRounds).map { tr =>
          val p = tr - 1
          s""",
            |m${tr}_$f AS MATERIALIZED (
            |  SELECT l.doc_id, l.y,
            |    SUM(ft.cnt * COALESCE(w.wgt, 0)) AS margin
            |  FROM labcv l
            |  JOIN featscv ft USING (doc_id)
            |  LEFT JOIN w${p}_$f w USING (bucket)
            |  WHERE l.fold <> $f GROUP BY 1, 2),
            |e${tr}_$f AS MATERIALIZED (
            |  SELECT doc_id,
            |    y - (CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS err
            |  FROM m${tr}_$f
            |  WHERE y <> (CASE WHEN margin > 0 THEN 1 ELSE 0 END)),
            |u${tr}_$f AS MATERIALIZED (
            |  SELECT ft.bucket, SUM(ft.cnt * e.err) AS d
            |  FROM featscv ft JOIN e${tr}_$f e USING (doc_id) GROUP BY 1),
            |w${tr}_$f AS MATERIALIZED (
            |  SELECT bucket, SUM(v) AS wgt FROM (
            |    SELECT bucket, wgt AS v FROM w${p}_$f
            |    UNION ALL SELECT bucket, d FROM u${tr}_$f)
            |  GROUP BY 1)""".stripMargin
        }.mkString
        first + later
      }
      val wT = s"w${classifierTrainRounds}_$f"
      val evalTail =
        s""",
          |sc_$f AS MATERIALIZED (
          |  SELECT l.doc_id, l.y,
          |    COALESCE(SUM(ft.cnt * COALESCE(w.wgt, 0)), 0) AS s
          |  FROM labcv l
          |  LEFT JOIN featscv ft USING (doc_id)
          |  LEFT JOIN $wT w USING (bucket)
          |  WHERE l.fold = $f GROUP BY 1, 2)""".stripMargin
      trainChain + evalTail
    }.mkString
    val rows = (0 until cvFolds).map { f =>
      s"""SELECT CAST($f AS INTEGER) AS fold,
        |  CAST((SELECT COUNT(*) FROM labcv WHERE fold <> $f) AS BIGINT)
        |    AS n_train,
        |  CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST(SUM(CASE WHEN s > 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS tp,
        |  CAST(SUM(CASE WHEN s > 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS fp,
        |  CAST(SUM(CASE WHEN s <= 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS fn,
        |  CAST(SUM(CASE WHEN s <= 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS tn,
        |  CAST(SUM(CASE WHEN (CASE WHEN s > 0 THEN 1 ELSE 0 END) = y
        |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS accuracy
        |FROM sc_$f""".stripMargin
    }.mkString("\nUNION ALL\n")
    header + folds + "\n" + rows
  }

  /** CROSS-SOURCE QUANTILE NORMALIZATION — harmonize a quality score
    * across heterogeneous sources before mixing them (the curation
    * problem: the same raw score means different things in Wikipedia
    * and CommonCrawl, so per-source thresholds drift; mapping every
    * source onto the CORPUS distribution makes one threshold govern
    * all). Classic quantile normalization, exactly: a doc at relative
    * rank p within its source gets the corpus score found at relative
    * rank p — rank arithmetic only, no floats:
    *
    *   permille    = (r_src − 1)·1000 div max(n_src − 1, 1)
    *   target_rank = 1 + permille·(N − 1) div 1000
    *   norm_score  = corpus score at target_rank (ties resolved by the
    *                 (score, doc_id) total order both engines share)
    *
    * Plan shape: scoring is the map-only hashed-classifier pass; the
    * per-source rank is one window over a source-keyed exchange (the
    * sessionizer shape); the corpus rank table comes from the scalable
    * two-level [[graft.operators.RowNumbering]] (NOT a single-partition
    * window); the final lookup is a shuffle join on the long rank key.
    * Two sorts + two joins total, each keyed and partial — the 100 TB
    * posture for any global-distribution alignment. All divisions are
    * non-negative, so truncating div agrees across engines. */
  def qQuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val t = split(col("text"), " ")
    val scored = docs.select(col("doc_id"), col("source"),
      aggregate(t, lit(0L), (acc, w) => acc + wordWeight(w)).as("score"))
    val n = scored.count()
    val corpusRanks = graft.operators.RowNumbering
      .withGlobalRowNumber(scored.select(col("score"), col("doc_id")),
        Seq(col("score").asc, col("doc_id").asc), "grank")
      .select(col("grank").as("target_rank"), col("score").as("norm_score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val ranked = scored
      .withColumn("r", row_number().over(
        w.orderBy(col("score"), col("doc_id"))).cast("long"))
      .withColumn("n_s", count(lit(1)).over(w))
      .withColumn("permille",
        expr("(r - 1) * 1000 div greatest(n_s - 1, 1L)"))
      .withColumn("target_rank",
        expr(s"1 + permille * ($n - 1) div 1000"))
    ranked.join(corpusRanks, "target_rank")
      .select(col("doc_id"), col("source"), col("score"), col("permille"),
        col("norm_score"))
  }

  val qQuantileNormSql: String =
    s"""WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(CAST('0x' || substr(md5(CAST(
      |          CAST('0x' || substr(md5(word), 1, 8) AS UBIGINT)
      |            % $classifierBuckets AS VARCHAR)), 1, 8) AS UBIGINT)
      |        % $classifierWeightSpan AS BIGINT) - 1000) AS BIGINT)
      |      AS score
      |  FROM w GROUP BY doc_id),
      |scored AS (
      |  SELECT d.doc_id, d.source, sc.score
      |  FROM documents d JOIN sc ON d.doc_id = sc.doc_id),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scored),
      |g AS (
      |  SELECT score AS norm_score,
      |    CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT)
      |      AS grank
      |  FROM scored),
      |r AS (
      |  SELECT doc_id, source, score,
      |    CAST(row_number() OVER (
      |      PARTITION BY source ORDER BY score, doc_id) AS BIGINT) AS r,
      |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
      |  FROM scored),
      |p AS (
      |  SELECT doc_id, source, score,
      |    (r - 1) * 1000 // GREATEST(n_s - 1, 1) AS permille,
      |    1 + ((r - 1) * 1000 // GREATEST(n_s - 1, 1))
      |      * ((SELECT n FROM nn) - 1) // 1000 AS target_rank
      |  FROM r)
      |SELECT p.doc_id, p.source, p.score,
      |  CAST(p.permille AS BIGINT) AS permille, g.norm_score
      |FROM p JOIN g ON g.grank = p.target_rank""".stripMargin

  /** [[classifierTrainCtes]] + a scoring tail: margins under the final
    * weight generation, pred = margin > 0, the gate label from `lab`. */
  val qClassifierInferSql: String = {
    val wT = s"w$classifierTrainRounds"
    s"""$classifierTrainCtes,
      |final_score AS (
      |  SELECT f.doc_id, SUM(f.cnt * COALESCE(w.wgt, 0)) AS s
      |  FROM feats f LEFT JOIN $wT w USING (bucket) GROUP BY 1)
      |SELECT s.doc_id, CAST(s.s AS BIGINT) AS score,
      |  CAST(CASE WHEN s.s > 0 THEN 1 ELSE 0 END AS INTEGER) AS pred,
      |  CAST(l.y AS INTEGER) AS y
      |FROM final_score s JOIN lab l USING (doc_id)""".stripMargin
  }

  // ---------------------------------------------------------- boilerplate

  /** Line length (tokens) for [[qBoilerplate]]'s deterministic
    * re-lining. The corpus has no newlines, so the "line" unit is a
    * fixed non-overlapping token grid — same segmentation family as
    * [[TextOps.qPassageDedup]]'s passages, at the granularity CCNet
    * removes (a web page's nav bars and footers are short lines). */
  val boilerplateLineLen = 10

  /** A line is boilerplate when it appears in at least this many
    * DISTINCT documents. Fixed at 2: the implementation exploits
    * `min(doc_id) ≠ max(doc_id)` ⟺ "≥ 2 distinct docs" for a fully
    * map-side-foldable skew-proof docfreq test; a higher threshold
    * would need a salted two-stage count-distinct instead. */
  val boilerplateMinDocs = 2

  /** CCNet-style line-frequency BOILERPLATE REMOVAL — sub-document
    * dedup that REWRITES the corpus rather than reporting duplicates:
    * segment every document into [[boilerplateLineLen]]-token lines,
    * count distinct documents per line, strip every line occurring in
    * ≥ [[boilerplateMinDocs]] docs, and reassemble each document from
    * its surviving lines in order. Documents made entirely of shared
    * content survive with empty text (visible, not silently dropped).
    *
    * Scale shape: segmentation is map-only; the docfreq groupBy and the
    * anti join both key on xxhash64 of the line — 8-byte longs through
    * every shuffle, line TEXT never leaves its original row. The
    * boilerplate test is NOT a count-distinct (a line present in 50 M
    * docs would funnel 50 M (line, doc) rows to one reducer): since
    * the threshold is "≥ 2 distinct docs", the predicate is exactly
    * `min(doc_id) ≠ max(doc_id)` over the line's occurrences — and
    * MIN/MAX partials fold map-side, so the hottest line ships ONE row
    * per input partition through the shuffle. The model build is
    * BOUNDED, not corpus-proportional: singleton lines (the unbounded,
    * vocabulary-driven part of the line population) are dropped BEFORE
    * the exact per-line aggregation by a bucketed pre-filter over a
    * FIXED modulus (see [[commonLineHashes]]) — boilerplate is by
    * definition high-docfreq, so a frequency floor loses nothing. The
    * anti join is a plain hash join on the long key, its build side
    * now bounded by true-common lines + collision noise rather than
    * corpus vocabulary. Reassembly sorts WITHIN each doc's group
    * (array_sort over (line_id, text) structs — per-group, never a
    * global window).
    *
    * Exactness caveat (stated, like every hash-keyed operator here):
    * lines are identified by their 64-bit xxhash64, while the stated
    * semantics and the SQL oracle key on line TEXT. A hash collision
    * conflates two distinct lines — potentially stripping a unique
    * line whose hash twin is common. Negligible at test scale; at the
    * 100 TB posture birthday collisions become plausible (n²/2·2⁻⁶⁴:
    * ~3% chance of one conflated pair at 10⁹ distinct lines, ~3
    * expected pairs at 10¹⁰), each costing at most one mis-stripped
    * line per affected document. Where that matters, verify flagged lines
    * by text in the anti join (text moves only for the ~common sliver,
    * so the exactness upgrade is cheap). */
  /** The deterministic line grid over (doc_id, text):
    * (doc_id, line_id, line_text, lh) — shared by the batch operator,
    * the streaming line-stats store, and the specs. */
  /** Line count of a text column under the grid — the ONE place the
    * grid arithmetic lives (with [[docLines]]' slice offsets derived
    * from the same constants). */
  private def lineCountOf(textCol: Column): Column =
    floor((size(split(textCol, " ")) - lit(1)).cast("double") /
      boilerplateLineLen).cast("bigint") + 1

  private[graft] def docLines(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val lastLine = lineCountOf(col("text")) - 1
    docs
      .select(col("doc_id"), t.as("t"),
        explode(sequence(lit(0L), lastLine)).as("line_id"))
      .select(col("doc_id"), col("line_id"),
        concat_ws(" ", slice(col("t"),
          (col("line_id") * boilerplateLineLen + 1).cast("int"),
          lit(boilerplateLineLen))).as("line_text"))
      .withColumn("lh", xxhash64(col("line_text")))
  }

  /** Per-line-hash occurrence bounds (lh, mn, mx) — the docfreq
    * SUFFICIENT STATISTIC for the ≥2-distinct-docs test (`mn ≠ mx`).
    * min/max form a commutative idempotent monoid, which is what lets
    * the streaming store maintain these incrementally with the same
    * convergence contract as the curated store's min-merge. */
  private[graft] def lineStats(docs: DataFrame): DataFrame =
    docLines(docs).groupBy("lh")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))

  /** Bucket modulus for [[commonLineHashes]]' pre-filter — the size
    * the intermediate model build is bounded by, independent of corpus
    * vocabulary. 2²¹ longs ≈ 16 MB as a broadcast candidate set. */
  val boilerplateBuckets: Long = 1L << 21

  /** The hashes of common (≥ 2 distinct docs) lines, with the exact
    * per-line aggregation bounded by a CONSTANT instead of corpus
    * vocabulary. Rationale: distinct lines grow with the corpus (the
    * 100× ScaleCheck measured the old single-phase build at 15.8× time
    * for 100× data, all of it vocabulary-driven singleton lines riding
    * the docfreq shuffle), but boilerplate is by definition
    * HIGH-docfreq — so a frequency floor drops the singleton mass
    * without changing any verdict. Two phases:
    *
    *   1. bucket stats — `min/max(doc_id)` per `lh mod 2²¹`: map-side
    *      combine folds each task's lines into ≤ [[boilerplateBuckets]]
    *      partials, so the shuffle and the resulting model are both
    *      bounded by the fixed modulus at ANY corpus size. A bucket
    *      with mn = mx holds ONLY lines confined to one document —
    *      every line in it is provably non-boilerplate.
    *   2. exact stats over candidate lines only — lines in mn ≠ mx
    *      buckets (true commons + the singleton sliver colliding with
    *      them, ~singletons/2²¹ per common bucket) join the broadcast
    *      candidate set and re-aggregate at full lh precision, where
    *      genuine singletons are rejected exactly as before.
    *
    * Verdict equality (CorpusOpsSpec proves it, including under a
    * forced 8-bucket modulus where every bucket collides): a ≥2-doc
    * line always lands in a ≥2-doc bucket, so phase 1 never drops a
    * true common; phase 2 is the original exact test. The price is a
    * second corpus scan (docLines is map-only) — at scale that is far
    * cheaper than shuffling the full vocabulary. */
  private[graft] def commonLineHashes(
      docs: DataFrame, buckets: Long = boilerplateBuckets): DataFrame = {
    val lines = docLines(docs)
    val bkt = pmod(col("lh"), lit(buckets))
    val candidateBuckets = lines
      .groupBy(bkt.as("bkt"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("bkt")
    lines
      .join(broadcast(candidateBuckets), bkt === col("bkt"), "left_semi")
      .groupBy("lh")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("lh")
  }

  /** Rewrite `docs` with every line in `commonLh` (a one-column `lh`
    * frame) stripped — the back half of [[boilerplate]], shared with
    * the streaming clean-corpus view (where `commonLh` comes from the
    * incrementally-maintained line-stats store). */
  def removeLines(docs: DataFrame, commonLh: DataFrame): DataFrame = {
    val kept = docLines(docs).join(commonLh, Seq("lh"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept_lines"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("line_id"), col("line_text")))),
            x => x.getField("line_text")),
          " ").as("clean_text"))
    docs
      .select(col("doc_id"), lineCountOf(col("text")).as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept_lines"), lit(0L)).as("n_kept_lines"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def boilerplate(docs: DataFrame): DataFrame =
    removeLines(docs, commonLineHashes(docs))

  /** Driver query: the common-line model is memoized per (session, dir)
    * like lm/dsir/clftrain — the two-scan build runs once and every
    * subsequent call measures scoring (the rewrite join), not rebuild.
    * The artifact is tiny (one lh column, bounded by true boilerplate
    * mass) and localCheckpoint-pinned inside the memoize so SessionCache
    * tracks and evicts its blocks with the session. */
  def qBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val common = graft.util.SessionCache.memoize(spark, "boilerplate", dir) {
      commonLineHashes(Tables(spark, dir, "documents")).localCheckpoint()
    }
    removeLines(Tables(spark, dir, "documents"), common)
  }

  val qBoilerplateSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |lines AS (
      |  SELECT doc_id, i AS line_id,
      |    array_to_string(t[i*$boilerplateLineLen+1 :
      |                      i*$boilerplateLineLen+$boilerplateLineLen],
      |      ' ') AS line_text
      |  FROM toks,
      |       LATERAL unnest(
      |         generate_series(0, (len(t)-1)//$boilerplateLineLen))
      |         AS u(i)),
      |common AS (
      |  SELECT line_text FROM lines
      |  GROUP BY line_text
      |  HAVING COUNT(DISTINCT doc_id) >= $boilerplateMinDocs),
      |kept AS (
      |  SELECT * FROM lines
      |  WHERE line_text NOT IN (SELECT line_text FROM common)),
      |rebuilt AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept_lines,
      |    string_agg(line_text, ' ' ORDER BY line_id) AS clean_text
      |  FROM kept GROUP BY doc_id)
      |SELECT toks.doc_id,
      |  CAST((len(t)-1)//$boilerplateLineLen + 1 AS BIGINT) AS n_lines,
      |  COALESCE(n_kept_lines, 0) AS n_kept_lines,
      |  COALESCE(clean_text, '') AS clean_text
      |FROM toks LEFT JOIN rebuilt ON toks.doc_id = rebuilt.doc_id""".stripMargin

  // ------------------------------------------------------------- LM score

  /** Language whose documents train the bigram LM — the CCNet posture:
    * train the LM on a trusted slice, score EVERYTHING with it, so
    * out-of-slice text surfaces with high perplexity. */
  val lmTrainLang = "en"

  /** Per-term quantization: nll terms are rounded to integer MICRONATS
    * before summation, making the per-document sum order-independent
    * (bigint addition commutes; double addition does not) — the same
    * move that makes every other oracle here engine-portable. */
  private val lmMicro = 1e6

  /** Bigram rows (doc_id, lang, w1, w2) for every document — map-only:
    * the pair list is built in-expression (zip of the token array with
    * its own tail) and explode is the only amplification. Documents
    * with < 2 tokens contribute no rows. */
  private[ext] def bigrams(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val pairs = arrays_zip(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))).as("w1"),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))).as("w2"))
    docs.select(col("doc_id"), col("lang"), explode(pairs).as("p"))
      .select(col("doc_id"), col("lang"),
        col("p").getField("w1").as("w1"), col("p").getField("w2").as("w2"))
  }

  /** Bigram-LM perplexity-proxy scoring — the KenLM quality filter of
    * CCNet/RefinedWeb re-expressed relationally: train an add-1-smoothed
    * bigram model on the [[lmTrainLang]] slice, then score every
    * document by total negative log-likelihood of its bigrams,
    *
    *   p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)
    *
    * with c(w1·) = bigram-start count and V = |distinct train tokens|.
    * Output per document: bigram count, OOV-bigram count (unseen in
    * training), and `nll_micro` = Σ round(−ln p × 1e6) as BIGINT —
    * integer micronats, so the sum commutes and DuckDB replaying the
    * identical arithmetic hash-matches (ln is correctly rounded on
    * these operand counts in both engines; the 1e6 quantum leaves
    * ~3 orders of magnitude of slack above double ulp error at the
    * observed term magnitudes). Downstream filters threshold
    * nll_micro / n_bigrams — avg nll ≈ log-perplexity.
    *
    * Scale shape: training counts are groupBys over (w1,w2) strings with
    * map-side partial agg (model size is vocab², independent of corpus
    * size); scoring is a natural-key left join of the corpus bigram
    * stream against the model — AQE broadcasts the model when it fits
    * (it does here and for any single-language model), degrading to a
    * shuffle join when it doesn't; the V scalar is one driver-side
    * count (bounded metadata, same contract as Merge's cutoff row). */
  /** A trained bigram model: the (w1,w2) count table, the bigram-start
    * count table, and the train-vocabulary size — the artifact a
    * production run trains ONCE and scores every batch with. The count
    * tables are localCheckpoint-materialized (vocab²-bounded, never
    * corpus-sized); [[qLmScore]] memoizes the model per
    * (session, corpus) via [[graft.util.SessionCache]], the same
    * lifetime contract as the IVF index. */
  final case class LmModel(big: DataFrame, uni: DataFrame, v: Long)

  /** `materialize = true` (the default) localCheckpoints the count
    * tables — right for a model scored many times, but the blocks have
    * no release path outside [[qLmScore]]'s session-cached artifact
    * (raw localCheckpoint is unreleasable — see
    * [[graft.util.Checkpoints]]). One-shot callers ([[lmScore]]) pass
    * `false`: the counts stay lazy plans, recomputed inside the single
    * scoring job, and nothing is pinned. */
  def trainLmModel(docs: DataFrame, materialize: Boolean = true): LmModel = {
    val train = bigrams(docs).filter(col("lang") === lmTrainLang)
    val big0 = train.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val big = if (materialize) big0.localCheckpoint() else big0
    val uni0 = big.groupBy("w1").agg(sum("c12").as("c1"))
    val uni = if (materialize) uni0.localCheckpoint() else uni0
    val v: Long = docs.filter(col("lang") === lmTrainLang)
      .select(explode(split(col("text"), " ")).as("word"))
      .agg(count_distinct(col("word"))).head.getLong(0)
    require(v > 0, s"lmScore: no '$lmTrainLang' training documents in input")
    LmModel(big, uni, v)
  }

  def lmScore(docs: DataFrame): DataFrame =
    lmScoreWith(docs, trainLmModel(docs, materialize = false))

  def lmScoreWith(docs: DataFrame, model: LmModel): DataFrame = {
    val bi = bigrams(docs)
    val v = model.v
    val term = round(log((col("c1n") + v).cast("double") /
      (col("c12n") + 1).cast("double")) * lmMicro).cast("bigint")
    val scored = bi
      .join(model.big, Seq("w1", "w2"), "left")
      .join(model.uni, Seq("w1"), "left")
      .select(col("doc_id"),
        coalesce(col("c12"), lit(0L)).as("c12n"),
        coalesce(col("c1"), lit(0L)).as("c1n"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum((col("c12n") === 0).cast("bigint")).as("oov_bigrams"),
        sum(term).as("nll_micro"))
    docs.select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("oov_bigrams"), lit(0L)).as("oov_bigrams"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"))
  }

  def qLmScore(spark: SparkSession, dir: String): DataFrame = {
    val model = graft.util.SessionCache.memoize(spark, "lm", dir) {
      trainLmModel(Tables(spark, dir, "documents"))
    }
    lmScoreWith(Tables(spark, dir, "documents"), model)
  }

  val qLmScoreSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      |bi AS (
      |  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
      |  FROM toks, LATERAL unnest(generate_series(1, len(t)-1)) AS u(i)),
      |big AS (
      |  SELECT w1, w2, COUNT(*) AS c12 FROM bi
      |  WHERE lang = '$lmTrainLang' GROUP BY 1, 2),
      |uni AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY 1),
      |v AS (
      |  SELECT COUNT(DISTINCT word) AS v FROM
      |    (SELECT unnest(t) AS word FROM toks WHERE lang = '$lmTrainLang')),
      |scored AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(CASE WHEN c12 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS oov_bigrams,
      |    CAST(SUM(CAST(round(ln(
      |        CAST(COALESCE(c1, 0) + v AS DOUBLE)
      |          / CAST(COALESCE(c12, 0) + 1 AS DOUBLE)) * 1000000.0
      |      ) AS BIGINT)) AS BIGINT) AS nll_micro
      |  FROM bi
      |  LEFT JOIN big USING (w1, w2)
      |  LEFT JOIN uni USING (w1), v
      |  GROUP BY doc_id)
      |SELECT toks.doc_id, lang,
      |  COALESCE(n_bigrams, 0) AS n_bigrams,
      |  COALESCE(oov_bigrams, 0) AS oov_bigrams,
      |  COALESCE(nll_micro, 0) AS nll_micro
      |FROM toks LEFT JOIN scored ON toks.doc_id = scored.doc_id""".stripMargin

  // ----------------------------------------------------------------- dsir

  /** DSIR — Data Selection via Importance Resampling (Xie et al.,
    * NeurIPS 2023): pick pretraining documents whose hashed-n-gram
    * distribution matches a small TARGET domain, by (1) counting
    * hashed unigram+bigram features into a fixed number of buckets for
    * the target slice and the raw corpus, (2) scoring every document
    * with the importance log-weight
    * `log w(x) = Σ_features log( p_target(bucket) / p_raw(bucket) )`
    * under add-1 smoothing, and (3) resampling without replacement
    * ∝ w via the Gumbel top-k trick.
    *
    * Engine-portable determinism (same posture as [[lmScoreWith]]):
    * the feature hash is md5 (identical bytes in any engine) reduced
    * mod [[dsirBuckets]]; each bucket's log-ratio is quantized to
    * integer micronats BEFORE the per-document sum, so the sum is
    * order-independent; the resampling Gumbel noise derives from a
    * salted md5 of the doc id, so the "random" draw is a pure function
    * of the row. The driver hash-compares both the weight table and
    * the selected sample against DuckDB replaying the identical
    * arithmetic.
    *
    * Scale shape (the reason DSIR beats classifier-based selection at
    * 100 TB): feature hashing is map-only codegen (split → explode →
    * md5 → mod); the count tables are ≤[[dsirBuckets]] rows each
    * regardless of corpus size (map-side partial agg, tiny shuffle);
    * scoring joins the bucket stream against the broadcast-sized λ
    * table and integer-sums per doc; the top-k resample plans as
    * TakeOrderedAndProject (per-partition heads, never a global
    * sort). Nothing grows with the corpus except the one map-only
    * feature pass. */
  val dsirBuckets = 1024

  /** Target slice for [[qDsirWeights]]/[[qDsirSample]] — the `en`
    * documents, the same slice the bigram LM trains on. Production
    * passes any predicate (a curated wiki dump, a human-rated set). */
  val dsirTargetLang = "en"

  /** Sample size for [[qDsirSample]] — 100 of the sf0.01 corpus's 500
    * docs; production sizes this to the token budget. */
  val dsirSampleK = 100

  private val dsirMicro = 1e6

  /** Hashed-feature stream: one row per unigram and per bigram of each
    * document, reduced to a bucket id in [0, [[dsirBuckets]]). */
  private def dsirFeatures(docs: DataFrame): DataFrame = {
    val uni = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("f"))
    val bi = bigrams(docs)
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", col("w1"), col("w2")).as("f"))
    uni.unionByName(bi)
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("f").cast("binary")), 1, 8), 16, 10)
          .cast("bigint") % dsirBuckets).as("b"))
  }

  /** A trained DSIR model: the ≤[[dsirBuckets]]-row per-bucket
    * importance table `(b, lam_micro)` where `lam_micro =
    * round(ln(p_target(b)/p_raw(b)) × 1e6)` under add-1 smoothing.
    * Same artifact contract as [[LmModel]]: `materialize = true`
    * localCheckpoints the (bounded) table for a model scored many
    * times; one-shot callers keep it lazy. */
  final case class DsirModel(lambda: DataFrame)

  def trainDsir(docs: DataFrame, targetLang: String = dsirTargetLang,
                materialize: Boolean = true): DsirModel = {
    val feats = dsirFeatures(docs)
    val raw = feats.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgt = feats.filter(col("lang") === targetLang)
      .groupBy("b").agg(count(lit(1)).as("ct"))
    // Totals are two scalar rows of bounded metadata (same contract as
    // Merge's cutoff row); B is the literal bucket count.
    val nr = feats.count()
    val nt = feats.filter(col("lang") === targetLang).count()
    require(nt > 0, s"trainDsir: no '$targetLang' target documents")
    val b = lit(dsirBuckets.toLong)
    // ln( (ct+1)(Nr+B) / (cr+1)(Nt+B) ) with each factor exact in
    // double (operand magnitudes ≪ 2^53 at model-build counts) and the
    // ops in a fixed order mirrored literally by the oracle SQL.
    val lam = round(log(
      ((coalesce(col("ct"), lit(0L)) + 1).cast("double") * (lit(nr) + b)) /
        ((col("cr") + 1).cast("double") * (lit(nt) + b))) * dsirMicro)
      .cast("bigint")
    val lambda0 = raw.join(tgt, Seq("b"), "left")
      .select(col("b"), lam.as("lam_micro"))
    DsirModel(if (materialize) lambda0.localCheckpoint() else lambda0)
  }

  /** Per-document importance log-weights in integer micronats, plus the
    * feature count (the weight's natural length normalizer). Every raw
    * bucket is in the λ table by construction, so the scoring join is
    * effectively total; the left-join + coalesce keeps empty docs. */
  def dsirWeightsWith(docs: DataFrame, model: DsirModel): DataFrame = {
    val scored = dsirFeatures(docs)
      .join(model.lambda, Seq("b"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("lam_micro"), lit(0L))).as("logw_micro"))
    docs.select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("logw_micro"), lit(0L)).as("logw_micro"))
  }

  def dsirWeights(docs: DataFrame): DataFrame =
    dsirWeightsWith(docs, trainDsir(docs, materialize = false))

  /** Gumbel top-k resample without replacement, ∝ exp(logw): priority =
    * logw_micro + round(−ln(−ln(u)) × 1e6) with u a salted-md5 uniform
    * in (0,1) — deterministic per row, so the draw replays anywhere.
    * Ties (impossible in practice at micronat resolution) break on
    * doc_id for a total order. */
  def dsirResampleWith(docs: DataFrame, model: DsirModel,
                       k: Int = dsirSampleK): DataFrame = {
    val u = (conv(substring(md5(concat(lit("dsir:"),
        col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    val gumbel = round(-log(-log(u)) * dsirMicro).cast("bigint")
    dsirWeightsWith(docs, model)
      .select(col("doc_id"), col("lang"), col("logw_micro"),
        (col("logw_micro") + gumbel).as("priority_micro"))
      .orderBy(col("priority_micro").desc, col("doc_id").asc)
      .limit(k)
  }

  def qDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val model = graft.util.SessionCache.memoize(spark, "dsir", dir) {
      trainDsir(Tables(spark, dir, "documents"))
    }
    dsirWeightsWith(Tables(spark, dir, "documents"), model)
  }

  def qDsirSample(spark: SparkSession, dir: String): DataFrame = {
    val model = graft.util.SessionCache.memoize(spark, "dsir", dir) {
      trainDsir(Tables(spark, dir, "documents"))
    }
    dsirResampleWith(Tables(spark, dir, "documents"), model)
  }

  private val dsirSqlCommon: String =
    s"""WITH toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      |feats AS (
      |  SELECT doc_id, lang,
      |    CAST(('0x' || substr(md5(f), 1, 8)) AS UBIGINT) % $dsirBuckets
      |      AS b
      |  FROM (
      |    SELECT doc_id, lang, unnest(t) AS f FROM toks
      |    UNION ALL
      |    SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS f
      |    FROM toks, LATERAL unnest(generate_series(1, len(t)-1)) AS u(i))),
      |raw AS (SELECT b, COUNT(*) AS cr FROM feats GROUP BY 1),
      |tgt AS (SELECT b, COUNT(*) AS ct FROM feats
      |        WHERE lang = '$dsirTargetLang' GROUP BY 1),
      |tot AS (SELECT
      |  (SELECT COUNT(*) FROM feats) AS nr,
      |  (SELECT COUNT(*) FROM feats WHERE lang = '$dsirTargetLang') AS nt),
      |lam AS (
      |  SELECT raw.b, CAST(round(ln(
      |      (CAST(COALESCE(ct, 0) + 1 AS DOUBLE) * (nr + $dsirBuckets))
      |      / (CAST(cr + 1 AS DOUBLE) * (nt + $dsirBuckets))
      |    ) * 1000000.0) AS BIGINT) AS lam_micro
      |  FROM raw LEFT JOIN tgt USING (b), tot),
      |weights AS (
      |  SELECT toks.doc_id, toks.lang,
      |    COALESCE(s.n_feats, 0) AS n_feats,
      |    COALESCE(s.logw_micro, 0) AS logw_micro
      |  FROM toks LEFT JOIN (
      |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
      |      CAST(SUM(COALESCE(lam_micro, 0)) AS BIGINT) AS logw_micro
      |    FROM feats LEFT JOIN lam USING (b) GROUP BY doc_id
      |  ) s ON toks.doc_id = s.doc_id)""".stripMargin

  val qDsirWeightsSql: String =
    s"""$dsirSqlCommon
      |SELECT doc_id, lang, n_feats, logw_micro FROM weights""".stripMargin

  // ------------------------------------------------ threshold calibration

  /** Target keep-rate for [[qScoreThreshold]] as an exact rational
    * (1/4 = keep the top quarter by score) — production dials this to
    * its token budget. */
  val thresholdKeepNum = 1L
  val thresholdKeepDen = 4L

  /** Coarse-bucket width exponent for the two-phase selection: phase 1
    * histograms `score >> 12` (4096-wide buckets), so phase 2's
    * within-bucket value table is ≤ 4096 rows — both phases bounded
    * driver metadata at any corpus size. */
  private val thresholdShift = 12

  /** Quality-gate CALIBRATION — the exact k-th order statistic of a
    * per-doc integer score, computed WITHOUT a global sort: given a
    * target keep-rate, find the score threshold whose ≥-set is the
    * smallest one covering the target count. `TakeOrderedAndProject`
    * cannot do this (k is a corpus FRACTION, not a constant), and a
    * global `ORDER BY` is the thing a 100 TB plan must avoid — so this
    * runs the classic two-phase distributed selection instead:
    *   1. one partial-agg pass histograms the coarse bucket
    *      `score >> 12` (arithmetic shift — order-preserving for
    *      negatives) → ≤ |score range|/4096 rows of driver metadata;
    *      the driver walks buckets from the top to locate the one
    *      containing the k-th largest score;
    *   2. one filtered partial-agg pass over THAT bucket only groups
    *      by exact score (≤ 4096 distinct values by construction);
    *      the driver walks values to the exact threshold.
    * Two scans, two tiny shuffles, zero sorts over the corpus; every
    * driver structure is bounded by the bucket width, not the data.
    * `n_kept ≥ k` when ties straddle the cut (the ≥-threshold set
    * includes the whole tie class — the deterministic choice).
    *
    * The oracle replays the DEFINITION (row_number over score desc,
    * pick row k) — the k-th order statistic is tie-insensitive, so
    * both formulations agree exactly. */
  def scoreThreshold(scored: DataFrame, scoreCol: String = "score",
                     keepNum: Long = thresholdKeepNum,
                     keepDen: Long = thresholdKeepDen): DataFrame =
    scoreThresholdWeighted(scored, scoreCol, lit(1L), keepNum, keepDen)

  /** The same two-phase selection over PRE-AGGREGATED (score, count)
    * rows — the formulation the streaming path needs, where the store
    * holds per-batch score histograms rather than raw documents.
    * `weight` is the occurrence count expression (`lit(1)` for one row
    * per doc). */
  def scoreThresholdWeighted(scored: DataFrame, scoreCol: String,
                             weight: Column,
                             keepNum: Long = thresholdKeepNum,
                             keepDen: Long = thresholdKeepDen): DataFrame = {
    val spark = scored.sparkSession
    val n = totalWeight(scored, weight)
    val k = (n * keepNum + keepDen - 1) / keepDen
    val (threshold, cum) = kthLargestWeighted(scored, scoreCol, weight, k)
    import spark.implicits._
    Seq((n, k, threshold, cum))
      .toDF("n_docs", "k", "threshold", "n_kept")
  }

  /** Total weight of a scored frame (row count when weight = 1). */
  def totalWeight(scored: DataFrame, weight: Column): Long = {
    val r = scored.agg(sum(weight)).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Exact k-th LARGEST value of a weighted score table by the
    * two-phase distributed selection (bucket histogram → within-bucket
    * values; driver state bounded by the 4096-wide bucket grid, two
    * scans, no sort) — the shared core of [[scoreThresholdWeighted]],
    * exposed with an EXPLICIT k for callers whose rank isn't a corpus
    * fraction (the conformal quantile's ⌈(n+1)(1−α)⌉). Returns
    * (value, cumulative weight ≥ value). */
  def kthLargestWeighted(scored: DataFrame, scoreCol: String,
                         weight: Column, k: Long): (Long, Long) = {
    val s = col(scoreCol)
    val hist = scored
      .groupBy(shiftright(s, thresholdShift).as("b"))
      .agg(sum(weight).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val n = hist.map(_._2).sum
    require(n > 0, "kthLargestWeighted: empty input")
    require(k >= 1 && k <= n, s"k=$k outside [1, $n]")
    var cum = 0L
    var bi = 0
    while (cum + hist(bi)._2 < k) { cum += hist(bi)._2; bi += 1 }
    val bucket = hist(bi)._1
    val vals = scored
      .filter(shiftright(s, thresholdShift) === bucket)
      .groupBy(s.as("v")).agg(sum(weight).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    var i = 0
    while (cum < k) { cum += vals(i)._2; i += 1 }
    (vals(i - 1)._1, cum)
  }

  /** The scored frame is checkpoint-materialized once: the two-phase
    * selection makes two driver-side aggregation passes over it, and
    * without materialization each pass re-tokenizes and re-scores the
    * whole corpus — at 100 TB that is two full map passes where one
    * suffices (doc_id+score is ~16 B/doc, far cheaper to hold than to
    * recompute). Released immediately after the (literal-row) result
    * is built. */
  def qScoreThreshold(spark: SparkSession, dir: String): DataFrame = {
    val (scored, release) = graft.util.Checkpoints.checkpointTracked(
      classify(Tables(spark, dir, "documents"))
        .select(col("doc_id"), col("score")))
    try scoreThreshold(scored) finally release()
  }

  val qScoreThresholdSql: String =
    s"""WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |wgts AS (
      |  SELECT doc_id,
      |    CAST(CAST('0x' || substr(md5(CAST(
      |          CAST('0x' || substr(md5(word), 1, 8) AS UBIGINT)
      |            % $classifierBuckets AS VARCHAR)), 1, 8) AS UBIGINT)
      |        % $classifierWeightSpan AS BIGINT) - 1000 AS wgt
      |  FROM w),
      |docsc AS (
      |  SELECT doc_id, CAST(SUM(wgt) AS BIGINT) AS score
      |  FROM wgts GROUP BY doc_id),
      |kk AS (
      |  SELECT COUNT(*) AS n,
      |    (COUNT(*) * $thresholdKeepNum + $thresholdKeepDen - 1)
      |      // $thresholdKeepDen AS k
      |  FROM docsc),
      |t AS (
      |  SELECT score AS threshold
      |  FROM (SELECT score,
      |          row_number() OVER (ORDER BY score DESC) AS rn
      |        FROM docsc), kk
      |  WHERE rn = k)
      |SELECT kk.n AS n_docs, kk.k AS k, t.threshold AS threshold,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM docsc
      |   WHERE score >= t.threshold) AS n_kept
      |FROM kk, t""".stripMargin

  val qDsirSampleSql: String =
    s"""$dsirSqlCommon
      |SELECT doc_id, lang, logw_micro,
      |  logw_micro + CAST(round(-ln(-ln(
      |    (CAST(('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)),
      |       1, 8)) AS UBIGINT) + 0.5) / 4294967296.0
      |  )) * 1000000.0) AS BIGINT) AS priority_micro
      |FROM weights
      |ORDER BY priority_micro DESC, doc_id ASC LIMIT $dsirSampleK""".stripMargin
}
